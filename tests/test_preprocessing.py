import numpy as np

from shasta_tpu.preprocessing.associate import associate_l2
from shasta_tpu.preprocessing.gt_shasta import frame_gt_matrices


def _boxes(centers, scores=None):
    b = np.zeros((len(centers), 8))
    b[:, :2] = centers
    if scores is not None:
        b[:, 7] = scores
    return b


def test_associate_score_priority():
    # two preds compete for one GT; the higher-score one wins even though
    # the lower-score one is closer
    gt = _boxes([[0.0, 0.0]])
    preds = _boxes([[0.4, 0.0], [0.1, 0.0]], scores=[0.9, 0.2])
    tp, fp, fn = associate_l2(gt, ["vehicle.car"], preds, ["car", "car"], 2.0)
    assert tp == {0: 0}
    assert fp == [1]
    assert fn == []


def test_associate_type_substring():
    gt = _boxes([[0, 0], [5, 5]])
    preds = _boxes([[0.1, 0], [5.1, 5]], scores=[0.9, 0.8])
    tp, fp, fn = associate_l2(
        gt, ["vehicle.car", "human.pedestrian.adult"],
        preds, ["car", "pedestrian"], 2.0,
    )
    assert tp == {0: 0, 1: 1}


def test_associate_threshold_and_fn():
    gt = _boxes([[0, 0], [10, 10]])
    preds = _boxes([[0.5, 0]], scores=[0.9])
    tp, fp, fn = associate_l2(gt, ["vehicle.car"] * 2, preds, ["car"], 2.0)
    assert tp == {0: 0}
    assert fn == [1]


def test_frame_gt_matrices_scene_start():
    curr = _boxes([[0, 0], [5, 5], [20, 20]], scores=[0.9, 0.8, 0.7])
    gt = _boxes([[0.1, 0], [5.2, 5]])
    m, newborn = frame_gt_matrices(
        None, None, None, None, None,
        curr, ["car"] * 3, gt, ["vehicle.car"] * 2, ["a", "b"],
    )
    assert m is None
    np.testing.assert_array_equal(newborn, [1, 1, 0])


def test_frame_gt_matrices_full():
    # prev: det0 -> gt 'a', det1 -> gt 'b', det2 FP
    prev = _boxes([[0, 0], [5, 5], [50, 50]], scores=[0.9, 0.8, 0.7])
    prev_gt = _boxes([[0.1, 0], [5.1, 5], [30, 30]])
    prev_ids = ["a", "b", "c"]
    # curr: det0 -> 'a' (match), det1 newborn 'd'; 'b' is a curr FN (no det
    # near it); 'c' vanished
    curr = _boxes([[0.3, 0], [40, 40]], scores=[0.9, 0.8])
    curr_gt = _boxes([[0.2, 0], [5.0, 5.1], [40.1, 40]])
    curr_ids = ["a", "b", "d"]
    m, newborn = frame_gt_matrices(
        prev, ["car"] * 3, prev_gt, ["vehicle.car"] * 3, prev_ids,
        curr, ["car"] * 2, curr_gt, ["vehicle.car"] * 3, curr_ids,
    )
    K = 2
    assert m.shape == (3, K + 2)
    assert m[0, 0] == 1  # matched via id 'a'
    assert m[1, -1] == 1  # prev det1's id 'b' is a curr FN
    assert m[2, -2] == 1  # prev FP -> dead
    np.testing.assert_array_equal(newborn, [0, 1])
    # rows are one-hot over [curr dets | dead | fn]
    np.testing.assert_array_equal(m.sum(axis=1), np.ones(3))
