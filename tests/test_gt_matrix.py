import numpy as np

from shasta_tpu.data.nuscenes import build_gt_matrix


def test_no_prev_frame_newborns_and_fps():
    # scene start: matched is None; newborn over kept curr dets
    newborn = np.array([1.0, 0.0, 1.0, 0.0])
    keep = [0, 1, 2, 3]
    rng = np.random.default_rng(0)
    gt, n_prev, n_curr = build_gt_matrix(
        None, newborn, [], keep, max_objects=6, fp_ratio=1.0, dead_trk_ratio=1.0, rng=rng
    )
    assert n_prev == 0
    # fp_ratio=1: all FPs kept -> all 4 cols survive
    assert n_curr == 4
    # newborn row (-2) marks dets 0, 2; FP row (-1) = 1 - colsum marks 1, 3
    np.testing.assert_array_equal(gt[-2, :4], [1, 0, 1, 0])
    np.testing.assert_array_equal(gt[-1, :4], [0, 1, 0, 1])
    assert gt[:6].sum() == 0  # no prev rows


def test_full_keep_deterministic():
    # 3 prev dets, 4 curr dets; prev0->curr1 matched, prev1 dead, prev2
    # matched to a det that got dropped from `keep` -> becomes FN
    matched = np.zeros((3, 4 + 2))
    matched[0, 1] = 1
    matched[1, -2] = 1  # dead
    matched[2, 3] = 1  # matched to curr det 3, which we drop below
    newborn = np.array([0.0, 0.0, 1.0, 0.0])
    prev_keep = [0, 1, 2]
    keep = [0, 1, 2]  # drops raw det 3
    rng = np.random.default_rng(0)
    gt, n_prev, n_curr = build_gt_matrix(
        matched, newborn, prev_keep, keep, max_objects=5,
        fp_ratio=1.0, dead_trk_ratio=1.0, rng=rng,
    )
    M = 5
    # row 0: matched to col 1
    assert gt[0, 1] == 1 and gt[0].sum() == 1
    # row 1: dead col
    assert gt[1, M] == 1 and gt[1].sum() == 1
    # row 2: its match was dropped -> FN col = 1 - rowsum
    assert gt[2, M + 1] == 1 and gt[2].sum() == 1
    assert n_prev == 3
    # cols: det0 unmatched+not newborn -> FP; det1 matched; det2 newborn
    assert gt[M + 1, 0] == 1  # FP row
    assert gt[M, 2] == 1  # newborn row
    assert n_curr == 3


def test_subsampling_counts_and_structure():
    rng = np.random.default_rng(42)
    N, K, M = 20, 20, 30
    matched = np.zeros((N, K + 2))
    # 8 matched pairs, 8 dead, 4 FN
    for i in range(8):
        matched[i, i] = 1
    for i in range(8, 16):
        matched[i, -2] = 1
    for i in range(16, 20):
        matched[i, -1] = 1
    newborn = np.zeros(K)
    newborn[8:12] = 1  # 4 newborns among curr dets
    prev_keep = list(range(N))
    keep = list(range(K))
    gt, n_prev, n_curr = build_gt_matrix(
        matched, newborn, prev_keep, keep, M,
        fp_ratio=1 / 3, dead_trk_ratio=1 / 2, rng=rng,
    )
    # prev TP mass = 8 matched + 4 FN = 12; dead kept = int(0.5*12) = 6
    assert n_prev == 12 + 6
    # curr TP mass = 8 matched + 4 newborn = 12; FPs = 20-12=8; kept = int(12/3)=4
    assert n_curr == 12 + 4
    # every kept row has exactly one label; rows beyond are zero
    row_sums = gt[:n_prev].sum(axis=1)
    np.testing.assert_array_equal(row_sums, np.ones(n_prev))
    assert gt[n_prev:-2].sum() == 0
    # kept cols: each has exactly one of {prev match, newborn, FP}
    col_sums = gt[:, :n_curr].sum(axis=0)
    np.testing.assert_array_equal(col_sums, np.ones(n_curr))
    assert gt[:, n_curr:-2].sum() == 0


def test_rng_injectable_reproducible():
    matched = np.zeros((6, 8))
    matched[0, 0] = 1
    matched[1:5, -2] = 1
    matched[5, 2] = 1
    newborn = np.zeros(6)
    a = build_gt_matrix(matched, newborn, list(range(6)), list(range(6)), 10,
                        0.5, 0.5, np.random.default_rng(7))
    b = build_gt_matrix(matched, newborn, list(range(6)), list(range(6)), 10,
                        0.5, 0.5, np.random.default_rng(7))
    np.testing.assert_array_equal(a[0], b[0])
    assert a[1:] == b[1:]
