import numpy as np
import jax.numpy as jnp

from shasta_tpu.ops import nms


def _det(x, y, s, yaw=0.0, l=4.0, w=2.0, h=1.5, z=0.0):
    return np.array([x, y, z, yaw, l, w, h, s])


def test_weighted_nms_votes_average():
    # three near-identical boxes -> one result, score-weighted average center
    dets = np.stack([
        _det(0.0, 0.0, 0.9),
        _det(0.2, 0.0, 0.6),
        _det(-0.2, 0.0, 0.3),
        _det(30.0, 0.0, 0.8),
    ])
    types = ["car"] * 4
    out, out_types = nms.weighted_nms(dets, types)
    assert len(out) == 2
    # first result: weighted mean of the cluster, score of the best
    w = np.array([0.9, 0.6, 0.3])
    expect_x = np.sum(w * np.array([0.0, 0.2, -0.2])) / w.sum()
    np.testing.assert_allclose(out[0][0], expect_x, atol=1e-6)
    assert out[0][7] == 0.9
    assert out[1][0] == 30.0


def test_weighted_nms_type_separation():
    dets = np.stack([_det(0, 0, 0.9), _det(0.1, 0, 0.5)])
    out, types = nms.weighted_nms(dets, ["car", "pedestrian"])
    assert len(out) == 2  # different classes never suppress each other


def test_weighted_nms_yaw_outlier_excluded():
    dets = np.stack([
        _det(0.0, 0.0, 0.9, yaw=0.0),
        _det(0.05, 0.0, 0.8, yaw=0.02),
        _det(-0.05, 0.0, 0.7, yaw=2.0),  # yaw outlier, still suppressed
    ])
    out, _ = nms.weighted_nms(dets, ["car"] * 3)
    assert len(out) == 1
    # vote excluded the outlier: x is the weighted mean of the two aligned
    w = np.array([0.9, 0.8])
    np.testing.assert_allclose(out[0][0], np.sum(w * np.array([0.0, 0.05])) / w.sum(), atol=1e-6)


def test_circle_nms():
    dets = np.array([[0, 0, 0.9], [0.5, 0, 0.8], [5, 5, 0.7]])
    keep = nms.circle_nms_np(dets, thresh=1.0)
    assert keep.tolist() == [0, 2]


def test_rotate_nms_np_and_jax_agree(rng):
    n = 24
    boxes = np.zeros((n, 7), np.float32)
    boxes[:, :2] = rng.uniform(-10, 10, (n, 2))
    boxes[:, 3:6] = rng.uniform(1, 4, (n, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    keep_np = set(nms.rotate_nms_np(boxes, scores, 0.3).tolist())
    keep_jax = np.nonzero(np.asarray(nms.rotate_nms_jax(jnp.array(boxes), jnp.array(scores), 0.3)))[0]
    assert keep_np == set(keep_jax.tolist())
