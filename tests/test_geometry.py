import numpy as np
import jax.numpy as jnp

from shasta_tpu.core import geometry, boxes


def _mc_intersection_area(b1, b2, n=100_000, seed=0):
    """Monte-Carlo estimate of BEV overlap area of two [x,y,z,w,l,h,yaw] boxes."""
    rng = np.random.default_rng(seed)
    c1 = np.asarray(boxes.corners_bev(jnp.array(b1[None]))[0])
    c2 = np.asarray(boxes.corners_bev(jnp.array(b2[None]))[0])
    lo = np.minimum(c1.min(0), c2.min(0))
    hi = np.maximum(c1.max(0), c2.max(0))
    pts = rng.uniform(lo, hi, size=(n, 2))

    def inside(b, p):
        # det3d corner convention: w along local x, clockwise-positive rotation
        # (world = [[c, s], [-s, c]] @ local), so local = [[c, -s], [s, c]] @ d.
        d = p - b[:2]
        c, s = np.cos(b[6]), np.sin(b[6])
        rx = d[:, 0] * c - d[:, 1] * s
        ry = d[:, 0] * s + d[:, 1] * c
        return (np.abs(rx) <= b[3] / 2 + 1e-12) & (np.abs(ry) <= b[4] / 2 + 1e-12)

    frac = np.mean(inside(b1, pts) & inside(b2, pts))
    return frac * np.prod(hi - lo)


def _rand_box(rng, span=4.0):
    b = np.zeros(7)
    b[:2] = rng.uniform(-span, span, 2)
    b[2] = rng.uniform(-1, 1)
    b[3:6] = rng.uniform(1.0, 4.0, 3)
    b[6] = rng.uniform(-np.pi, np.pi)
    return b


def test_corner_orientation_is_clockwise():
    b = jnp.array([[0, 0, 0, 2.0, 4.0, 1.0, 0.3]])
    c = boxes.corners_bev(b)[0]
    x, y = np.asarray(c[:, 0]), np.asarray(c[:, 1])
    area2 = np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
    assert area2 < 0  # clockwise


def test_rect_intersection_vs_monte_carlo(rng):
    b1s, b2s = [], []
    for i in range(8):
        b1s.append(_rand_box(rng))
        b2s.append(_rand_box(rng))
    b1s, b2s = np.array(b1s), np.array(b2s)
    c1 = boxes.corners_bev(jnp.array(b1s))
    c2 = boxes.corners_bev(jnp.array(b2s))
    got = np.asarray(geometry.rect_intersection_area(c1, c2))
    for i in range(8):
        want = _mc_intersection_area(b1s[i], b2s[i], seed=i)
        assert abs(got[i] - want) < 0.05 * max(want, 1.0), (i, got[i], want)


def test_identical_boxes_full_iou(rng):
    b = np.stack([_rand_box(rng) for _ in range(5)])
    iou = np.asarray(geometry.iou_bev(jnp.array(b), jnp.array(b)))
    np.testing.assert_allclose(np.diag(iou), 1.0, atol=1e-4)
    iou3 = np.asarray(geometry.iou_3d(jnp.array(b), jnp.array(b)))
    np.testing.assert_allclose(np.diag(iou3), 1.0, atol=1e-4)


def test_disjoint_boxes_zero_iou():
    b1 = jnp.array([[0, 0, 0, 2, 2, 2, 0.4]], dtype=jnp.float32)
    b2 = jnp.array([[100, 100, 0, 2, 2, 2, -0.7]], dtype=jnp.float32)
    assert float(geometry.iou_bev(b1, b2)[0, 0]) == 0.0
    # GIoU of disjoint boxes is negative
    assert float(geometry.giou_bev(b1, b2)[0, 0]) < 0.0


def test_axis_aligned_iou_closed_form():
    # two unit squares overlapping by half
    b1 = jnp.array([[0.0, 0, 0, 1, 1, 1, 0]])
    b2 = jnp.array([[0.5, 0, 0, 1, 1, 1, 0]])
    iou = float(geometry.iou_bev(b1, b2)[0, 0])
    assert np.isclose(iou, 0.5 / 1.5, atol=1e-5)


def test_giou_identical_is_iou(rng):
    b = np.stack([_rand_box(rng) for _ in range(4)])
    g = np.asarray(geometry.giou_bev(jnp.array(b), jnp.array(b)))
    np.testing.assert_allclose(np.diag(g), 1.0, atol=1e-4)


def test_pc_in_box():
    box = jnp.array([1.0, 2.0, 0.0, 2.0, 4.0, 2.0, np.pi / 2])
    pts = jnp.array(
        [
            [1.0, 2.0, 0.0],  # center
            [1.0, 3.9, 0.0],  # along rotated l-axis (y)
            [1.0, 5.5, 0.0],  # outside even scaled
            [2.4, 2.0, 0.0],  # along rotated w-axis, inside at 1.5 scale
        ]
    )
    m = np.asarray(geometry.pc_in_box(box, pts, scale=1.5))
    assert m.tolist() == [True, True, False, True]
    m1 = np.asarray(geometry.pc_in_box(box, pts, scale=1.0))
    assert m1.tolist() == [True, True, False, False]


def test_score_rectification_oracle():
    """mot_3d score_rectification parity: best-IoU claims a GT, duplicate
    high-IoU dets get 0.2, misses 0.05, empty GT zeroes everything."""
    import numpy as np

    from shasta_tpu.core.geometry import score_rectification

    # mot rows [x, y, z, yaw, l, w, h]
    gt = np.array([[0, 0, 0, 0.0, 4, 2, 1.6]])
    dets = np.array([
        [0.1, 0, 0, 0.0, 4, 2, 1.6],   # near-perfect overlap
        [0.5, 0.3, 0, 0.0, 4, 2, 1.6],  # decent overlap, same gt -> 0.2
        [30, 30, 0, 0.0, 4, 2, 1.6],    # miss -> 0.05
    ])
    s = score_rectification(dets, gt)
    assert s[0] > 0.8 and s[1] == 0.2 and s[2] == 0.05
    np.testing.assert_array_equal(
        score_rectification(dets, np.zeros((0, 7))), np.zeros(3)
    )
    assert score_rectification(np.zeros((0, 7)), gt).shape == (0,)
