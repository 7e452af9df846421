import numpy as np
import jax.numpy as jnp

from shasta_tpu.core import boxes


def _ref_corners2d(centers, dims, angles):
    """Independent numpy re-derivation of the reference corner construction
    (box_torch_ops.corners_nd + rotation_2d, clockwise rotation)."""
    corners_norm = np.array(
        [[-0.5, -0.5], [-0.5, 0.5], [0.5, 0.5], [0.5, -0.5]], dtype=np.float64
    )
    out = np.zeros((len(centers), 4, 2))
    for i in range(len(centers)):
        c, s = np.cos(angles[i]), np.sin(angles[i])
        pts = dims[i] * corners_norm
        rot = np.stack([pts[:, 0] * c + pts[:, 1] * s, -pts[:, 0] * s + pts[:, 1] * c], -1)
        out[i] = rot + centers[i]
    return out


def test_center_to_corner_box2d_matches_reference(rng):
    N = 32
    centers = rng.normal(size=(N, 2)) * 10
    dims = rng.uniform(0.5, 5.0, size=(N, 2))
    angles = rng.uniform(-np.pi, np.pi, size=N)
    got = np.asarray(boxes.center_to_corner_box2d(jnp.array(centers), jnp.array(dims), jnp.array(angles)))
    want = _ref_corners2d(centers, dims, angles)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_box_points_5_layout(rng):
    N = 8
    b = np.zeros((N, 7))
    b[:, :2] = rng.normal(size=(N, 2)) * 5
    b[:, 2] = rng.normal(size=N)
    b[:, 3:6] = rng.uniform(1, 4, size=(N, 3))
    b[:, 6] = rng.uniform(-np.pi, np.pi, size=N)
    pts = np.asarray(boxes.box_points_5(jnp.array(b)))
    assert pts.shape == (N, 5, 3)
    # center point is the raw xyz
    np.testing.assert_allclose(pts[:, 0], b[:, :3], atol=1e-5)
    # all midpoints share the box z
    np.testing.assert_allclose(pts[:, 1:, 2], np.tile(b[:, 2:3], (1, 4)), atol=1e-5)
    # front/back midpoints are l apart along the heading for axis-aligned box
    b0 = np.array([[0, 0, 0, 2.0, 4.0, 1.5, 0.0]])
    p0 = np.asarray(boxes.box_points_5(jnp.array(b0)))[0]
    # corners order: (-l/2,-w/2), (-l/2, w/2), (l/2, w/2), (l/2,-w/2) scaled by dims (w,l)
    # with dims[i]=(w=2, l=4): x spans ±1 (w dir), y spans ±2
    front = p0[1]
    back = p0[2]
    d = np.linalg.norm(front[:2] - back[:2])
    assert np.isclose(d, 2.0, atol=1e-5) or np.isclose(d, 4.0, atol=1e-5)


def test_quaternion_yaw_roundtrip(rng):
    for yaw in rng.uniform(-np.pi, np.pi, size=16):
        q = boxes.yaw_to_quaternion(yaw)
        got = boxes.quaternion_yaw(q)
        assert np.isclose(got, yaw, atol=1e-6)


def test_quaternion_yaw_matches_rotmat_projection(rng):
    # against the reference formula: yaw = atan2((R @ e_x)[1], (R @ e_x)[0])
    from shasta_tpu.core.transforms import quat_to_rotmat

    for _ in range(16):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        v = quat_to_rotmat(q) @ np.array([1.0, 0, 0])
        want = np.arctan2(v[1], v[0])
        got = boxes.quaternion_yaw(q)
        assert np.isclose(got, want, atol=1e-6)
