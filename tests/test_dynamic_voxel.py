"""DynamicVoxelEncoder parity vs a numpy oracle of the reference
(det3d/models/readers/dynamic_voxel_encoder.py:8-70)."""
import numpy as np
import jax.numpy as jnp

from shasta_tpu.models.dynamic_voxel import (
    dynamic_voxelize,
    dynamic_voxelize_virtual,
)

PC_RANGE = np.array([-2.0, -2.0, -1.0, 2.0, 2.0, 1.0])
VOXEL_SIZE = np.array([0.5, 0.5, 0.5])


def _oracle(points):
    """Reference voxelization(): range filter, zyx unique, scatter mean."""
    keep = np.all(
        (points[:, :3] >= PC_RANGE[:3]) & (points[:, :3] <= PC_RANGE[3:]),
        axis=1,
    )
    pts = points[keep]
    gs = np.round((PC_RANGE[3:] - PC_RANGE[:3]) / VOXEL_SIZE).astype(np.int64)
    c = ((pts[:, [2, 1, 0]] - PC_RANGE[[2, 1, 0]]) / VOXEL_SIZE[[2, 1, 0]]).astype(
        np.int64
    )
    in_grid = np.all((c >= 0) & (c < gs[[2, 1, 0]]), axis=1)
    pts, c = pts[in_grid], c[in_grid]
    uc, inv = np.unique(c, axis=0, return_inverse=True)
    vox = np.zeros((len(uc), pts.shape[1]))
    cnt = np.zeros(len(uc))
    np.add.at(vox, inv, pts)
    np.add.at(cnt, inv, 1)
    return vox / cnt[:, None], uc


def test_dynamic_voxelize_matches_oracle(rng):
    N, C = 400, 5
    pts = rng.uniform(-2.5, 2.5, size=(N, C))  # some out of range
    valid = np.ones(N, bool)
    valid[-30:] = False  # padding rows
    pts[~valid] = 100.0  # padding garbage must be ignored

    ref_vox, ref_coords = _oracle(pts[valid])

    vox, coords, vvalid = dynamic_voxelize(
        jnp.asarray(pts), jnp.asarray(valid), PC_RANGE, VOXEL_SIZE,
        max_voxels=256,
    )
    M = int(np.sum(np.asarray(vvalid)))
    assert M == len(ref_vox)
    np.testing.assert_array_equal(np.asarray(coords)[:M], ref_coords)
    np.testing.assert_allclose(np.asarray(vox)[:M], ref_vox, atol=1e-5)
    # padding slots zeroed/invalid
    assert not np.any(np.asarray(vvalid)[M:])


def test_dynamic_voxelize_overflow_truncates(rng):
    pts = rng.uniform(-1.9, 1.9, size=(500, 5))
    vox, coords, vvalid = dynamic_voxelize(
        jnp.asarray(pts), jnp.ones(500, bool), PC_RANGE, VOXEL_SIZE,
        max_voxels=8,
    )
    # caps bind -> every slot used (observable overflow signal)
    assert int(np.sum(np.asarray(vvalid))) == 8
    # kept slots are the 8 smallest keys (ascending z-major raster)
    ref_vox, ref_coords = _oracle(pts)
    np.testing.assert_array_equal(np.asarray(coords), ref_coords[:8])


def test_dynamic_voxelize_virtual_matches_oracle(rng):
    """Virtual-point path (MVP painted/virtual points, C=16 rows)."""
    N, C = 300, 16
    pts = rng.uniform(-1.9, 1.9, size=(N, C))
    ptype = rng.choice([1.0, 0.0, -1.0], size=N)
    pts[:, -2] = ptype
    valid = np.ones(N, bool)

    # oracle: reference voxelization_virtual, permutation-free formulation
    keep = np.all(
        (pts[:, :3] >= PC_RANGE[:3]) & (pts[:, :3] <= PC_RANGE[3:]), axis=1
    )
    pts, ptype = pts[keep], ptype[keep]
    N = len(pts)
    c = ((pts[:, [2, 1, 0]] - PC_RANGE[[2, 1, 0]]) / VOXEL_SIZE[[2, 1, 0]]).astype(np.int64)
    uc, inv = np.unique(c, axis=0, return_inverse=True)
    padded = np.zeros((N, 22))
    real = ptype == 1
    pv = ~real
    padded[real, :4] = pts[real, :4]
    padded[real, 4] = pts[real, -1]
    padded[real, 21] = 1.0
    padded[pv, 5:19] = pts[pv, :14]
    padded[pv, 19] = pts[pv, -1]
    padded[pv, 20] = (ptype[pv] == 0).astype(float)
    acc = np.zeros((len(uc), 22))
    cnt = np.zeros(len(uc))
    np.add.at(acc, inv, padded)
    np.add.at(cnt, inv, 1)
    mean = acc / cnt[:, None]
    ind = mean[:, 21]
    mix = (ind > 0) & (ind < 1)
    ref = mean[:, :21].copy()
    ref[mix, :5] /= ind[mix, None]
    ref[mix, 5:] /= (1 - ind[mix, None])

    vox, coords, vvalid = dynamic_voxelize_virtual(
        jnp.asarray(pts), jnp.ones(N, bool), PC_RANGE, VOXEL_SIZE,
        max_voxels=256,
    )
    M = int(np.sum(np.asarray(vvalid)))
    assert M == len(uc)
    np.testing.assert_array_equal(np.asarray(coords)[:M], uc)
    np.testing.assert_allclose(np.asarray(vox)[:M], ref, atol=1e-5)
