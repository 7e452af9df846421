import numpy as np
import jax.numpy as jnp

from shasta_tpu.ops import voxelize


def _brute_force(points, voxel_size, coors_range, max_points, max_voxels):
    """Direct per-point loop re-deriving the reference kernel semantics
    (point_cloud_ops.py:7-55): arrival-ordered voxels, capped points."""
    vs = np.asarray(voxel_size)
    cr = np.asarray(coors_range)
    gs = np.round((cr[3:] - cr[:3]) / vs).astype(int)
    vox = {}
    order = []
    for p in points:
        c = np.floor((p[:3] - cr[:3]) / vs).astype(int)
        if np.any(c < 0) or np.any(c >= gs):
            continue
        key = (c[2], c[1], c[0])  # zyx
        if key not in vox:
            if len(order) >= max_voxels:
                continue
            vox[key] = []
            order.append(key)
        if len(vox[key]) < max_points:
            vox[key].append(p)
    M = len(order)
    C = points.shape[1]
    voxels = np.zeros((M, max_points, C), points.dtype)
    coords = np.zeros((M, 3), np.int32)
    nums = np.zeros((M,), np.int32)
    for i, key in enumerate(order):
        pts = vox[key]
        nums[i] = len(pts)
        voxels[i, : len(pts)] = pts
        coords[i] = key
    return voxels, coords, nums


def test_np_voxelizer_matches_reference_semantics(rng):
    points = rng.uniform(-3, 3, size=(2000, 5)).astype(np.float32)
    args = ([0.25, 0.25, 0.5], [-2, -2, -2, 2, 2, 2], 6, 100)
    v1, c1, n1 = voxelize.points_to_voxel_np(points, *args[:2], max_points=args[2], max_voxels=args[3])
    v2, c2, n2 = _brute_force(points, *args[:2], max_points=args[2], max_voxels=args[3])
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(n1, n2)
    np.testing.assert_allclose(v1, v2)


def test_np_voxelizer_voxel_cap(rng):
    points = rng.uniform(-2, 2, size=(500, 4)).astype(np.float32)
    v, c, n = voxelize.points_to_voxel_np(points, [0.1, 0.1, 0.1], [-2, -2, -2, 2, 2, 2], 3, 50)
    assert len(c) == 50
    vb, cb, nb = _brute_force(points, [0.1, 0.1, 0.1], [-2, -2, -2, 2, 2, 2], 3, 50)
    np.testing.assert_array_equal(c, cb)


def test_jax_voxelizer_same_voxel_set(rng):
    points = rng.uniform(-3, 3, size=(1000, 5)).astype(np.float32)
    vsize, crange = [0.25, 0.25, 0.5], [-2, -2, -2, 2, 2, 2]
    vn, cn, nn = voxelize.points_to_voxel_np(points, vsize, crange, 6, 4000)
    vj, cj, nj, valj = voxelize.points_to_voxel_jax(jnp.array(points), vsize, crange, 6, 4000)
    vj, cj, nj, valj = map(np.asarray, (vj, cj, nj, valj))
    k = valj.sum()
    assert k == len(cn)
    set_np = {tuple(c) for c in cn}
    set_j = {tuple(c) for c in cj[:k]}
    assert set_np == set_j
    # per-voxel point means agree (order within voxel may differ in padding)
    def mean_map(vox, coords, nums, k):
        return {
            tuple(c): vox[i, : nums[i], :3].mean(0)
            for i, c in enumerate(coords[:k])
        }
    m1 = mean_map(vn, cn, nn, len(cn))
    m2 = mean_map(vj, cj, nj, k)
    for key in m1:
        np.testing.assert_allclose(m1[key], m2[key], atol=1e-5)
