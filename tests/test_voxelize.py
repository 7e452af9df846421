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


def test_voxel_tiers_pad_to_smallest_fitting(rng):
    """PointPipelineConfig.voxel_tiers pads each frame to the smallest
    tier >= its occupancy (max_voxels always the final tier), and
    collate() re-pads mixed tiers to the batch max."""
    from shasta_tpu.data.nuscenes import (
        PointPipelineConfig, collate, voxelize_frame,
    )

    cfg = PointPipelineConfig(
        voxel_size=(0.1, 0.1, 0.1), pc_range=(-2, -2, -1, 2, 2, 1),
        max_points_in_voxel=4, max_voxels=800, nsweeps=1,
        shuffle_points=False, voxel_tiers=(64, 256),
        global_rot_noise=None, global_scale_noise=None,
        global_translate_std=None,
    )
    g = np.random.default_rng(0)

    def frame(n_pts):
        pts = np.concatenate(
            [g.uniform(-1.9, 1.9, (n_pts, 3)), g.normal(size=(n_pts, 2))],
            axis=1,
        ).astype(np.float32)
        return voxelize_frame(pts, cfg, g, train=False)

    v_small, c_small, n_small, val_small = frame(30)
    assert v_small.shape[0] == 64  # fits the first tier
    v_big, c_big, n_big, val_big = frame(4000)
    assert v_big.shape[0] in (256, 800) and v_big.shape[0] > 64

    # collate of mixed tiers re-pads to the batch max; padded rows invalid
    b = collate([
        {"voxels": v_small, "voxels_valid": val_small},
        {"voxels": v_big, "voxels_valid": val_big},
    ])
    V = v_big.shape[0]
    assert b["voxels"].shape == (2, V) + v_big.shape[1:]
    assert not b["voxels_valid"][0, 64:].any()
    np.testing.assert_array_equal(b["voxels"][0, :64], v_small)


def test_voxel_tiers_results_identical(rng):
    """A tier-padded frame produces the same BEV map rows as the full-cap
    frame (padded rows are masked everywhere)."""
    import jax

    from shasta_tpu.data.nuscenes import PointPipelineConfig, voxelize_frame
    from shasta_tpu.models import ShastaModel, ShastaConfig

    pp = dict(
        voxel_size=(0.1, 0.1, 0.05), pc_range=(-1.6, -1.6, -1, 1.6, 1.6, 1),
        max_points_in_voxel=4, max_voxels=512, nsweeps=1,
        shuffle_points=False, global_rot_noise=None,
        global_scale_noise=None, global_translate_std=None,
    )
    g = np.random.default_rng(1)
    pts = np.concatenate(
        [g.uniform(-1.5, 1.5, (60, 3)), g.normal(size=(60, 2))], axis=1
    ).astype(np.float32)

    def batch_of(cfg_pp):
        v, c, n, val = voxelize_frame(pts, PointPipelineConfig(**cfg_pp),
                                      np.random.default_rng(2), train=False)
        return {
            "voxels": jnp.asarray(v[None]),
            "num_points": jnp.asarray(n[None]),
            "coordinates": jnp.asarray(c[None]),
            "voxels_valid": jnp.asarray(val[None]),
        }

    full = batch_of(pp)
    tiered = batch_of({**pp, "voxel_tiers": (128,)})
    assert tiered["voxels"].shape[1] == 128 < full["voxels"].shape[1]

    mcfg = ShastaConfig(max_obj=4, grid_shape=(41, 32, 32),
                        pc_start=(-1.6, -1.6),
                        cap_conv2=256, cap_conv3=128, cap_conv4=64,
                        cap_extra=64)
    model = ShastaModel(mcfg)
    variables = model.init(jax.random.PRNGKey(0), full, train=False,
                           method=ShastaModel.bev_single)
    bev_full = model.apply(variables, full, train=False,
                           method=ShastaModel.bev_single)
    bev_tier = model.apply(variables, tiered, train=False,
                           method=ShastaModel.bev_single)
    np.testing.assert_allclose(np.asarray(bev_tier), np.asarray(bev_full),
                               atol=1e-5)
