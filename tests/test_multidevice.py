"""Multi-device regression tests on the 8-device CPU-emulated mesh.

SURVEY §2.8: the reference's only parallelism is single-node DDP over NCCL
(train.py:92-156); the TPU-native equivalent is shard_map data parallelism
with psum gradient averaging and psum SyncBN. These tests pin that
equivalence numerically on the conftest-provided 8 fake devices — the
multi-node story the reference never had (SURVEY §4.7).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from shasta_tpu.data.synthetic import make_batch
from shasta_tpu.models import ShastaModel, ShastaConfig
from shasta_tpu.parallel.mesh import make_mesh, shard_batch
from shasta_tpu.train.loop import (
    create_train_state,
    make_optimizer,
    make_train_step,
)

# 8-device CPU mesh: large sharded compiles
pytestmark = pytest.mark.slow

B = 8  # one sample per fake device


def _cfg():
    # NOTE: the sparse-stage caps are per compiled program (the batch's
    # voxels share one fixed-capacity table), so they must be large enough
    # that NEITHER the B=8 single-program run NOR the 8x B=1 sharded runs
    # drop voxels — otherwise the two computations legitimately differ.
    return ShastaConfig(
        max_obj=6, grid_shape=(41, 32, 32),
        cap_conv2=4096, cap_conv3=2048, cap_conv4=1024, cap_extra=1024,
    )


def _diag_batch(cfg, seed=0):
    """Batch whose GT mass is identical per sample, so per-shard CE
    normalization matches the global one and DP must equal single-device."""
    b = make_batch(cfg, batch_size=B, num_voxels_cap=128, n_dets=cfg.max_obj,
                   with_gt=True, seed=seed)
    N = cfg.max_obj
    # move box centers onto the (tiny) BEV map so descriptors are nonzero —
    # off-map boxes sample structural zeros and park ReLU/abs exactly on
    # their kinks, where batched-vs-sharded reassociation flips subgradients
    span = cfg.voxel_size[0] * cfg.grid_shape[2] * 0.9
    for key in ("det_boxes", "prev_det_boxes"):
        ct = b[key][:, :, :2]
        b[key][:, :, :2] = cfg.pc_start[0] + (ct + 50.0) / 100.0 * span
    gt = np.zeros((B, N + 2, N + 2), np.float32)
    for i in range(N):
        gt[:, i, i] = 1.0
    b["gt"] = gt
    return b


@pytest.fixture(scope="module")
def setup():
    cfg = _cfg()
    model = ShastaModel(cfg)
    b = _diag_batch(cfg)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    tx = make_optimizer(learning_rate=1e-3, freeze_bev=True,
                        params=variables["params"])
    return dict(cfg=cfg, model=model, batch_np=b, batch=batch,
                variables=variables, tx=tx)


def test_psum_grads_equal_per_sample_mean(setup):
    """(a1) shard_map pmean'd gradients == python mean of the 8 per-sample
    gradients. Each shard runs the SAME B=1-shaped program as the python
    loop, so the only difference is the psum — this pins the DP plumbing
    (the coalesced-allreduce equivalence, dist_utils.py:8-42) tightly."""
    assert len(jax.devices()) >= 8, "conftest must provide 8 fake devices"
    shard_map = jax.shard_map
    from jax.sharding import PartitionSpec as P

    from shasta_tpu.train.loop import bidirectional_ce

    model, variables = setup["model"], setup["variables"]
    mesh = make_mesh(8)

    def loss_fn(params, batch):
        m1, m2 = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch, train=False,
        )
        return bidirectional_ce(m1, m2, batch["gt"])

    grad_one = jax.jit(jax.grad(loss_fn))
    per_sample = []
    for i in range(B):
        one = {k: jnp.asarray(v[i : i + 1]) for k, v in setup["batch_np"].items()}
        per_sample.append(grad_one(variables["params"], one))
    mean_grads = jax.tree.map(
        lambda *gs: np.mean(np.stack([np.asarray(g) for g in gs]), axis=0),
        *per_sample,
    )

    def local(params, batch):
        return jax.lax.pmean(jax.grad(loss_fn)(params, batch), "data")

    dp_grads = jax.jit(shard_map(
        local, mesh=mesh, in_specs=(P(), P("data")), out_specs=P(),
        check_vma=False,
    ))(variables["params"], setup["batch"])

    flat_m = jax.tree_util.tree_leaves_with_path(mean_grads)
    flat_d = jax.tree_util.tree_leaves(dp_grads)
    for (path, a), bb in zip(flat_m, flat_d):
        scale = max(1e-3, float(np.max(np.abs(a))))
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(bb) / scale, atol=1e-5,
            err_msg=jax.tree_util.keystr(path),
        )


def test_shard_map_step_equals_single_device(setup):
    """(a2) one shard_map DP step tracks one single-device B=8 step.

    Looser tolerance by necessity: XLA tiles the B=8 and B=1 convolutions
    differently (float reassociation), and at random init the CE's 1/p on
    near-zero probabilities amplifies those last-ulp forward diffs into
    visible relative gradient noise. SGD keeps the update linear; the
    per-sample-mean test above pins the plumbing tightly."""
    import optax

    model, variables = setup["model"], setup["variables"]
    tx = optax.sgd(1e-2)
    mesh = make_mesh(8)

    s_single = create_train_state(model, variables, tx)
    step_single = make_train_step(model, tx, donate=False)
    s_single, m_single = step_single(s_single, setup["batch"])

    s_dp = create_train_state(model, variables, tx)
    step_dp = make_train_step(model, tx, mesh=mesh, donate=False)
    sharded = shard_batch(setup["batch_np"], mesh)
    s_dp, m_dp = step_dp(s_dp, sharded)

    np.testing.assert_allclose(
        float(m_dp["loss"]), float(m_single["loss"]), rtol=1e-5, atol=1e-5
    )
    flat_s = jax.tree_util.tree_leaves_with_path(s_single.params)
    flat_d = jax.tree_util.tree_leaves(s_dp.params)
    for (path, a), bb in zip(flat_s, flat_d):
        a, bb = np.asarray(a), np.asarray(bb)
        scale = max(1.0, float(np.max(np.abs(a))))
        np.testing.assert_allclose(
            a / scale, bb / scale, atol=2e-3,
            err_msg=jax.tree_util.keystr(path),
        )


def test_syncbn_psum_matches_global_stats(rng):
    """(b) psum'd per-shard masked batch stats == global stats (the apex
    SyncBN equivalence, train.py:155)."""
    shard_map = jax.shard_map
    from jax.sharding import PartitionSpec as P

    from shasta_tpu.ops.sparse import masked_batch_stats

    mesh = make_mesh(8)
    V, C = 64 * 8, 5
    feats = rng.normal(size=(V, C)).astype(np.float32)
    valid = rng.random(V) < 0.7

    g_mean, g_var = masked_batch_stats(jnp.asarray(feats), jnp.asarray(valid))

    def local(f, v):
        return masked_batch_stats(f, v, axis_name="data")

    s_mean, s_var = jax.jit(shard_map(
        local, mesh=mesh, in_specs=(P("data"), P("data")),
        out_specs=(P(), P()), check_vma=False,
    ))(jnp.asarray(feats), jnp.asarray(valid))

    np.testing.assert_allclose(np.asarray(s_mean), np.asarray(g_mean), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_var), np.asarray(g_var), atol=1e-5)


def test_bn_train_updates_stats_on_mesh(setup):
    """(c1) bn_train=True on the mesh: runs, loss finite, stats mutate."""
    model, tx, variables = setup["model"], setup["tx"], setup["variables"]
    mesh = make_mesh(8)
    state = create_train_state(model, variables, tx)
    step = make_train_step(model, tx, mesh=mesh, bn_train=True, donate=False)
    sharded = shard_batch(setup["batch_np"], mesh)
    new_state, m = step(state, sharded)
    assert np.isfinite(float(m["loss"]))
    before = jax.tree_util.tree_leaves(state.batch_stats)
    after = jax.tree_util.tree_leaves(new_state.batch_stats)
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(bf))
        for a, bf in zip(after, before)
    )
    assert changed, "bn_train=True must update running batch stats"


def test_remat_step_matches_plain(setup):
    """(c2) remat=True is a pure memory/computation trade: identical step."""
    model, tx, variables = setup["model"], setup["tx"], setup["variables"]
    s1 = create_train_state(model, variables, tx)
    s2 = create_train_state(model, variables, tx)
    plain = make_train_step(model, tx, donate=False)
    remat = make_train_step(model, tx, donate=False, remat=True)
    s1, m1 = plain(s1, setup["batch"])
    s2, m2 = remat(s2, setup["batch"])
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_batched_pipeline_under_shard_batch(setup):
    """(d) BatchedScenePipeline with device-sharded frames produces the
    same tracks as the unsharded run (serving-side data parallelism)."""
    from shasta_tpu.infer import BatchedScenePipeline, default_tracker_params

    cfg, model, variables = setup["cfg"], setup["model"], setup["variables"]
    mesh = make_mesh(8)
    params = default_tracker_params(max_age=4)
    keys = ("voxels", "num_points", "coordinates", "voxels_valid", "det_boxes")

    def frames(seed):
        b = make_batch(cfg, batch_size=B, num_voxels_cap=128,
                       n_dets=cfg.max_obj, seed=seed)
        return {k: b[k] for k in keys}

    pipe_plain = BatchedScenePipeline(
        model=model, variables=variables, cls_id=2, params=params, batch=B)
    pipe_shard = BatchedScenePipeline(
        model=model, variables=variables, cls_id=2, params=params, batch=B)

    n_curr = [cfg.max_obj] * B
    lags = [0.5] * B
    for fi in range(2):
        f = frames(fi)
        reset = [fi == 0] * B
        out_p = pipe_plain.step_frames(f, n_curr, reset, lags)
        out_s = pipe_shard.step_frames(shard_batch(f, mesh), n_curr, reset, lags)
        np.testing.assert_array_equal(out_p.used, out_s.used)
        np.testing.assert_array_equal(out_p.tid, out_s.tid)
        np.testing.assert_allclose(out_p.ref, out_s.ref, atol=1e-5)
        np.testing.assert_array_equal(out_p.fn, out_s.fn)


def test_sorted_voxel_guard_under_sharding(setup):
    """assume_sorted_voxels (lax.cond sort guard) compiles and matches the
    plain path when the serving frames are device-sharded — the production
    configs enable it, so it must hold under SPMD partitioning too."""
    from shasta_tpu.infer import BatchedScenePipeline, default_tracker_params
    from shasta_tpu.models import ShastaModel, ShastaConfig
    import dataclasses

    cfg = setup["cfg"]
    cfg_sorted = dataclasses.replace(cfg, assume_sorted_voxels=True)
    model_s = ShastaModel(cfg_sorted)
    variables = setup["variables"]
    mesh = make_mesh(8)
    params = default_tracker_params(max_age=4)
    keys = ("voxels", "num_points", "coordinates", "voxels_valid", "det_boxes")
    b = make_batch(cfg, batch_size=B, num_voxels_cap=128, n_dets=cfg.max_obj, seed=5)
    f = {k: b[k] for k in keys}

    plain = BatchedScenePipeline(
        model=setup["model"], variables=variables, cls_id=2, params=params, batch=B)
    guarded = BatchedScenePipeline(
        model=model_s, variables=variables, cls_id=2, params=params, batch=B)

    n_curr = [cfg.max_obj] * B
    args = (n_curr, [True] * B, [0.5] * B)
    out_p = plain.step_frames(f, *args)
    out_g = guarded.step_frames(shard_batch(f, mesh), *args)
    np.testing.assert_array_equal(out_p.used, out_g.used)
    np.testing.assert_array_equal(out_p.tid, out_g.tid)
    np.testing.assert_allclose(out_p.ref, out_g.ref, atol=1e-5)
