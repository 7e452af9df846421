"""Cached-descriptor training: identical math to the full step, ~100x less
compute (the trunk is frozen in the reference recipe, train.py:184-191, so
per-frame BEV descriptors are constants)."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from shasta_tpu.data.synthetic import make_batch
from shasta_tpu.models import ShastaModel, ShastaConfig
from shasta_tpu.train.loop import create_train_state, make_optimizer, make_train_step


@pytest.fixture(scope="module")
def setup():
    # caps sized so NEITHER the doubled-batch full step (2 frames x B=2
    # packed in one table) NOR the per-frame cached trunk drops voxels —
    # otherwise the two computations legitimately differ
    cfg = ShastaConfig(
        max_obj=6, grid_shape=(41, 48, 48),
        cap_conv2=2048, cap_conv3=1024, cap_conv4=512, cap_extra=512,
    )
    model = ShastaModel(cfg)
    b = make_batch(cfg, batch_size=2, num_voxels_cap=256, n_dets=6,
                   with_gt=True, seed=0)
    # put box centers on the (tiny) BEV map: off-map descriptors are
    # structural zeros that park ReLU exactly on its kink, where the two
    # compilation layouts legitimately pick different subgradients
    span = cfg.voxel_size[0] * cfg.grid_shape[2] * 0.9
    for key in ("det_boxes", "prev_det_boxes"):
        ct = b[key][:, :, :2]
        b[key][:, :, :2] = cfg.pc_start[0] + (ct + 50.0) / 100.0 * span
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    # flax init leaves the trunk's shared-conv output sitting exactly on
    # its ReLU kink for this tiny config (activations ~1e-4), where the two
    # program layouts legitimately pick different subgradients; use
    # non-degenerate random weights (as bench.py does) instead
    rng = np.random.default_rng(1)
    variables = {
        "params": jax.tree.map(
            lambda s: jnp.asarray(rng.normal(0, 0.05, s.shape).astype(np.float32)),
            variables["params"],
        ),
        "batch_stats": variables["batch_stats"],  # keep vars positive
    }
    return dict(cfg=cfg, model=model, batch=batch, variables=variables)


def _cached_batch(model, variables, batch):
    """Precompute both frames' descriptors exactly as cache_features does."""
    keys = ("voxels", "num_points", "coordinates", "voxels_valid", "det_boxes")
    curr = {k: batch[k] for k in keys}
    prev = {k: batch["prev_" + k if k != "det_boxes" else "prev_det_boxes"]
            for k in keys}
    feat = model.apply(variables, curr, train=False,
                       method=ShastaModel.frame_features)
    prev_feat = model.apply(variables, prev, train=False,
                            method=ShastaModel.frame_features)
    return {
        "det_boxes": batch["det_boxes"],
        "prev_det_boxes": batch["prev_det_boxes"],
        "gt": batch["gt"],
        "feat": feat,
        "prev_feat": prev_feat,
    }


def test_cached_step_equals_full_step(setup):
    """Same loss and same affinity-parameter update as the voxel step."""
    model, variables, batch = setup["model"], setup["variables"], setup["batch"]
    tx = optax.sgd(1e-3)

    s_full = create_train_state(model, variables, tx)
    s_full, m_full = make_train_step(model, tx, donate=False)(s_full, batch)

    cb = _cached_batch(model, variables, batch)
    s_c = create_train_state(model, variables, tx)
    s_c, m_c = make_train_step(model, tx, donate=False, cached=True)(s_c, cb)

    np.testing.assert_allclose(float(m_c["loss"]), float(m_full["loss"]),
                               rtol=1e-5, atol=1e-6)
    for part in ("affinity", "shared_conv"):
        for (path, a), bb in zip(
            jax.tree_util.tree_leaves_with_path(s_full.params[part]),
            jax.tree_util.tree_leaves(s_c.params[part]),
        ):
            a, bb = np.asarray(a), np.asarray(bb)
            scale = max(1e-3, float(np.max(np.abs(a))))
            # descriptors come from a standalone frame_features program, so
            # last-ulp reassociation diffs pass through the CE's 1/p at
            # random init; loss itself matches to 1e-5 above
            np.testing.assert_allclose(
                a / scale, bb / scale, atol=2e-3,
                err_msg=part + jax.tree_util.keystr(path),
            )
    # trunk params untouched in the cached step (no gradient path at all)
    for part in ("backbone", "neck"):
        for a, bb in zip(jax.tree_util.tree_leaves(variables["params"][part]),
                         jax.tree_util.tree_leaves(s_c.params[part])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))


def test_cached_training_learns(setup):
    """Affinity-only steps reduce the loss on the learnable diag task."""
    model, cfg = setup["model"], setup["cfg"]
    # standard flax init (the 0.05-random weights above exist only to keep
    # the equality test off ReLU kinks; they train poorly)
    variables = model.init(jax.random.PRNGKey(1), setup["batch"], train=False)
    tx = make_optimizer(learning_rate=1e-3, freeze_bev=True,
                        params=variables["params"])
    state = create_train_state(model, variables, tx)
    step = make_train_step(model, tx, donate=False, cached=True)

    rng = np.random.default_rng(0)
    N = cfg.max_obj
    F = cfg.num_point * cfg.share_conv_channel

    def batch():
        b = make_batch(cfg, batch_size=4, num_voxels_cap=64, n_dets=N,
                       with_gt=True, seed=int(rng.integers(1 << 30)))
        prev = b["prev_det_boxes"]
        curr = prev.copy()
        curr[:, :, :2] += rng.normal(0, 0.3, (4, N, 2)).astype(np.float32)
        curr[:, :, 9] = 0.5
        gt = np.zeros((4, N + 2, N + 2), np.float32)
        for i in range(N):
            gt[:, i, i] = 1.0
        # descriptors: a fixed random embedding per det slot, shared across
        # frames for matched pairs (so shape residuals are informative)
        emb = rng.normal(0, 1, (4, N, F)).astype(np.float32)
        return {
            "det_boxes": jnp.asarray(curr),
            "prev_det_boxes": jnp.asarray(prev),
            "gt": jnp.asarray(gt),
            "feat": jnp.asarray(emb),
            "prev_feat": jnp.asarray(emb),
        }

    losses = []
    for _ in range(60):
        state, m = step(state, batch())
        losses.append(float(m["loss"]))
    # random-embedding descriptors learn slower than real geometry ones
    # (cf. test_training_learns); require a clear, substantial decrease
    assert np.mean(losses[-5:]) < 0.75 * np.mean(losses[:5]), losses
    assert losses[-1] < losses[0] - 0.5, losses
