"""Closed-loop training sanity: on a learnable synthetic association task
(curr dets = prev dets + noise, diagonal GT matching), the full training
stack (frozen trunk, masked bidirectional CE, Adam) reduces the loss
substantially within a few dozen steps."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from shasta_tpu.data.synthetic import make_batch
from shasta_tpu.models import ShastaModel, ShastaConfig
from shasta_tpu.train.loop import (
    bidirectional_ce,
    create_train_state,
    make_optimizer,
    make_train_step,
)


def _learnable_batch(cfg, rng, B=4):
    base = make_batch(cfg, batch_size=B, num_voxels_cap=256, n_dets=cfg.max_obj,
                      with_gt=True, seed=int(rng.integers(1 << 30)))
    N = cfg.max_obj
    for b in range(B):
        prev = base["prev_det_boxes"][b]
        curr = prev.copy()
        curr[:, :2] += rng.normal(0, 0.3, (N, 2)).astype(np.float32)
        curr[:, 9] = 0.5
        base["det_boxes"][b] = curr
        gt = np.zeros((N + 2, N + 2), np.float32)
        for i in range(N):
            gt[i, i] = 1.0
        base["gt"][b] = gt
    return base


def test_training_reduces_loss(rng):
    cfg = ShastaConfig(
        max_obj=6, grid_shape=(41, 48, 48),
        cap_conv2=512, cap_conv3=256, cap_conv4=128, cap_extra=128,
    )
    model = ShastaModel(cfg)
    b0 = _learnable_batch(cfg, rng)
    batch0 = {k: jnp.asarray(v) for k, v in b0.items()}
    variables = model.init(jax.random.PRNGKey(0), batch0, train=False)

    tx = make_optimizer(learning_rate=3e-4, freeze_bev=True,
                        params=variables["params"])
    state = create_train_state(model, variables, tx)
    step = make_train_step(model, tx, donate=False)

    losses = []
    for i in range(30):
        b = _learnable_batch(cfg, rng)
        batch = {k: jnp.asarray(v) for k, v in b.items()}
        state, m = step(state, batch)
        losses.append(float(m["loss"]))

    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert np.isfinite(last)
    assert last < first * 0.7, (first, last, losses)

    # frozen trunk: backbone params unchanged, affinity params changed
    w0 = variables["params"]["backbone"]["conv_input_kernel"]
    w1 = state.params["backbone"]["conv_input_kernel"]
    np.testing.assert_array_equal(np.asarray(w0), np.asarray(w1))
    a0 = variables["params"]["affinity"]["aff"]["layers_0"]["kernel"]
    a1 = state.params["affinity"]["aff"]["layers_0"]["kernel"]
    assert np.abs(np.asarray(a0) - np.asarray(a1)).max() > 0


def test_frozen_trunk_fast_step_matches_standard(rng):
    """frozen_trunk_fast differentiates only shared_conv+affinity; with the
    freeze_bev optimizer the resulting update must equal the standard
    step's bit-for-bit (frozen grads are zeroed either way)."""
    cfg = ShastaConfig(
        max_obj=6, grid_shape=(41, 48, 48),
        cap_conv2=512, cap_conv3=256, cap_conv4=128, cap_extra=128,
    )
    model = ShastaModel(cfg)
    b0 = _learnable_batch(cfg, rng)
    batch = {k: jnp.asarray(v) for k, v in b0.items()}
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    tx = make_optimizer(learning_rate=3e-4, freeze_bev=True,
                        params=variables["params"])
    s_std = create_train_state(model, variables, tx)
    s_fast = create_train_state(model, variables, tx)
    step_std = make_train_step(model, tx, donate=False)
    step_fast = make_train_step(model, tx, donate=False,
                                frozen_trunk_fast=True)

    s_std, m_std = step_std(s_std, batch)
    s_fast, m_fast = step_fast(s_fast, batch)
    np.testing.assert_allclose(float(m_std["loss"]), float(m_fast["loss"]),
                               rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=1e-6),
        s_std.params, s_fast.params,
    )
    # frozen trunk untouched in both
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        s_fast.params["backbone"], variables["params"]["backbone"],
    )


@pytest.mark.slow  # Pallas interpret mode on CPU: ~10 min
def test_frozen_trunk_fast_runs_pallas_forward(rng):
    """The whole point of frozen_trunk_fast: a use_pallas_gather=True config
    must trace and run inside the train step (the standard step would
    demand a VJP the Pallas kernels don't define)."""
    cfg = ShastaConfig(
        max_obj=6, grid_shape=(41, 48, 48),
        cap_conv2=512, cap_conv3=256, cap_conv4=128, cap_extra=128,
        use_pallas_gather=True,
    )
    model = ShastaModel(cfg)
    b0 = _learnable_batch(cfg, rng, B=1)
    batch = {k: jnp.asarray(v) for k, v in b0.items()}
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    tx = make_optimizer(learning_rate=3e-4, freeze_bev=True,
                        params=variables["params"])
    state = create_train_state(model, variables, tx)
    step = make_train_step(model, tx, donate=False, frozen_trunk_fast=True)
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
