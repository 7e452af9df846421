"""Training step: masked bidirectional CE + optax + data-parallel shard_map.

Behavioral reference: tools/nusc_shasta/train.py:141-224 —
  Adam(lr=1e-4, weight_decay=1e-2) (torch Adam+L2, NOT AdamW),
  optional OneCycle schedule (configs/nusc/car.py:223-229),
  frozen BEV trunk (backbone + neck, train.py:184-191),
  loss = mean of row-CE(matched1 | gt[:, :-2, :]) and
         col-CE(matched2 | gt[:, :, :-2]), each normalized by the GT mass
         (train.py:208-211).

TPU-native distribution: instead of apex DDP + NCCL allreduce, the step is
wrapped in ``shard_map`` over a 1-D 'data' mesh; each device computes grads
on its local shard and ``psum``-averages them over ICI (exactly DDP's
gradient mean). SyncBN (train.py:155) falls out of the same psum when the
trunk's BatchNorm runs in train mode.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, PartitionSpec as P

EPS = 1e-10


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def bidirectional_ce(matched1: jnp.ndarray, matched2: jnp.ndarray, gt: jnp.ndarray):
    """Masked bidirectional cross-entropy (train.py:201-211).

    gt: (B, N+2, N+2) with rows = prev dets + [newborn, fp], cols = curr
    dets + [dead, fn]. Zero rows/cols contribute nothing.
    """
    gt1 = gt[:, :-2, :]
    gt2 = gt[:, :, :-2]
    f = jnp.sum(gt1 * -jnp.log(matched1 + EPS))
    b = jnp.sum(gt2 * -jnp.log(matched2 + EPS))
    s1 = jnp.sum(gt1)
    s2 = jnp.sum(gt2)
    loss_f = jnp.where(s1 > 0, f / jnp.maximum(s1, 1.0), f)
    loss_b = jnp.where(s2 > 0, b / jnp.maximum(s2, 1.0), b)
    return (loss_f + loss_b) / 2.0


def _param_labels(params, freeze_bev: bool):
    def label(path, _):
        top = path[0].key
        if freeze_bev and top in ("backbone", "neck"):
            return "frozen"
        return "train"

    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer(
    learning_rate: float = 1e-4,
    weight_decay: float = 1e-2,
    freeze_bev: bool = True,
    params=None,
    schedule: optax.Schedule | None = None,
    grad_clip_norm: float | None = None,
) -> optax.GradientTransformation:
    """torch Adam(+L2) equivalent with optional OneCycle + frozen trunk."""
    lr = schedule if schedule is not None else learning_rate
    chain = []
    if grad_clip_norm is not None:
        chain.append(optax.clip_by_global_norm(grad_clip_norm))
    # torch Adam weight_decay: L2 added to the grad BEFORE moment updates.
    chain += [optax.add_decayed_weights(weight_decay), optax.scale_by_adam(),
              optax.scale_by_learning_rate(lr)]
    tx = optax.chain(*chain)
    if freeze_bev:
        assert params is not None, "freeze_bev needs params for labeling"
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()},
            _param_labels(params, True),
        )
    return tx


def one_cycle_schedule(total_steps: int, max_lr: float = 1e-3, pct_start: float = 0.4,
                       div_factor: float = 10.0) -> optax.Schedule:
    """torch OneCycleLR(cos) equivalent (configs/nusc/car.py:223-229)."""
    return optax.cosine_onecycle_schedule(
        transition_steps=total_steps,
        peak_value=max_lr,
        pct_start=pct_start,
        div_factor=div_factor,
        final_div_factor=1e4,
    )


def create_train_state(model, variables, tx) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )


FROZEN_TRUNK_KEYS = ("backbone", "neck")


def make_train_step(model, tx, mesh: Mesh | None = None, axis: str = "data",
                    bn_train: bool = False, donate: bool = True,
                    remat: bool = False, cached: bool = False,
                    frozen_trunk_fast: bool = False):
    """Build the jitted train step; data-parallel over `mesh` if given.

    remat=True rematerializes the forward during backprop (jax.checkpoint)
    — trades trunk FLOPs for activation memory, the TPU HBM lever for
    larger per-device batches.

    cached=True trains on precomputed BEV descriptors (batch keys `feat` /
    `prev_feat`, tools/cache_features.py) instead of voxels: with the
    frozen trunk of the reference recipe (train.py:184-191) the
    descriptors are constants, so the step runs the affinity head alone —
    ~100x fewer FLOPs than the reference's recompute-both-trunks step.
    Incompatible with bn_train (the trunk never runs).

    frozen_trunk_fast=True exploits the same frozen-trunk recipe without a
    feature cache: only the NON-trunk params (shared_conv + affinity) are
    differentiated, the backbone/neck forward becomes a constant subgraph
    (no VJP is ever built through it), and the trunk may therefore run the
    inference-only Pallas sparse kernels (ops/sparse.py documents that no
    VJP exists for that path). Frozen params receive zero grads, matching
    the optax.multi_transform('frozen' -> set_to_zero) labeling.
    Incompatible with bn_train (a frozen trunk runs eval-mode BN,
    train.py:184-191) and pointless with cached."""
    assert not (cached and bn_train), "cached training never runs the trunk"
    assert not (frozen_trunk_fast and bn_train), (
        "frozen_trunk_fast keeps the trunk constant; BN must run in eval mode"
    )

    def _forward(params, batch_stats, batch):
        variables = {"params": params, "batch_stats": batch_stats}
        if cached:
            from ..models.shasta import ShastaModel

            m1, m2 = model.apply(
                variables, batch["prev_det_boxes"], batch["det_boxes"],
                batch["prev_feat"], batch["feat"],
                method=ShastaModel.affinity_step,
            )
            return m1, m2, batch_stats
        if bn_train:
            (m1, m2), updates = model.apply(
                variables, batch, train=True, mutable=["batch_stats"]
            )
            return m1, m2, updates["batch_stats"]
        m1, m2 = model.apply(variables, batch, train=False)
        return m1, m2, batch_stats

    if remat:
        _forward = jax.checkpoint(_forward)

    def loss_fn(params, batch_stats, batch):
        m1, m2, new_stats = _forward(params, batch_stats, batch)
        loss = bidirectional_ce(m1, m2, batch["gt"])
        return loss, new_stats

    def local_step(state: TrainState, batch):
        if frozen_trunk_fast:
            frozen = {k: v for k, v in state.params.items()
                      if k in FROZEN_TRUNK_KEYS}
            trainable = {k: v for k, v in state.params.items()
                         if k not in FROZEN_TRUNK_KEYS}

            def train_loss(tp, batch_stats, batch):
                return loss_fn({**frozen, **tp}, batch_stats, batch)

            (loss, new_stats), g = jax.value_and_grad(
                train_loss, has_aux=True
            )(trainable, state.batch_stats, batch)
            grads = {**jax.tree.map(jnp.zeros_like, frozen), **g}
        else:
            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, state.batch_stats, batch)
        if mesh is not None:
            grads = jax.lax.pmean(grads, axis)
            loss = jax.lax.pmean(loss, axis)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_stats,
                opt_state=new_opt,
            ),
            {"loss": loss},
        )

    if mesh is None:
        return jax.jit(local_step, donate_argnums=(0,) if donate else ())

    if hasattr(jax, "shard_map"):
        sharded = jax.shard_map(
            local_step, mesh=mesh, in_specs=(P(), P(axis)),
            out_specs=(P(), P()), check_vma=False,
        )
    else:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

        sharded = shard_map(
            local_step, mesh=mesh, in_specs=(P(), P(axis)),
            out_specs=(P(), P()), check_rep=False,
        )
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())
