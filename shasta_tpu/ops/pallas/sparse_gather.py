"""Pallas TPU kernel: VMEM-resident sparse-conv gather + MXU matmul.

The sparse conv's hot op is the neighbor gather feeding the im2col matmul
(ops/sparse.py subm_conv_apply). XLA implements it as an HBM gather of
(V, K, C) rows; this kernel instead keeps the WHOLE per-stage feature
table in VMEM (max 120k x 16 x 4B = 7.7 MB; later stages smaller — always
under the ~16 MB budget) and gathers VMEM->VMEM per voxel tile, so the
random-access traffic never touches HBM. Per tile, the K kernel taps are
unrolled: gather (TILE, C) rows for tap k and accumulate the
(TILE, C) x (C, Co) matmul on the MXU with f32 accumulation.

Status: semantics validated in interpret mode (tests); intended for
round-2 on-chip benchmarking vs the XLA gather (see PERF_NOTES.md). The
wrapper falls back to the XLA path unless explicitly enabled.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(idx_ref, feats_ref, w_ref, out_ref, *, K: int, C: int):
    # idx_ref: (TILE, K) int32 into feats rows; feats_ref: (V1, C) full
    # table (VMEM); w_ref: (K, C, Co); out_ref: (TILE, Co)
    TILE = idx_ref.shape[0]
    Co = out_ref.shape[1]
    acc = jnp.zeros((TILE, Co), jnp.float32)
    feats = feats_ref[:]
    for k in range(K):
        rows = jnp.take(feats, idx_ref[:, k], axis=0)  # (TILE, C) VMEM gather
        acc = acc + jax.lax.dot_general(
            rows, w_ref[k],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def subm_conv_pallas(
    feats: jnp.ndarray,  # (V, C) float32 — valid rows zero-padded
    gather: jnp.ndarray,  # (V, K) int32, V means "no neighbor"
    weight: jnp.ndarray,  # (K, C, Co)
    tile: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    V, C = feats.shape
    K, _, Co = weight.shape
    # pad the table with the zero "miss" row and V up to a tile multiple
    Vp = ((V + tile - 1) // tile) * tile
    table = jnp.zeros((V + 1, C), feats.dtype).at[:V].set(feats)
    idx = jnp.full((Vp, K), V, jnp.int32).at[:V].set(gather)

    out = pl.pallas_call(
        functools.partial(_kernel, K=K, C=C),
        grid=(Vp // tile,),
        in_specs=[
            pl.BlockSpec((tile, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full table resident
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full weight
        ],
        out_specs=pl.BlockSpec((tile, Co), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Vp, Co), jnp.float32),
        interpret=interpret,
    )(idx, table, weight)
    return out[:V]
