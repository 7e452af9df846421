"""Pallas TPU kernel: VMEM-resident sparse-conv gather + MXU matmul.

The sparse conv's hot op is the neighbor gather feeding the im2col matmul
(ops/sparse.py subm_conv_apply / strided_conv_apply — the spconv
replacement for det3d/models/backbones/scn.py). XLA implements it as an
HBM gather of (M, K, C) rows; this kernel instead keeps the WHOLE
per-stage feature table in VMEM (max 120k x 16 x 4B = 7.7 MB; later
stages smaller — always under the ~16 MB budget) and gathers VMEM->VMEM
per output tile, so the random-access traffic never touches HBM. Per
tile, the K kernel taps are unrolled: gather (TILE, C) rows for tap k and
accumulate the (TILE, C) x (C, Co) matmul on the MXU with f32
accumulation.

Wired into SparseBackbone behind ``use_pallas_gather``
(ShastaConfig.use_pallas_gather); inference-path only — no custom VJP is
defined, training keeps the XLA gather.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(idx_ref, feats_ref, w_ref, out_ref, *, K: int, C: int):
    # idx_ref: (TILE, K) int32 into feats rows; feats_ref: (V+1, C) full
    # table (VMEM, row V = zero "miss" row); w_ref: (K, C, Co);
    # out_ref: (TILE, Co)
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


def gathered_conv_pallas(feats, gather, weight, tile: int = 256,
                         interpret: bool | None = None):
    """im2col conv as tiled VMEM gather + MXU matmul. Returns (M, Co) f32.

    M (the output position count) is independent of V: submanifold convs
    pass M == V, strided convs pass the output-set capacity.
    interpret=None auto-selects: compiled on TPU, interpreter elsewhere
    (so the wired flag stays testable on the CPU suite).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _gathered_conv_pallas(feats, gather, weight, tile=tile,
                                 interpret=bool(interpret))


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def _gathered_conv_pallas(
    feats: jnp.ndarray,  # (V, C) — the input feature table, invalid rows zero
    gather: jnp.ndarray,  # (M, K) int32 row indices, V means "no neighbor"
    weight: jnp.ndarray,  # (K, C, Co)
    tile: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    V, C = feats.shape
    M, K = gather.shape
    Co = weight.shape[2]
    # pad the table with the zero "miss" row and M up to a tile multiple
    Mp = ((M + tile - 1) // tile) * tile
    table = jnp.zeros((V + 1, C), feats.dtype).at[:V].set(feats)
    idx = jnp.full((Mp, K), V, jnp.int32).at[:M].set(gather)

    out = pl.pallas_call(
        functools.partial(_kernel, K=K, C=C),
        grid=(Mp // tile,),
        in_specs=[
            pl.BlockSpec((tile, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full table resident
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full weight
        ],
        out_specs=pl.BlockSpec((tile, Co), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Co), jnp.float32),
        interpret=interpret,
    )(idx, table, weight)
    return out[:M]


def subm_conv_pallas(feats, gather, weight, tile: int = 256, interpret: bool = False):
    """Back-compat alias (submanifold case: one output row per input row)."""
    return gathered_conv_pallas(feats, gather, weight, tile=tile, interpret=interpret)


def _lookup_kernel(q_ref, keys_ref, perm_ref, out_ref, *, V: int, steps: int,
                   sentinel: int):
    # q_ref: (TILE, K) int32 queries; keys_ref: (V,) ascending; perm_ref:
    # (V,) argsort permutation; out_ref: (TILE, K) input-row indices (V=miss)
    q = q_ref[:]
    keys = keys_ref[:]
    lo = jnp.zeros(q.shape, jnp.int32)
    hi = jnp.full(q.shape, V, jnp.int32)
    for _ in range(steps):  # static unroll of the binary search
        mid = (lo + hi) // 2
        km = jnp.take(keys, jnp.clip(mid, 0, V - 1))
        go_right = km < q
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    pos = jnp.clip(lo, 0, V - 1)  # searchsorted(side='left'), clipped
    found = (jnp.take(keys, pos) == q) & (q != sentinel)
    out_ref[:] = jnp.where(found, jnp.take(perm_ref[:], pos), V).astype(jnp.int32)


def sorted_lookup_pallas(sorted_keys, perm, queries, tile: int = 512,
                         interpret: bool | None = None):
    """VMEM-resident searchsorted: find each query key's input row.

    XLA lowers jnp.searchsorted to ~log2(V) rounds of HBM gathers; the key
    table is tiny (120k x 4B = 0.5 MB), so this kernel keeps it in VMEM and
    runs the whole binary search on-chip. Same contract as
    ops/sparse._sorted_lookup: returns int32 in [0, V], V = "not found".
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _sorted_lookup_pallas(sorted_keys, perm, queries, tile=tile,
                                 interpret=bool(interpret))


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def _sorted_lookup_pallas(sorted_keys, perm, queries, tile: int = 512,
                          interpret: bool = False):
    V = sorted_keys.shape[0]
    sentinel = jnp.iinfo(jnp.int32).max
    shape = queries.shape
    q2 = queries.reshape(-1, shape[-1]) if queries.ndim > 1 else queries.reshape(-1, 1)
    M, K = q2.shape
    Mp = ((M + tile - 1) // tile) * tile
    qp = jnp.full((Mp, K), sentinel, jnp.int32).at[:M].set(q2.astype(jnp.int32))
    steps = max(1, V.bit_length())  # V+1 candidate positions (0..V)

    out = pl.pallas_call(
        functools.partial(_lookup_kernel, V=V, steps=steps, sentinel=int(sentinel)),
        grid=(Mp // tile,),
        in_specs=[
            pl.BlockSpec((tile, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full key table resident
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full permutation
        ],
        out_specs=pl.BlockSpec((tile, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, K), jnp.int32),
        interpret=interpret,
    )(qp, sorted_keys.astype(jnp.int32), perm.astype(jnp.int32))
    return out[:M].reshape(shape)
