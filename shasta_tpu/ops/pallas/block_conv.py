"""Position-fed block-extraction sparse conv: full-width MXU extraction
driven by HOST-precomputed neighbor positions (C_in <= 32 stages).

Round-5 kernel history (tools/probe_block_conv.py, PERF_NOTES):
- The one-hot windowed kernel (window_conv.py) spends its time in
  `(tile, W) @ (W, C<=32)` extraction matmuls that fill only C of the
  MXU's 128 output lanes — cost model b*V*W, knob-tuning exhausted at
  ~2.9 ms/conv for stage 0 (V=120k).
- A first block-extraction variant matched keys IN-kernel (guard-compare
  block find + extracted key quarters + per-block selects). Exact, but
  10x SLOWER on v5e (31 ms/conv): every narrow (tile, <128-lane) Mosaic
  op (quarter compares, per-block where/add chains) costs ~50 cycles of
  relayout. Probe attribution: extraction core 0.66 ms, key check
  +12 ms, select chain +9 ms.
- This kernel keeps the fast extraction core and replaces ALL in-kernel
  matching with integer arithmetic on HOST-precomputed positions
  (shasta_tpu/plans.py): the neighbor row of a query is a pure function
  of voxel coordinates, which the host holds before upload anyway.
  Every op is either a full-width MXU matmul or a (tile, 128)-wide VPU
  op; per (tile, tap-group) cost is NWIN+3 MXU passes.

Layout:
- Features are packed into overlapping PAIR-BLOCKS of 2H rows
  (H = 64 // C): `F2[m] = feats[m*H : m*H + 2*H]` flattened to exactly
  2*H*C = 128 lanes (also removing the (128/C)x VMEM vreg padding of a
  raw (V, C) table).
- Per (row, tap-group) the host packs ONE uint16 word (PosWord):
    bits [0, 9)   rel   — j0 - window_base_row, j0 = searchsorted(
                          keys, center_key - 1) (window-relative)
    bit 9         pres_m1 — key j0 holds center_key - 1 (presence, used
                          for position offsets even when range-masked)
    bit 10        pres_0  — key j0+pres_m1 holds center_key
    bits 11,12,13 valid_m1/0/p1 — tap contributes (presence AND the
                          stencil tap is in-range)
    bit 14        wsel  — which of the tile-group's NWIN windows holds
                          this row's block (bimodal strided tiles)
  The dx in {-1,0,+1} taps of a 3x3x3 stencil are unit-spaced in linear
  key, so their matches occupy consecutive table rows starting at j0 —
  all inside j0's pair-block (H >= 2) — and one word serves all three.
- Per (tile, group, window) the host provides a window base row in
  GB-block granules; the kernel slices F2 there (aligned, provable).

Exactness: positions are exact host searchsorted results; the host
planner also performs the window-fit check BEFORE upload (plans.ok), so
the device program needs no coverage flags or fallback branches for
plan-backed stages. The planner and this kernel share the block
geometry via `block_geometry`.

Replaces (TPU-natively) the spconv gather/rulebook machinery the
reference uses for SubMConv3d/SparseConv3d (det3d/models/backbones/
scn.py:99-211 via spconv CUDA kernels), with the rulebook build moved
to host prefetch — the TPU analogue of spconv's GPU rulebook phase.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GB = 16  # window-base granule, in pair-block units (>= bf16 sublane align)
# Output rows per grid step. 256 measured 11% faster than 128 at s0 on
# v5e (per-tile fixed costs halve; the 512-row window still covers the
# wider per-tile spread on every probed frame — a frame that doesn't fit
# flags plans.ok=False and serves through the safe program instead).
BLOCK_TILE = 256

# Per padded-channel-count: (H rows per half-block, NBWL window lanes).
# Window covers NBWL pair-blocks = NBWL*H table rows (512 for both
# entries); rel must fit 9 bits => NBWL*H <= 512.
BLOCK_KNOBS = {16: (4, 128), 32: (2, 256)}

# PosWord bit layout (shared with shasta_tpu/plans.py)
REL_BITS = 9
B_PRES_M1 = 9
B_PRES_0 = 10
B_VALID_M1 = 11
B_VALID_0 = 12
B_VALID_P1 = 13
B_WSEL = 14


def pad_channels(C: int) -> int:
    """Smallest supported packed channel count >= C (conv_input's C_in=5
    runs as 16 with zero-padded lanes)."""
    for c in (16, 32):
        if C <= c:
            return c
    raise ValueError(f"block conv supports C_in <= 32, got {C}")


def block_geometry(V: int, C: int):
    """Shared host/device block geometry for a table of V rows.

    Returns (Cp, H, NBWL, NBr, NBP): padded channels, half-block rows,
    window lanes, granule-row count, padded pair-block count."""
    Cp = pad_channels(C)
    H, NBWL = BLOCK_KNOBS[Cp]
    NB_real = -(-V // H)
    NBr = max(1, -(-NB_real // GB))
    NBP = (NBr - 1) * GB + NBWL
    return Cp, H, NBWL, NBr, NBP


class PosIndex(NamedTuple):
    """Host-built per-position-set conv plan (one per stage geometry,
    shared by every conv over that position set — the spconv indice_key
    analogue, built in host prefetch instead of on device)."""

    pos: jnp.ndarray  # (Mp, G) uint16 PosWords
    bases: jnp.ndarray  # (T, NWIN*G) int32 window granule rows


def _pos_conv_kernel(pos_ref, base_ref, f2_ref, w_ref, out_ref, *,
                     NWIN: int, H: int, C: int, NBWL: int):
    """grid (T,). pos_ref (tile, G) int32 PosWords (pre-cast); base_ref
    (T, NWIN*G) SMEM granule rows; f2 (NBP, 128) pair-block features
    (lane j*C + c); w_ref (G, 3, 128, Co) per-(group, dx) weights tiled
    over the 2H block rows. out (tile, Co) f32.

    All compute is (tile, >=128)-wide VPU ops or full-width MXU matmuls
    (narrow-lane ops cost ~50 cycles each in Mosaic — measured)."""
    tile, G = pos_ref.shape
    dt = f2_ref.dtype
    t = pl.program_id(0)
    lane_b = jax.lax.broadcasted_iota(jnp.int32, (tile, NBWL), 1)
    lane_j = jax.lax.broadcasted_iota(jnp.int32, (tile, 128), 1) // C
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for g in range(G):
        v = pos_ref[:, g]
        rel = v & ((1 << REL_BITS) - 1)
        blk = rel // H
        rloc = rel - blk * H
        pm1 = (v >> B_PRES_M1) & 1
        p0 = (v >> B_PRES_0) & 1
        oh_i = (lane_b == blk[:, None])
        if NWIN == 2:
            ws = (v >> B_WSEL) & 1
            r1 = base_ref[t, 2 * g]
            r2 = base_ref[t, 2 * g + 1]
            f2w1 = f2_ref[pl.ds(pl.multiple_of(r1 * GB, GB), NBWL), :]
            f2w2 = f2_ref[pl.ds(pl.multiple_of(r2 * GB, GB), NBWL), :]
            oh1 = (oh_i & (ws == 0)[:, None]).astype(dt)
            oh2 = (oh_i & (ws == 1)[:, None]).astype(dt)
            afeat = jax.lax.dot_general(
                oh1, f2w1, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + jax.lax.dot_general(
                oh2, f2w2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            r = base_ref[t, g]
            f2w = f2_ref[pl.ds(pl.multiple_of(r * GB, GB), NBWL), :]
            afeat = jax.lax.dot_general(
                oh_i.astype(dt), f2w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (tile, 128)
        pos_d = (rloc, rloc + pm1, rloc + pm1 + p0)
        for d in range(3):
            hd = (v >> (B_VALID_M1 + d)) & 1
            # fold validity into the (tile,) position scalar (1-vreg op)
            # so the lane compare is the ONLY wide op per tap: invalid
            # taps point at lane-block 99 (> 2H-1), matching nothing
            px = jnp.where(hd > 0, pos_d[d], 99)
            sel = lane_j == px[:, None]
            md = jnp.where(sel, afeat, 0.0).astype(dt)
            acc = acc + jax.lax.dot_general(
                md, w_ref[g, d], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    out_ref[:] = acc


@functools.partial(jax.jit,
                   static_argnames=("NWIN", "H", "C", "NBWL", "interpret",
                                    "tile"))
def _pos_conv_call(pos, bases, f2, w_g, NWIN: int, H: int, C: int,
                   NBWL: int, interpret: bool, tile: int):
    Mp, G = pos.shape
    Co = w_g.shape[3]
    T = Mp // tile
    return pl.pallas_call(
        functools.partial(_pos_conv_kernel, NWIN=NWIN, H=H, C=C, NBWL=NBWL),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((tile, G), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, Co), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Co), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(pos, bases, f2, w_g)


def pack_table(feats: jnp.ndarray, compute_dtype=None) -> jnp.ndarray:
    """(V, C) physically key-sorted features -> (NBP, 128) pair-block
    table (lane j*Cp + c). Pure slices/reshapes — XLA-cheap per conv."""
    V, C = feats.shape
    Cp, H, _, _, NBP = block_geometry(V, C)
    dt = compute_dtype or feats.dtype
    fp = jnp.zeros((NBP * H + H, Cp), dt).at[:V, :C].set(feats.astype(dt))
    return jnp.concatenate([
        fp[: NBP * H].reshape(NBP, H * Cp),
        fp[H: NBP * H + H].reshape(NBP, H * Cp),
    ], axis=1)


def pos_conv_apply(feats: jnp.ndarray, pidx: PosIndex, weight: jnp.ndarray,
                   *, compute_dtype=None, interpret: bool | None = None,
                   m_out: int | None = None) -> jnp.ndarray:
    """Apply one conv through the position-fed block kernel.

    feats (V, C) PHYSICALLY key-sorted rows in the exact order the host
    planner saw (the planner validated the sort and the window fit —
    plans.ok — so no runtime fallback exists on this path); weight
    (K, C, Co) with K = 3G in (dz, dy, dx) raster order, unit-spaced dx.
    Returns (M, Co) f32."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    V, C = feats.shape
    Mp, G = pidx.pos.shape
    M = m_out if m_out is not None else Mp
    K, _, Co = weight.shape
    assert K == 3 * G, (K, G)
    Cp, H, NBWL, _, _ = block_geometry(V, C)
    tile = Mp // pidx.bases.shape[0]
    nwin = pidx.bases.shape[1] // G
    dt = compute_dtype or feats.dtype

    f2 = pack_table(feats, dt)
    # (G, 3, 128, Co): weight row for lane j*Cp+c is w[3g+d, c] (tiled
    # over the 2H block rows); padded channels get zero rows
    wp = jnp.zeros((K, Cp, Co), dt).at[:, :C].set(weight.astype(dt))
    w_g = jnp.tile(wp.reshape(G, 3, 1, Cp, Co),
                   (1, 1, 2 * H, 1, 1)).reshape(G, 3, 128, Co)
    out = _pos_conv_call(pidx.pos.astype(jnp.int32), pidx.bases, f2, w_g,
                         NWIN=nwin, H=H, C=Cp, NBWL=NBWL,
                         interpret=bool(interpret), tile=tile)
    return out[:M]
