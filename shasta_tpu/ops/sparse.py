"""Sparse 3D convolution for TPU: gather -> matmul (MXU) -> fixed-shape sets.

Replaces the external spconv CUDA dependency used by the reference backbone
(det3d/models/backbones/scn.py:3-10, SubMConv3d/SparseConv3d). Design:

- A sparse tensor is a fixed-capacity set: features (V, C), coords (V, 4)
  int32 [b, z, y, x], and a validity count/mask. All shapes static.
- Voxel positions are encoded as int32 linear keys and kept sorted; neighbor
  lookup is a vectorized binary search (jnp.searchsorted) over the sorted
  keys — the TPU-native analogue of spconv's GPU hash tables.
- A KxKxK convolution is an im2col gather of neighbor features into
  (V, K^3*C_in) followed by ONE large matmul with the (K^3*C_in, C_out)
  kernel — shaped for the MXU instead of 27 scalar-indexed scatter-adds.
- Submanifold convs (stride 1) keep the input position set; strided convs
  compute the exact spconv output set (every position whose receptive field
  touches an active input) via masked candidate enumeration + fixed-shape
  dedup (sort + head-flag + compaction).

Invalid (padded) rows always carry the sentinel key INT32_MAX so they sort
last and never match a neighbor lookup.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

SENTINEL = jnp.iinfo(jnp.int32).max


class SparseTensor(NamedTuple):
    """Fixed-capacity sparse 3D tensor (batched)."""

    feats: jnp.ndarray  # (V, C) float
    coords: jnp.ndarray  # (V, 4) int32 [b, z, y, x]; arbitrary for invalid rows
    valid: jnp.ndarray  # (V,) bool
    shape: tuple[int, int, int]  # static (Z, Y, X) grid dims
    batch_size: int  # static

    @property
    def capacity(self) -> int:
        return self.feats.shape[0]


def encode_keys(coords: jnp.ndarray, valid: jnp.ndarray, shape, batch_size) -> jnp.ndarray:
    """Linear int32 keys; coords (V, 4) [b, z, y, x].

    Per-frame stride is Z*Y*X + 1: cell keys occupy [b*S, b*S + ZYX) and
    each frame owns one FILLER key b*S + ZYX that real queries can never
    hit. Invalid rows map to their frame's filler (their b is correct for
    frame-major packing; strided outputs set b = batch_size), so a packing
    of per-frame key-sorted frames is GLOBALLY ascending — that's what lets
    key_table_checked skip the argsort for any batch size."""
    Z, Y, X = shape
    cells = Z * Y * X
    stride = cells + 1
    assert (batch_size + 1) * stride < 2**31, "grid too large for int32 keys"
    b, z, y, x = coords[:, 0], coords[:, 1], coords[:, 2], coords[:, 3]
    cell = (z * Y + y) * X + x
    key = b * stride + cell
    filler = jnp.clip(b, 0, batch_size) * stride + cells
    return jnp.where(valid, key, filler)


def _sorted_lookup(sorted_keys: jnp.ndarray, perm: jnp.ndarray, query: jnp.ndarray,
                   use_pallas: bool = False, lanes: int = 1):
    """Find indices of query keys in the original array; miss -> capacity.

    sorted_keys: (V,) ascending with SENTINEL tail; perm: argsort indices.
    query may be any shape (all taps are looked up in ONE searchsorted
    call). Returns int32 in [0, V] where V means "not found" (zero row).
    use_pallas routes 2D per-tap-monotone queries through the windowed
    cursor-walk kernel (ops/pallas/window_conv.windowed_lookup — measured
    8x the XLA sort-based path on TPU v5e at stage-0 shapes; exact, with
    an automatic XLA fallback when a window overflows).
    """
    if use_pallas and query.ndim == 2:
        from .pallas.window_conv import windowed_lookup

        return windowed_lookup(sorted_keys, perm, query, lanes=lanes)
    V = sorted_keys.shape[0]
    # method='sort' replaces XLA's serial binary search (log2(V) rounds of
    # latency-bound HBM gathers — measured 414 ms for the stage-0 build on
    # TPU v5e) with one fused sort of [keys; queries] (~49 ms same shapes).
    pos = jnp.searchsorted(sorted_keys, query.reshape(-1), side="left", method="sort")
    pos = jnp.clip(pos, 0, V - 1)
    q = query.reshape(-1)
    found = (sorted_keys[pos] == q) & (q != SENTINEL)
    return jnp.where(found, perm[pos], V).astype(jnp.int32).reshape(query.shape)


class NeighborIndex(NamedTuple):
    """Precomputed gather indices for one position set & kernel geometry.

    gather: (V, K) int32 indices into the *input* feature rows, V_in meaning
    "no neighbor" (gathers a zero row). Shared by every conv with the same
    indice_key, like spconv's index caching (scn.py indice_key="res0"...).
    """

    gather: jnp.ndarray


class KeyTable(NamedTuple):
    """Sorted linear keys + permutation of one position set, shared by
    every index build over that set (one argsort instead of one per
    lookup)."""

    sorted_keys: jnp.ndarray  # (V,) ascending, SENTINEL tail
    perm: jnp.ndarray  # (V,) argsort indices


def key_table(st: SparseTensor) -> KeyTable:
    keys = encode_keys(st.coords, st.valid, st.shape, st.batch_size)
    perm = jnp.argsort(keys)
    return KeyTable(keys[perm], perm)


def key_table_presorted(st: SparseTensor) -> KeyTable:
    """KeyTable of a tensor whose rows are ALREADY key-sorted with invalid
    rows at the tail — true for every strided_conv output (the dedup
    compaction emits ascending keys) — skipping the argsort entirely."""
    keys = encode_keys(st.coords, st.valid, st.shape, st.batch_size)
    return KeyTable(keys, jnp.arange(st.capacity, dtype=jnp.int32))


def key_table_checked(st: SparseTensor) -> KeyTable:
    """Presorted fast path with a runtime guard: an O(V) monotonicity check
    selects between the free arange table and a real argsort (lax.cond —
    the sort only executes when the input is actually unsorted), so
    ShastaConfig.assume_sorted_voxels can never corrupt results."""
    keys = encode_keys(st.coords, st.valid, st.shape, st.batch_size)
    is_sorted = jnp.all(keys[1:] >= keys[:-1])
    arange = jnp.arange(st.capacity, dtype=jnp.int32)

    def fast(_):
        return KeyTable(keys, arange)

    def slow(_):
        perm = jnp.argsort(keys)
        return KeyTable(keys[perm], perm.astype(jnp.int32))

    return jax.lax.cond(is_sorted, fast, slow, None)


def build_subm_index(
    st: SparseTensor,
    kernel: Sequence[int] = (3, 3, 3),
    table: KeyTable | None = None,
    use_pallas: bool = False,
    lanes: int = 1,
) -> NeighborIndex:
    """Submanifold neighbor indices: output positions == input positions.

    lanes > 1 (Pallas path only) splits the lookups into per-lane kernels.
    The CALLER asserts the layout contract: rows are frame-major with a
    fixed per-frame capacity (lane b owns rows [b*V/lanes, (b+1)*V/lanes)),
    so each lane owns exactly V/lanes sorted key positions. True for every
    backbone-internal tensor; NOT for arbitrary SparseTensors.
    """
    kz, ky, kx = kernel
    pz, py, px = kz // 2, ky // 2, kx // 2
    Z, Y, X = st.shape
    sorted_keys, perm = table if table is not None else key_table(st)

    offsets = np.stack(
        np.meshgrid(
            np.arange(kz) - pz, np.arange(ky) - py, np.arange(kx) - px, indexing="ij"
        ),
        axis=-1,
    ).reshape(-1, 3)  # (K, 3) in (dz, dy, dx) raster order
    K = offsets.shape[0]

    b = st.coords[:, 0]
    zyx = st.coords[:, 1:4]
    n = zyx[:, None, :] + jnp.asarray(offsets, jnp.int32)[None, :, :]  # (V, K, 3)
    dims = jnp.asarray([Z, Y, X], jnp.int32)
    in_range = jnp.all((n >= 0) & (n < dims), axis=-1) & st.valid[:, None]
    cell = (n[..., 0] * Y + n[..., 1]) * X + n[..., 2]
    key = b[:, None] * (Z * Y * X + 1) + cell
    qk = jnp.where(in_range, key, SENTINEL)
    if use_pallas and kx == 3:
        # dx taps differ by exactly 1 in linear key: resolve all 27 from
        # the 9 (dz, dy) center lookups; the in_range mask kills phantom
        # matches where x+-1 wraps into a neighboring y-row's cell
        from .pallas.window_conv import windowed_lookup_triple

        out = windowed_lookup_triple(sorted_keys, perm, qk[:, 1::3],
                                     lanes=lanes)
        return NeighborIndex(
            gather=jnp.where(in_range, out, st.capacity).astype(jnp.int32)
        )
    return NeighborIndex(gather=_sorted_lookup(sorted_keys, perm, qk, use_pallas,
                                               lanes=lanes))  # (V, K)


def _gathered_matmul(feats, gather, weight, compute_dtype, use_pallas: bool,
                     window: int | None = None, nwin: int = 1,
                     lanes: int = 1, tile: int | None = None):
    """im2col core shared by subm/strided convs: (M, K) gather of table
    rows -> one (M, K*C) x (K*C, Co) MXU matmul. use_pallas routes through
    the windowed one-hot Pallas kernel (ops/pallas/window_conv — measured
    3.3x the XLA HBM gather on TPU v5e at stage-0 shapes; exact, with an
    automatic XLA fallback when a tile's window span overflows).
    Inference-only (no VJP defined for the Pallas path)."""
    M, K = gather.shape
    V, C = feats.shape
    dt = compute_dtype or feats.dtype
    if use_pallas:
        from .pallas.window_conv import windowed_gather_matmul

        return windowed_gather_matmul(feats, gather, weight,
                                      compute_dtype=compute_dtype,
                                      window=window, nwin=nwin, lanes=lanes,
                                      tile=tile)
    padded = jnp.concatenate([feats, jnp.zeros((1, C), feats.dtype)], axis=0)
    gathered = padded[gather]  # (M, K, C)
    return jax.lax.dot_general(
        gathered.reshape(M, K * C).astype(dt),
        weight.reshape(K * C, -1).astype(dt),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def build_subm_index_fused(
    st: SparseTensor,
    table: KeyTable,
    kernel: Sequence[int] = (3, 3, 3),
):
    """Fused-path replacement for build_subm_index: no lookup runs here —
    it returns the per-stage fused index (query keys, window bases,
    coverage flag) that subm_conv_apply feeds to a fused lookup-conv
    kernel. Built once per position set and shared by the stage's convs,
    like spconv's indice_key caching. Requires physically key-sorted rows
    (checked into the coverage flag).

    C_in <= 32 stages route to the block-extraction kernel
    (ops/pallas/block_conv.py — full-width MXU extraction); wider stages
    use the one-hot windowed kernel (ops/pallas/window_conv.py).
    """
    from .pallas.window_conv import FUSED_SUBM_KNOBS, build_fused_index

    kz, ky, kx = kernel
    assert kx == 3, "fused subm path assumes unit-spaced dx taps"
    pz, py, px = kz // 2, ky // 2, kx // 2
    Z, Y, X = st.shape
    offsets = np.stack(
        np.meshgrid(
            np.arange(kz) - pz, np.arange(ky) - py, np.arange(kx) - px,
            indexing="ij"),
        axis=-1,
    ).reshape(-1, 3)
    b = st.coords[:, 0]
    zyx = st.coords[:, 1:4]
    n = zyx[:, None, :] + jnp.asarray(offsets, jnp.int32)[None, :, :]
    dims = jnp.asarray([Z, Y, X], jnp.int32)
    in_range = jnp.all((n >= 0) & (n < dims), axis=-1) & st.valid[:, None]
    cell = (n[..., 0] * Y + n[..., 1]) * X + n[..., 2]
    key = b[:, None] * (Z * Y * X + 1) + cell
    qk = jnp.where(in_range, key, SENTINEL)
    # PHYSICAL row keys, not table.sorted_keys: the fused kernels slice
    # feature rows by table position, so the monotone check inside the
    # index build must validate the physical row order itself
    # (a permuted-but-sorted KeyTable would pass otherwise)
    phys = encode_keys(st.coords, st.valid, st.shape, st.batch_size)
    # NOTE (round 5): an in-graph key-compare block-extraction variant
    # (build_block_index) was measured 10x SLOWER than this kernel on v5e
    # (31 ms/conv at s0 — narrow-lane Mosaic ops cost ~50 cycles each;
    # tools/probe_block_conv.py, PERF_NOTES). The winning block kernel
    # takes HOST-precomputed positions instead — see ops/pallas/
    # block_conv.pos_conv_apply and shasta_tpu/plans.py; it is engaged by
    # passing host plans to the backbone, not through this builder.
    tile, W = FUSED_SUBM_KNOBS.get(st.feats.shape[1], (128, 288))
    return build_fused_index(phys, qk, tile=tile, window=W,
                             nwin=1, triple=True)


def subm_conv_apply(
    st: SparseTensor,
    index,  # NeighborIndex | window_conv.FusedIndex
    weight: jnp.ndarray,  # (K, C_in, C_out)
    bias: jnp.ndarray | None = None,
    compute_dtype=None,
    use_pallas: bool = False,
    lanes: int = 1,
) -> SparseTensor:
    """Apply a submanifold conv given precomputed neighbor indices.

    compute_dtype=jnp.bfloat16 runs the im2col matmul on the MXU in bf16
    with f32 accumulation (the free TPU win; SURVEY §2.8 mixed precision).
    A FusedIndex/BlockIndex routes through a fused lookup-conv kernel
    instead of gather indices (see build_subm_index_fused).
    """
    from .pallas.block_conv import PosIndex, pos_conv_apply
    from .pallas.window_conv import FusedIndex, fused_conv_apply

    if isinstance(index, PosIndex):
        out = pos_conv_apply(st.feats, index, weight,
                             compute_dtype=compute_dtype,
                             m_out=st.capacity)
    elif isinstance(index, FusedIndex):
        out = fused_conv_apply(st.feats, index, weight,
                               compute_dtype=compute_dtype, nwin=1,
                               triple=True, m_out=st.capacity)
    else:
        out = _gathered_matmul(st.feats, index.gather, weight, compute_dtype,
                               use_pallas, lanes=lanes)
    if bias is not None:
        out = out + bias
    out = jnp.where(st.valid[:, None], out, 0.0)
    return st._replace(feats=out)


class StridedPlan(NamedTuple):
    """Output position set + gather indices for one strided sparse conv."""

    coords: jnp.ndarray  # (V_out, 4)
    valid: jnp.ndarray  # (V_out,)
    gather: jnp.ndarray  # (V_out, K) indices into input rows (V_in = miss)
    out_shape: tuple[int, int, int]


def build_strided_plan(
    st: SparseTensor,
    kernel: Sequence[int],
    stride: Sequence[int],
    padding: Sequence[int],
    max_out: int,
    table: KeyTable | None = None,
    use_pallas: bool = False,
    lanes: int = 1,
    fused: bool = False,
    knobs: tuple[int, int, int] = (256, 512, 2),
) -> StridedPlan:
    """Exact spconv output set for SparseConv3d (scn.py conv2/3/4/extra).

    An output position o is active iff some active input lies at
    in = o*s + k - p for a kernel tap k. We enumerate, per input voxel, all
    K candidate outputs o = (in + p - k)/s (masked to integral, in-range),
    dedupe via sort, and compact into a fixed (max_out,) set. The emitted
    set is KEY-SORTED (ascending, SENTINEL tail), so downstream index
    builds can use key_table_presorted.
    """
    kz, ky, kx = kernel
    sz, sy, sx = stride
    pz, py, px = padding
    Z, Y, X = st.shape
    OZ = (Z + 2 * pz - kz) // sz + 1
    OY = (Y + 2 * py - ky) // sy + 1
    OX = (X + 2 * px - kx) // sx + 1
    out_shape = (OZ, OY, OX)

    b = st.coords[:, 0]
    zyx = st.coords[:, 1:4]
    strides = jnp.asarray([sz, sy, sx], jnp.int32)
    pads = jnp.asarray([pz, py, px], jnp.int32)
    out_dims = jnp.asarray(out_shape, jnp.int32)

    # Parity-restricted candidate outputs: for axis stride s and kernel K_a,
    # the taps with (in + p - k) % s == 0 are k = (in+p)%s + i*s for
    # i < ceil(K_a/s) — at most ceil(K/s)^3 candidates per input instead of
    # K^3 (8 vs 27 for the stride-2 stages), which shrinks the dedup sort.
    counts = [int(np.ceil(k / s)) for k, s in ((kz, sz), (ky, sy), (kx, sx))]
    kdims = (kz, ky, kx)
    i_grid = np.stack(
        np.meshgrid(*[np.arange(c) for c in counts], indexing="ij"), axis=-1
    ).reshape(-1, 3)  # (C, 3) static per-axis multiples
    C = i_grid.shape[0]

    r = (zyx + pads) % strides  # (V, 3) runtime residues
    taps = r[:, None, :] + jnp.asarray(i_grid, jnp.int32) * strides  # (V, C, 3)
    o = (zyx[:, None, :] + pads - taps) // strides
    ok = (
        jnp.all(taps < jnp.asarray(kdims, jnp.int32), axis=-1)
        & jnp.all(o >= 0, axis=-1)
        & jnp.all(o < out_dims, axis=-1)
        & st.valid[:, None]
    )
    OZ_, OY_, OX_ = out_shape
    s_out = OZ_ * OY_ * OX_ + 1  # per-frame key stride incl. filler slot
    cell_out = (o[..., 0] * OY_ + o[..., 1]) * OX_ + o[..., 2]
    cand = b[:, None] * s_out + cell_out
    cand = jnp.where(ok, cand, SENTINEL).reshape(-1)  # (V*C,)

    # lane_slots > 1: compact into PER-LANE fixed chunks of max_out//B
    # instead of one global front-packed set. Keeps every lane's rows at a
    # static offset, which is what lets the Pallas kernels run one
    # VMEM-resident table per lane at multi-frame batch sizes (the global
    # layout has dynamic lane boundaries). The emitted keys stay globally
    # ascending (lane-major chunks, each sorted, fillers between lanes),
    # so key_table_presorted still applies. Per-frame slot budgets also
    # isolate a dense frame's truncation from its batch peers.
    lane_slots = (
        lanes
        if use_pallas and lanes > 1 and max_out % lanes == 0
        else 1
    )
    s = jnp.sort(cand)
    head = (s != jnp.concatenate([jnp.full((1,), -1, s.dtype), s[:-1]])) & (s != SENTINEL)
    VC = s.shape[0]

    # The compaction lookup keeps the widened (VC,) count table
    # VMEM-resident (identity perm -> keys only, ~12 B/row); gate on the
    # residency budget and fall back to the scatter compaction beyond it.
    # Positions must also stay f32-exact in the kernel (< 2^24).
    compact_ok = use_pallas and VC * 12 <= 64 * 1024 * 1024 and VC < 2**24

    def _lookup_compact(queries):
        """Scatter-free compaction (Pallas path): slot j's key is the
        first candidate position where cumsum(head) == queries[j]. The
        cumsum is monotone and so are the slot queries, so the windowed
        cursor-walk kernel resolves all slots with the whole (VC,) count
        table VMEM-resident — replacing a VC-sized HBM scatter with a
        max_out-query kernel + a max_out-row gather."""
        from .pallas.window_conv import windowed_lookup

        ch_ = jnp.cumsum(head.astype(jnp.int32))
        pos = windowed_lookup(
            ch_, jnp.arange(VC, dtype=jnp.int32), queries[:, None],
            identity_perm=True,
        )[:, 0]
        found = pos < VC
        return jnp.where(found, s[jnp.minimum(pos, VC - 1)], SENTINEL)

    if lane_slots > 1:
        from .pallas.window_conv import report_coverage_flag

        B = st.batch_size
        cap_lane = max_out // B
        ch = jnp.cumsum(head)
        # first sorted position of each lane's key range -> unique count
        # before the lane (lane b's keys live in [b*s_out, (b+1)*s_out))
        bnd = jnp.searchsorted(s, jnp.arange(B, dtype=s.dtype) * s_out,
                               side="left")
        bases = jnp.where(bnd > 0, ch[jnp.maximum(bnd - 1, 0)], 0)
        ends = jnp.concatenate([bases[1:], ch[-1:]])
        # Per-lane slot budgets truncate each frame independently; WHICH
        # voxels survive then differs from the global front-packed layout
        # the XLA path uses. Surface binding caps through the coverage-flag
        # sink as a SOFT (documented-divergence) flag — the per-lane result
        # is a correct Pallas computation under the per-lane semantics, it
        # just differs from the global-layout safe path, exactly like the
        # truncation the B=1 path performs silently. Serving replays scenes
        # via coverage_ok_strict for bit-consistency with the XLA path;
        # benchmarks (equal cost either way) gate on the hard flags alone.
        # (Round-3 bug: this was reported as a hard flag, which made the
        # lanes-4 bench fall back to B=1 whenever the cap bound — i.e. on
        # every dense frame — despite B=1 binding the same cap unflagged.)
        report_coverage_flag(jnp.all(ends - bases <= cap_lane), soft=True)
        slot_lane = (jnp.arange(max_out, dtype=jnp.int32) // cap_lane)
        if compact_ok:
            # per-lane slot queries: lane b's j-th unique is global unique
            # bases[b] + j, valid while it stays inside the lane's range
            j_in = jnp.arange(max_out, dtype=jnp.int32) % cap_lane
            uq = bases[slot_lane].astype(jnp.int32) + j_in
            q = jnp.where(uq < ends[slot_lane].astype(jnp.int32),
                          uq + 1, SENTINEL)
            out_keys = _lookup_compact(q)
        else:
            lane = jnp.clip(s // s_out, 0, B - 1)
            lane_pos = (ch - 1) - bases[lane]
            write = head & (lane_pos < cap_lane)
            target = lane * cap_lane + lane_pos
            out_keys = jnp.full((max_out,), SENTINEL, jnp.int32)
            out_keys = out_keys.at[jnp.where(write, target, max_out)].set(
                jnp.where(write, s, SENTINEL), mode="drop"
            )
        out_valid = out_keys != SENTINEL
    else:
        slot_lane = jnp.full((max_out,), st.batch_size, jnp.int32)
        if compact_ok:
            out_keys = _lookup_compact(
                jnp.arange(1, max_out + 1, dtype=jnp.int32)
            )
        else:
            pos = jnp.cumsum(head) - 1
            out_keys = jnp.full((max_out,), SENTINEL, jnp.int32)
            write = head & (pos < max_out)
            out_keys = out_keys.at[jnp.where(write, pos, max_out)].set(
                jnp.where(write, s, SENTINEL), mode="drop"
            )
        out_valid = out_keys != SENTINEL

    # Decode output coords from keys; an invalid row's b becomes its
    # lane's id (per-lane layout: its lane filler keeps the chunk sorted)
    # or batch_size (global layout: fillers sort after every frame).
    k = jnp.where(out_valid, out_keys, 0)
    rem = k % s_out
    ox = rem % OX
    rem = rem // OX
    oy = rem % OY
    oz = rem // OY
    ob = jnp.where(out_valid, k // s_out, slot_lane)
    out_coords = jnp.stack(
        [ob, jnp.where(out_valid, oz, 0), jnp.where(out_valid, oy, 0),
         jnp.where(out_valid, ox, 0)],
        axis=1,
    ).astype(jnp.int32)

    # Gather indices: input at in = o*s + k - p for each tap (one batched
    # searchsorted over all K taps).
    sorted_in, perm = table if table is not None else key_table(st)
    offsets = np.stack(
        np.meshgrid(np.arange(kz), np.arange(ky), np.arange(kx), indexing="ij"),
        axis=-1,
    ).reshape(-1, 3)
    ic = out_coords[:, None, 1:4] * strides + jnp.asarray(offsets, jnp.int32) - pads
    dims = jnp.asarray([Z, Y, X], jnp.int32)
    in_range = jnp.all((ic >= 0) & (ic < dims), axis=-1) & out_valid[:, None]
    cell_in = (ic[..., 0] * Y + ic[..., 1]) * X + ic[..., 2]
    qk = out_coords[:, :1] * (Z * Y * X + 1) + cell_in
    qk = jnp.where(in_range, qk, SENTINEL)
    if fused and use_pallas and lane_slots == 1:
        # fused lookup-conv: skip the gather lookup entirely — the plan
        # carries a fused index (query keys + window bases) and
        # strided_conv_apply resolves matches inside the conv kernel.
        # C_in <= 32 with unit-spaced dx taps routes to the
        # block-extraction kernel (ops/pallas/block_conv.py); wider
        # stages use the one-hot windowed kernel (window_conv.py) with
        # knobs = (tile, window, nwin) matching the apply call.
        tile_k, W_k, nwin_k = knobs
        # physical input-row keys (see build_subm_index_fused): validates
        # that st's rows really are in key order, not just the KeyTable
        phys = encode_keys(st.coords, st.valid, st.shape, st.batch_size)
        from .pallas.window_conv import build_fused_index

        findex = build_fused_index(phys, qk, tile=tile_k, window=W_k,
                                   nwin=nwin_k, triple=(kx == 3))
        return StridedPlan(out_coords, out_valid, findex, out_shape)
    if use_pallas and kx == 3:
        # kx taps differ by exactly 1 in linear input key (see
        # build_subm_index): 9 center lookups resolve all 27
        from .pallas.window_conv import windowed_lookup_triple

        out = windowed_lookup_triple(sorted_in, perm, qk[:, 1::3],
                                     lanes=lane_slots)
        gather = jnp.where(in_range, out, st.capacity).astype(jnp.int32)
    else:
        gather = _sorted_lookup(sorted_in, perm, qk, use_pallas,
                                lanes=lane_slots)  # (V_out, K)
    return StridedPlan(out_coords, out_valid, gather, out_shape)


def decode_strided_keys(out_keys: jnp.ndarray, in_shape, kernel, stride,
                        padding, batch_size: int):
    """(max_out,) ascending keys (SENTINEL pads) -> (coords (max_out,4),
    valid, out_shape). Mirrors the decode inside build_strided_plan;
    invalid rows get b = batch_size so frame-major packing stays sorted."""
    kz, ky, kx = kernel
    sz, sy, sx = stride
    pz, py, px = padding
    Z, Y, X = in_shape
    OZ = (Z + 2 * pz - kz) // sz + 1
    OY = (Y + 2 * py - ky) // sy + 1
    OX = (X + 2 * px - kx) // sx + 1
    s_out = OZ * OY * OX + 1
    valid = out_keys != SENTINEL
    k = jnp.where(valid, out_keys, 0)
    rem = k % s_out
    ox = rem % OX
    rem = rem // OX
    oy = rem % OY
    oz = rem // OY
    ob = jnp.where(valid, k // s_out, batch_size)
    coords = jnp.stack(
        [ob, jnp.where(valid, oz, 0), jnp.where(valid, oy, 0),
         jnp.where(valid, ox, 0)], axis=1,
    ).astype(jnp.int32)
    return coords, valid, (OZ, OY, OX)


def strided_plan_from_keys(
    st: SparseTensor,
    out_keys: jnp.ndarray,  # (max_out,) int32 ascending, SENTINEL pads
    kernel: Sequence[int],
    stride: Sequence[int],
    padding: Sequence[int],
    table: KeyTable | None = None,
    use_pallas: bool = False,
    fused: bool = False,
    knobs: tuple[int, int, int] = (256, 512, 2),
) -> StridedPlan:
    """build_strided_plan with a HOST-provided output set: skips the
    candidate enumeration + dedup sort (the expensive device pieces —
    hoisted into shasta_tpu/plans.strided_output_keys, which mirrors the
    same math bit-for-bit), keeping only the coord decode and the gather
    index build on device."""
    kz, ky, kx = kernel
    sz, sy, sx = stride
    pz, py, px = padding
    Z, Y, X = st.shape
    OZ = (Z + 2 * pz - kz) // sz + 1
    OY = (Y + 2 * py - ky) // sy + 1
    OX = (X + 2 * px - kx) // sx + 1
    out_shape = (OZ, OY, OX)
    s_out = OZ * OY * OX + 1
    out_valid = out_keys != SENTINEL
    k = jnp.where(out_valid, out_keys, 0)
    rem = k % s_out
    ox = rem % OX
    rem = rem // OX
    oy = rem % OY
    oz = rem // OY
    ob = jnp.where(out_valid, k // s_out, st.batch_size)
    out_coords = jnp.stack(
        [ob, jnp.where(out_valid, oz, 0), jnp.where(out_valid, oy, 0),
         jnp.where(out_valid, ox, 0)], axis=1,
    ).astype(jnp.int32)

    strides = jnp.asarray([sz, sy, sx], jnp.int32)
    pads = jnp.asarray([pz, py, px], jnp.int32)
    sorted_in, perm = table if table is not None else key_table(st)
    offsets = np.stack(
        np.meshgrid(np.arange(kz), np.arange(ky), np.arange(kx), indexing="ij"),
        axis=-1,
    ).reshape(-1, 3)
    ic = out_coords[:, None, 1:4] * strides + jnp.asarray(offsets, jnp.int32) - pads
    dims = jnp.asarray([Z, Y, X], jnp.int32)
    in_range = jnp.all((ic >= 0) & (ic < dims), axis=-1) & out_valid[:, None]
    cell_in = (ic[..., 0] * Y + ic[..., 1]) * X + ic[..., 2]
    qk = out_coords[:, :1] * (Z * Y * X + 1) + cell_in
    qk = jnp.where(in_range, qk, SENTINEL)
    if fused and use_pallas:
        from .pallas.window_conv import build_fused_index

        tile_k, W_k, nwin_k = knobs
        phys = encode_keys(st.coords, st.valid, st.shape, st.batch_size)
        findex = build_fused_index(phys, qk, tile=tile_k, window=W_k,
                                   nwin=nwin_k, triple=(kx == 3))
        return StridedPlan(out_coords, out_valid, findex, out_shape)
    if use_pallas and kx == 3:
        from .pallas.window_conv import windowed_lookup_triple

        out = windowed_lookup_triple(sorted_in, perm, qk[:, 1::3])
        gather = jnp.where(in_range, out, st.capacity).astype(jnp.int32)
    else:
        gather = _sorted_lookup(sorted_in, perm, qk, use_pallas)
    return StridedPlan(out_coords, out_valid, gather, out_shape)


def strided_conv_apply(
    st: SparseTensor,
    plan: StridedPlan,
    weight: jnp.ndarray,  # (K, C_in, C_out)
    bias: jnp.ndarray | None = None,
    compute_dtype=None,
    use_pallas: bool = False,
    lanes: int = 1,
    knobs: tuple[int, int, int] = (256, 512, 2),
) -> SparseTensor:
    # knobs = (tile, window, nwin) for the Pallas kernel. The default
    # suits the worst case (conv2): tiles that straddle a z-plane boundary
    # see BIMODAL gather positions ~an input plane apart (span ~2750 rows),
    # so an adaptive second window (nwin=2) covers the far cluster. The
    # later strided stages measure UNIMODAL within one window
    # (tools/measure_spans.py: c3 span 201, c4 398, extra 255 at tile 256)
    # and pass nwin=1 from the backbone; the coverage check still guards
    # exactness either way.
    from .pallas.block_conv import PosIndex, pos_conv_apply
    from .pallas.window_conv import FusedIndex, fused_conv_apply

    tile, window, nwin = knobs
    if isinstance(plan.gather, PosIndex):
        out = pos_conv_apply(
            st.feats, plan.gather, weight, compute_dtype=compute_dtype,
            m_out=plan.valid.shape[0])
    elif isinstance(plan.gather, FusedIndex):
        K = plan.gather.queries.shape[1]
        G = plan.gather.bases.shape[1] // nwin
        out = fused_conv_apply(
            st.feats, plan.gather, weight, compute_dtype=compute_dtype,
            nwin=nwin, triple=(K == 3 * G), m_out=plan.valid.shape[0])
    else:
        out = _gathered_matmul(st.feats, plan.gather, weight, compute_dtype,
                               use_pallas, window=window, nwin=nwin,
                               lanes=lanes, tile=tile)
    if bias is not None:
        out = out + bias
    out = jnp.where(plan.valid[:, None], out, 0.0)
    return SparseTensor(
        feats=out,
        coords=plan.coords,
        valid=plan.valid,
        shape=plan.out_shape,
        batch_size=st.batch_size,
    )


def to_dense(st: SparseTensor) -> jnp.ndarray:
    """Scatter to dense (B, Z, Y, X, C) (spconv .dense(), scn.py:196)."""
    Z, Y, X = st.shape
    C = st.feats.shape[1]
    dense = jnp.zeros((st.batch_size, Z, Y, X, C), st.feats.dtype)
    b, z, y, x = (st.coords[:, i] for i in range(4))
    b = jnp.where(st.valid, b, st.batch_size)  # drop invalid rows
    return dense.at[b, z, y, x].set(st.feats, mode="drop")


def masked_batch_norm(
    feats: jnp.ndarray,
    valid: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    mean: jnp.ndarray,
    var: jnp.ndarray,
    eps: float = 1e-3,
) -> jnp.ndarray:
    """BatchNorm1d inference transform over valid voxel rows (scn.py BN1d)."""
    inv = scale * jax.lax.rsqrt(var + eps)
    out = (feats - mean) * inv + bias
    return jnp.where(valid[:, None], out, 0.0)


def masked_batch_stats(feats: jnp.ndarray, valid: jnp.ndarray, axis_name: str | None = None):
    """Batch mean/var over valid rows; psum across `axis_name` if given
    (the TPU equivalent of apex SyncBN, train.py:155)."""
    m = valid.astype(feats.dtype)[:, None]
    cnt = jnp.sum(m)
    s = jnp.sum(feats * m, axis=0)
    sq = jnp.sum(feats * feats * m, axis=0)
    if axis_name is not None:
        cnt = jax.lax.psum(cnt, axis_name)
        s = jax.lax.psum(s, axis_name)
        sq = jax.lax.psum(sq, axis_name)
    cnt = jnp.maximum(cnt, 1.0)
    mean = s / cnt
    var = sq / cnt - mean * mean
    return mean, var
