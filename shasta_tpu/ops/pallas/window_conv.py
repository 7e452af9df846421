"""Pallas TPU kernels for the sparse-conv hot path: windowed one-hot
gather-conv and a cursor-walk sorted lookup.

Replaces the two slowest XLA ops in the backbone (the spconv substitute
for det3d/models/backbones/scn.py), as measured on TPU v5e:

- `jnp.searchsorted` (even method='sort'): 49 ms for one stage-0 neighbor
  build (120k x 27 queries) — sort/scatter dominated.
- the (M, K)-row HBM gather feeding the im2col matmul: ~5.7 ns/row
  latency-bound (17 ms per stage-0 subm conv).

Both kernels exploit the backbone's sorted-table invariant: feature/key
tables are ascending by linear voxel key, and each tap's query keys are
the table keys plus a constant offset — so queries are monotone per tap
and any 128 consecutive outputs touch one narrow contiguous WINDOW of
the table. The whole per-stage table fits in VMEM (<= 8 MB), so:

- `windowed_lookup`: the key table stays VMEM-resident; a per-tap SMEM
  cursor walks forward across output tiles (TPU grid steps run in
  order), and each tile's positions are computed with a (128, W)
  compare+reduce against a dynamically sliced window — no HBM gather,
  no sort. Misses return V like the XLA path.
- `windowed_gather_matmul`: the feature table stays VMEM-resident; each
  tile slices a (W, C) window per tap with `pl.ds` and extracts rows as
  a ONE-HOT MATMUL on the MXU, composed with the conv weight matmul.

Correctness never depends on the invariant: the lookup kernel emits
per-tile overflow flags (query outside its window — e.g. an unsorted
table) and the conv wrapper computes window spans in plain vector math;
either triggers a lax.cond fallback to the exact XLA path.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SENTINEL = jnp.iinfo(jnp.int32).max
TILE = 128  # output rows per grid step
W_CONV = 256  # feature window per tile
# Submanifold-conv (tile, W) per input-channel count, measured on v5e
# (tools/probe_conv.py): per-(tile, tap) fixed costs — window slice set-up
# and matmul pipelining — dominate over the (tile, W) one-hot compare, so
# LARGE tiles win (tile 256 is ~30-40% faster than 128 at every stage).
# W is the smallest 128-multiple covering the stage's measured span at
# that tile plus one band of headroom where the margin was thin
# (tools/measure_spans.py; spans at tile 256: s0 255, s1 487, s2 298,
# s3 294). Lane granularity is 128, so sub-128 W steps change nothing.
# LEGACY windowed-gather kernel (tile, W) per channel count, used by
# windowed_gather_matmul's default (the B>1/lanes batch path). ADVICE r4
# medium: split from the fused kernel's knobs (FUSED_SUBM_KNOBS below)
# so retunes of one kernel can't silently resize the other's windows.
# Values: the round-4 tile-128 set — restoring the round-3 tile-256
# values here segfaults XLA:CPU compiling the lane-split lax.cond at the
# test shapes (round-5 full-suite run), and the 30-40% tile-256 win was
# never re-measured for this kernel on the current code; re-measure on
# chip (tools/probe_conv.py --round2) before changing.
SUBM_KNOBS = {16: (128, 288), 32: (128, 384), 64: (128, 256),
              128: (128, 256)}
# Fused lookup-conv kernel (tile, window) per channel count. Windows are
# the per-(tile, group) max key-rank CLUSTER spread measured at release
# scale over synthetic seeds (tools/sweep_fused_knobs.py: s0 194,
# d1->s 281, d2->s 177, d3->s 182 at tile 128) + FGRAN-1 base waste +
# margin, rounded UP to FGRAN per the sizing rule (ADVICE r4 low: 288
# for the C=64/128 entries — spread 182 + 31 + 48 = 261 -> 288; the
# previous 256 left <48 ranks of margin). Both the kernel's VPU compare
# work and its MXU extraction are linear in W at fixed V, so these are
# sized tight; a frame that exceeds them trips the coverage flag and
# replays exactly.
FUSED_SUBM_KNOBS = {16: (128, 288), 32: (128, 384), 64: (128, 288),
                    128: (128, 288)}
# Largest feature table kept VMEM-resident (in occupied-vreg bytes — a
# (N, C<128) array burns full 128-lane vregs); bigger tables use the XLA
# path. The kernels request a 100 MB scoped-vmem budget, verified live on
# v5e with a 62 MB stage-0 table.
VMEM_TABLE_BYTES = 80 * 1024 * 1024


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


# --------------------------------------------------------------------------
# coverage-flag sink: conditional-free fast path
# --------------------------------------------------------------------------
#
# Wrapping every kernel in lax.cond(ok, pallas, xla) costs ~2.5 ms per
# conditional on v5e (layout conversions + pipeline serialization at the
# branch boundaries — measured 6.2 vs 8.6 f/s end to end with 18 conds).
# Under `collect_coverage_flags()` the wrappers skip the conditionals,
# return the kernel results directly, and append their traced ok scalars
# to the sink; the caller folds them into its outputs and REPLAYS through
# the safe (conditional) program in the rare case a flag trips.

_FLAG_SINK: tuple[list, list] | None = None  # (hard, soft)


class collect_coverage_flags:
    """Trace-time context: kernels run unconditionally; their coverage-ok
    scalars are appended here instead of guarding lax.cond fallbacks.

    Two flag classes:
      hard (self.flags)      — kernel span overflow: the Pallas result may
                               be WRONG vs the safe program. all_ok().
      soft (self.soft_flags) — documented-divergence signals (per-lane
                               slot-budget truncation, ops/sparse.py):
                               results follow the per-lane semantics but
                               differ from the global-layout safe path.
                               all_ok_strict() folds these in; serving
                               replays on it for bit-consistency with the
                               XLA path, while benchmarks (equal cost
                               either way) gate on all_ok() alone.
    """

    def __enter__(self):
        global _FLAG_SINK
        self._prev = _FLAG_SINK
        _FLAG_SINK = ([], [])
        return self

    def __exit__(self, *exc):
        global _FLAG_SINK
        self.flags, self.soft_flags = _FLAG_SINK
        _FLAG_SINK = self._prev
        return False

    @staticmethod
    def _fold(flags):
        import operator
        from functools import reduce

        if not flags:
            return jnp.bool_(True)
        return reduce(operator.and_, flags)

    def all_ok(self):
        return self._fold(self.flags)

    def all_ok_strict(self):
        return self._fold(self.flags + self.soft_flags)


def report_coverage_flag(ok, soft: bool = False) -> bool:
    """Append an externally computed coverage-ok scalar to the active sink.

    soft=True marks a documented-divergence signal (see
    collect_coverage_flags). Returns False (and does nothing) when no sink
    is active — callers that need a hard guarantee outside
    collect_coverage_flags() must guard themselves."""
    global _FLAG_SINK
    if _FLAG_SINK is None:
        return False
    _FLAG_SINK[1 if soft else 0].append(ok)
    return True


# --------------------------------------------------------------------------
# cursor-walk sorted lookup
# --------------------------------------------------------------------------


WIDE = 3  # widened key rows: row r holds keys[128 r : 128 r + 384]
MAX_HOPS = 64  # window hops per tile before flagging the XLA fallback


def _lookup_kernel(q_ref, keys_ref, perm_ref, pos_ref, cursors, *, V: int,
                   triple: bool, identity: bool = False):
    """grid (T,). q_ref (TILE, K) int32 queries (monotone per tap column);
    keys_ref / perm_ref (R, WIDE*128): WIDENED rows of the ascending key
    array and its argsort permutation, offset by one GUARD element
    (INT32_MIN) so row r covers flat key positions [128r - 1, 128r + 383)
    and lane 0 always holds the key just BEFORE the window — making the
    low-side overflow check exact. A tap's window fetch is ONE dynamic
    row slice in natural lane layout. pos_ref out: perm[pos], V for
    miss, -1 when the tile overflowed its window (wrapper falls back).
    cursors: SMEM (K,) per-tap flat positions walked forward across grid
    steps (queries are monotone per tap).

    triple=True: each query column is the CENTER of a unit-spaced triplet
    (the dx = -1/0/+1 taps of a 3x3x3 stencil differ by exactly 1 in
    linear key) — the kernel also resolves q-1 and q+1 inside the same
    windows, writing pos_ref (TILE, 3K) in (k, dx) raster order. The
    q-1 match is always visible (lane 0 holds the pre-window key and
    pos(q) >= the window start), and `beyond` is widened by one so the
    q+1 match stays inside the final window."""
    K = q_ref.shape[1]
    W = WIDE * TILE
    R = keys_ref.shape[0]
    t = pl.program_id(0)
    deltas = (-1, 0, 1) if triple else (0,)
    D = len(deltas)

    @pl.when(t == 0)
    def _():
        for k in range(K):
            cursors[k] = 0

    lane = jax.lax.broadcasted_iota(jnp.int32, (TILE, W), 1)
    stride = (WIDE - 1) * TILE  # flat positions advanced per hop
    for k in range(K):
        q = q_ref[:, k]  # (TILE,)
        real = q != SENTINEL
        r0 = jnp.minimum(cursors[k] // TILE, R - 1)

        # HOP LOOP: LiDAR density shifts between a tap's query band and
        # its key band, so one window can't bound the span. Windows at
        # rows r0 + (WIDE-1) h tile the flat key range contiguously
        # ([128 r - 1, 128 r + 383), 256-position stride, 128 overlap);
        # a query counts lanes [0, 256) of every window it lies beyond
        # and all 384 lanes of its final window — the hop counts sum to
        # exactly pos - (128 r0 - 1) for arbitrary spans.
        def body(state):
            h, cnt, fvals, fnds, active_i = state  # masks carried as int32
            active = active_i > 0
            r = jnp.minimum(r0 + (WIDE - 1) * h, R - 1)
            row = keys_ref[pl.ds(r, 1), :]  # (1, W)
            end = row[0, W - 1]
            beyond = active & ((q + (1 if triple else 0)) > end)
            final = active & ~beyond
            lt = row < q[:, None]  # (TILE, W)
            use = (beyond[:, None] & (lane < stride)) | final[:, None]
            cnt = cnt + jnp.sum((lt & use).astype(jnp.int32), axis=1)
            # matches lie in the final window: select perm values through
            # the equality masks, restricted to the FIRST matching lane —
            # duplicate keys (e.g. duplicate voxel coords in un-deduped
            # input) are adjacent in the sorted table and searchsorted
            # side='left' resolves to the first
            if identity:
                # identity permutation (e.g. the compaction lookup over a
                # cumsum table): the value IS the flat table position
                # 128 r + c - 1 (widened row r, column c; -1 for the
                # leading guard element) — skip the perm table entirely,
                # halving the VMEM residency. Exact in f32 below 2^24.
                prow = (lane[:1, :] + (r * TILE - 1)).astype(jnp.float32)
            else:
                prow = perm_ref[pl.ds(r, 1), :].astype(jnp.float32)
            dup_prev = row == pltpu.roll(row, 1, axis=1)  # (1, W)
            first_lane = ~dup_prev | (lane[:1, :] == 0)
            new_fvals = []
            new_fnds = []
            for j, d in enumerate(deltas):
                fnd = fnds[j] > 0
                eq = (row == (q + d)[:, None]) & final[:, None] & first_lane
                hit = jnp.any(eq, axis=1)
                pv = jnp.sum(jnp.where(eq, prow, 0.0), axis=1).astype(jnp.int32)
                new_fvals.append(jnp.where(hit & ~fnd, pv, fvals[j]))
                new_fnds.append((fnd | hit).astype(jnp.int32))
            return (h + 1, cnt, tuple(new_fvals), tuple(new_fnds),
                    beyond.astype(jnp.int32))

        def cond(state):
            h, _, _, _, active_i = state
            return jnp.any(active_i > 0) & (h < MAX_HOPS)

        zero = jnp.zeros((TILE,), jnp.int32)
        state = (jnp.int32(0), zero, (zero,) * D, (zero,) * D,
                 real.astype(jnp.int32))
        h, cnt, fvals, fnds, active_i = jax.lax.while_loop(cond, body, state)
        active = active_i > 0

        # flag for XLA fallback: a real query at/before the first
        # window's leading guard key (non-monotone input landed behind
        # the cursor), or the hop cap was exhausted
        row0 = keys_ref[pl.ds(r0, 1), :]
        bad = jnp.any(real & (q <= row0[0, 0])) | jnp.any(active)
        for j in range(D):
            res = jnp.where(fnds[j] > 0, fvals[j], V)
            pos_ref[:, D * k + j] = jnp.where(bad, -1, res)
        cursors[k] = jnp.maximum(
            cursors[k],
            jnp.minimum(
                r0 * TILE - 1 + jnp.max(jnp.where(real, cnt, 0)), V
            ),
        )


@functools.partial(jax.jit,
                   static_argnames=("V", "triple", "interpret", "identity"))
def _lookup_call(queries, keys_wide, perm_wide, V: int, triple: bool,
                 interpret: bool, identity: bool = False):
    Mp, K = queries.shape
    D = 3 if triple else 1
    T = Mp // TILE
    return pl.pallas_call(
        functools.partial(_lookup_kernel, V=V, triple=triple,
                          identity=identity),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((TILE, K), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, D * K), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, D * K), jnp.int32),
        scratch_shapes=[pltpu.SMEM((K,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(queries, keys_wide, perm_wide)


def _widen(flat: jnp.ndarray, R: int) -> jnp.ndarray:
    """(128 R + 2*TILE,) -> (R, WIDE*128) rows of overlapping windows —
    pure slices + reshapes, no gather."""
    parts = [
        flat[i * TILE: i * TILE + R * TILE].reshape(R, TILE)
        for i in range(WIDE)
    ]
    return jnp.concatenate(parts, axis=1)


def _lane_split(sorted_keys, perm, query, lanes: int):
    """Static per-lane slices for frame-major fixed-capacity tables.

    Each lane (batch element) owns EXACTLY V//lanes consecutive sorted
    positions: per-frame capacities are static and padded rows carry their
    frame's filler key (ops.sparse.encode_keys), so the global sort never
    mixes lanes. Query rows are lane-major chunks of M//lanes for the same
    reason. Returns per-lane (keys, local_perm, queries) triples."""
    V = sorted_keys.shape[0]
    M = query.shape[0]
    V1, M1 = V // lanes, M // lanes
    out = []
    for b in range(lanes):
        kb = jax.lax.slice_in_dim(sorted_keys, b * V1, (b + 1) * V1)
        pb = jax.lax.slice_in_dim(perm, b * V1, (b + 1) * V1) - b * V1
        qb = jax.lax.slice_in_dim(query, b * M1, (b + 1) * M1)
        out.append((kb, pb, qb))
    return out


def _lanes_usable(V: int, M: int, lanes: int) -> bool:
    return lanes > 1 and V % lanes == 0 and M % lanes == 0


def windowed_lookup(sorted_keys, perm, query, interpret: bool | None = None,
                    lanes: int = 1, identity_perm: bool = False):
    """Drop-in for ops.sparse._sorted_lookup on 2D per-tap-monotone queries.

    sorted_keys (V,) ascending with SENTINEL tail; perm (V,) argsort
    indices; query (M, K) int32. Returns (M, K) int32 in [0, V], V = miss.
    Exact for any input: tiles that violate the window assumption flag an
    overflow and the whole lookup falls back to the XLA path.

    lanes > 1 splits the table and queries into per-lane (batch-element)
    chunks and runs one kernel per lane — each lane's table then fits the
    VMEM residency budget at multi-frame batch sizes.
    """
    if interpret is None:
        interpret = _interpret_default()
    V = sorted_keys.shape[0]
    M, K = query.shape
    if _lanes_usable(V, M, lanes):
        V1 = V // lanes
        parts = []
        for b, (kb, pb, qb) in enumerate(
            _lane_split(sorted_keys, perm, query, lanes)
        ):
            r = windowed_lookup(kb, pb, qb, interpret=interpret)
            parts.append(jnp.where(r < V1, r + b * V1, V))
        return jnp.concatenate(parts, axis=0)
    pos = _lookup_run(sorted_keys, perm, query, triple=False,
                      interpret=bool(interpret), identity=identity_perm)

    def xla_path(_):
        return _xla_lookup(sorted_keys, perm, query)

    if _FLAG_SINK is not None:
        _FLAG_SINK[0].append(~jnp.any(pos < 0))
        return jnp.where(pos[:M] < 0, V, pos[:M])
    return jax.lax.cond(
        jnp.any(pos < 0), xla_path, lambda _: pos[:M], None
    )


def _xla_lookup(sorted_keys, perm, query):
    V = sorted_keys.shape[0]
    p = jnp.searchsorted(sorted_keys, query.reshape(-1), side="left",
                         method="sort")
    p = jnp.clip(p, 0, V - 1)
    qf = query.reshape(-1)
    found = (sorted_keys[p] == qf) & (qf != SENTINEL)
    return (jnp.where(found, perm[p], V).astype(jnp.int32)
            .reshape(query.shape))


def _lookup_run(sorted_keys, perm, query, triple: bool, interpret: bool,
                identity: bool = False):
    V = sorted_keys.shape[0]
    M, K = query.shape
    Mp = ((M + TILE - 1) // TILE) * TILE
    # queries beyond the table's last key can never match; mapping them to
    # SENTINEL up front keeps the cursor walk bounded (a SATURATED table —
    # valid rows == capacity, no filler tail — would otherwise force a
    # whole-table hop walk for out-of-range taps, e.g. dz=+1 queries when
    # the capacity truncated every higher z-plane)
    hi = sorted_keys[V - 1].astype(jnp.int32)
    # triple mode probes q-1 too: a center at hi+1 still has a real q-1
    # match, so the clamp threshold shifts by one (guarded against int32
    # overflow when the table tail is already SENTINEL)
    lim = jnp.where(hi == SENTINEL, SENTINEL,
                    hi + (1 if triple else 0)).astype(jnp.int32)
    qc = jnp.where(query.astype(jnp.int32) > lim, SENTINEL,
                   query.astype(jnp.int32))
    q = jnp.full((Mp, K), SENTINEL, jnp.int32).at[:M].set(qc)
    R = (V + TILE - 1) // TILE + 1
    flat_len = R * TILE + 2 * TILE
    # leading GUARD element: widened row r's lane 0 = keys[128r - 1], the
    # key just before the window (INT32_MIN for r = 0) — see kernel
    kf = jnp.full((flat_len,), SENTINEL, jnp.int32)
    kf = kf.at[0].set(jnp.iinfo(jnp.int32).min)
    kf = kf.at[1: V + 1].set(sorted_keys.astype(jnp.int32))
    if identity:
        # kernel derives positions from the window base: no perm table
        pw = jnp.zeros((R, WIDE * TILE), jnp.int32)[:1]
    else:
        pf = jnp.zeros((flat_len,), jnp.int32).at[1: V + 1].set(
            perm.astype(jnp.int32)
        )
        pw = _widen(pf, R)
    return _lookup_call(q, _widen(kf, R), pw, V=V, triple=triple,
                        interpret=interpret, identity=identity)


def windowed_lookup_triple(sorted_keys, perm, centers,
                           interpret: bool | None = None, lanes: int = 1):
    """Resolve perm[pos] for (c-1, c, c+1) per center query in one pass.

    The dx taps of a 3x3x3 stencil differ by exactly 1 in linear key, so
    a 27-tap neighbor build only needs 9 center lookups — the +-1
    variants fall out of the same windows. centers (M, G) monotone per
    column; returns (M, 3G) in (g, dx) raster order (== the full tap
    raster when G iterates (dz, dy)). Falls back to the XLA path on the
    expanded queries when any tile flags. lanes > 1: per-lane kernels
    (see windowed_lookup)."""
    if interpret is None:
        interpret = _interpret_default()
    V = sorted_keys.shape[0]
    M, G = centers.shape
    if _lanes_usable(V, M, lanes):
        V1 = V // lanes
        parts = []
        for b, (kb, pb, cb) in enumerate(
            _lane_split(sorted_keys, perm, centers, lanes)
        ):
            r = windowed_lookup_triple(kb, pb, cb, interpret=interpret)
            parts.append(jnp.where(r < V1, r + b * V1, V))
        return jnp.concatenate(parts, axis=0)
    pos = _lookup_run(sorted_keys, perm, centers, triple=True,
                      interpret=bool(interpret))

    def xla_path(_):
        c = centers.astype(jnp.int32)
        real = c != SENTINEL
        q3 = jnp.stack(
            [jnp.where(real, c - 1, SENTINEL), c,
             jnp.where(real, c + 1, SENTINEL)], axis=-1,
        ).reshape(M, 3 * G)
        return _xla_lookup(sorted_keys, perm, q3)

    if _FLAG_SINK is not None:
        _FLAG_SINK[0].append(~jnp.any(pos < 0))
        return jnp.where(pos[:M] < 0, V, pos[:M])
    return jax.lax.cond(
        jnp.any(pos < 0), xla_path, lambda _: pos[:M], None
    )


# --------------------------------------------------------------------------
# windowed one-hot gather-conv
# --------------------------------------------------------------------------


def _conv_kernel(pos_ref, tab_ref, w_ref, out_ref, *, W: int, V: int,
                 NWIN: int, ALIGN: int):
    """grid (T,). pos_ref (TILE, K) int32 gather rows (>= V is a miss);
    tab_ref (Vp, C) resident features; w_ref (K, C, Co); out (TILE, Co).

    Per tap: slice a (W, C) window of the resident table at the tile's
    min found position (dynamic pl.ds) and extract rows with a one-hot
    matmul on the MXU — no data-dependent addressing outside the MXU.
    NWIN=2 adds an ADAPTIVE second window at the min of the positions
    beyond the first (strided convs at z-plane-boundary tiles see
    BIMODAL positions ~an input-plane apart; a second cluster-aligned
    window covers them where a contiguous extension cannot). Straight-
    line compute — branching/scratch variants measured slower."""
    tile, K = pos_ref.shape
    dt = tab_ref.dtype
    Vp = tab_ref.shape[0]
    INT_MAX = jnp.int32(2**31 - 1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (tile, W), 1)
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for k in range(K):
        p = pos_ref[:, k]
        found = p < V
        lo = jnp.min(jnp.where(found, p, INT_MAX))
        # Tile-aligned base (8 rows f32, 16 bf16): aligned sublane slices
        # are pure addressing on TPU — and for packed dtypes Mosaic
        # REQUIRES provable alignment (hence the multiple_of hint)
        # clip bound aligned too, so the multiple_of promise always holds
        # (it never binds in practice: lo <= V-1 and Vp = V + W)
        base = jnp.clip(jnp.where(jnp.any(found), lo & ~(ALIGN - 1), 0),
                        0, (Vp - W) & ~(ALIGN - 1))
        base = pl.multiple_of(base, ALIGN)
        win = tab_ref[pl.ds(base, W), :]  # (W, C)
        loc = jnp.where(found, p - base, W)
        loc = jnp.where(loc < W, loc, W)
        onehot = (loc[:, None] == lanes).astype(dt)  # (TILE, W)
        rows = jax.lax.dot_general(
            onehot, win, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if NWIN == 2:
            far = found & (p >= base + W)
            lo2 = jnp.min(jnp.where(far, p, INT_MAX))
            base2 = jnp.clip(
                jnp.where(jnp.any(far), lo2 & ~(ALIGN - 1), 0),
                0, (Vp - W) & ~(ALIGN - 1),
            )
            base2 = pl.multiple_of(base2, ALIGN)
            win2 = tab_ref[pl.ds(base2, W), :]
            loc2 = jnp.where(far & (p >= base2), p - base2, W)
            loc2 = jnp.where(loc2 < W, loc2, W)
            oh2 = (loc2[:, None] == lanes).astype(dt)
            rows = rows + jax.lax.dot_general(
                oh2, win2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        acc = acc + jax.lax.dot_general(
            rows.astype(dt), w_ref[k], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[:] = acc


@functools.partial(jax.jit,
                   static_argnames=("V", "W", "NWIN", "ALIGN", "interpret",
                                    "tile"))
def _conv_call(pos, tab_pad, weight, V: int, W: int, NWIN: int, ALIGN: int,
               interpret: bool, tile: int = TILE):
    Mp, K = pos.shape
    Co = weight.shape[2]
    T = Mp // tile
    return pl.pallas_call(
        functools.partial(_conv_kernel, W=W, V=V, NWIN=NWIN, ALIGN=ALIGN),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((tile, K), lambda t: (t, 0), memory_space=pltpu.VMEM),
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
    )(pos, tab_pad, weight)


def windowed_gather_matmul(
    feats: jnp.ndarray,  # (V, C) sorted-table features
    gather: jnp.ndarray,  # (M, K) int32 rows, V = miss; per-tap ~monotone
    weight: jnp.ndarray,  # (K, C, Co)
    compute_dtype=None,
    interpret: bool | None = None,
    window: int | None = None,
    nwin: int = 1,
    lanes: int = 1,
    tile: int | None = None,
):
    """Drop-in for the XLA im2col gather+matmul (ops.sparse._gathered_matmul).

    Returns (M, Co) f32. A per-tile coverage check (plain vector math on
    the index array) lax.cond-selects between the Pallas kernel and the
    exact XLA gather, so unsorted tables degrade gracefully.

    window: per-tile table window. Strided convs read ~(V_in/M_out) input
    rows per output row, so their callers pass a proportionally wider
    window; the default suits submanifold convs (measured spans: <=139 at
    stage 0, <=~260 at C>=32 stages — hence the C-keyed default).
    nwin=2 adds the adaptive second window for bimodal z-boundary tiles.

    lanes > 1 runs one kernel per lane over that lane's static table/row
    chunk (frame-major fixed-capacity layout — see _lane_split): the
    per-lane table fits the VMEM budget where the packed multi-frame
    table does not (a valid output row only ever gathers rows of its own
    frame, so lane-local misses are exact).
    """
    if interpret is None:
        interpret = _interpret_default()
    V, C = feats.shape
    M, K = gather.shape
    Co = weight.shape[2]
    if _lanes_usable(V, M, lanes):
        V1, M1 = V // lanes, M // lanes
        parts = []
        for b in range(lanes):
            fb = jax.lax.slice_in_dim(feats, b * V1, (b + 1) * V1)
            gb = jax.lax.slice_in_dim(gather, b * M1, (b + 1) * M1)
            lb = jnp.where((gb >= b * V1) & (gb < (b + 1) * V1),
                           gb - b * V1, V1)
            parts.append(windowed_gather_matmul(
                fb, lb, weight, compute_dtype=compute_dtype,
                interpret=interpret, window=window, nwin=nwin, tile=tile,
            ))
        return jnp.concatenate(parts, axis=0)
    if window is None and tile is None and C in SUBM_KNOBS:
        tile, W = SUBM_KNOBS[C]
    else:
        W = window or (W_CONV if C < 32 else 384)
    if tile is None:
        tile = TILE
    dt = compute_dtype or feats.dtype

    def xla_path(_):
        padded = jnp.concatenate([feats, jnp.zeros((1, C), feats.dtype)], axis=0)
        gathered = padded[gather]
        return jax.lax.dot_general(
            gathered.reshape(M, K * C).astype(dt),
            weight.reshape(K * C, -1).astype(dt),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    itemsize = jnp.dtype(dt).itemsize
    if (V + W) * C * itemsize * (128 // min(C, 128)) > VMEM_TABLE_BYTES:
        # (N, C<128) arrays occupy full 128-lane vregs in VMEM
        return xla_path(None)

    # window bases are tile-aligned (8 rows f32, 16 bf16 — Mosaic needs
    # provable alignment for packed dtypes); the coverage check mirrors it
    align = 8 * 4 // jnp.dtype(dt).itemsize
    Mp = ((M + tile - 1) // tile) * tile
    T = Mp // tile
    INT_MAX = jnp.iinfo(jnp.int32).max
    g = jnp.full((Mp, K), V, jnp.int32).at[:M].set(gather)
    gt = g.reshape(T, tile, K)
    ft = gt < V
    lo = jnp.min(jnp.where(ft, gt, INT_MAX), axis=1) & ~(align - 1)  # (T, K)
    in1 = ft & (gt - lo[:, None, :] < W)  # covered by the first window
    if nwin == 2:
        far = ft & ~in1
        lo2 = jnp.min(jnp.where(far, gt, INT_MAX), axis=1) & ~(align - 1)
        covered = in1 | (far & (gt - lo2[:, None, :] < W))
    else:
        covered = in1
    ok = jnp.all(covered == ft)

    tab_pad = jnp.zeros((V + W, C), dt).at[:V].set(feats.astype(dt))
    w = weight.astype(dt)

    def pallas_path(_):
        return _conv_call(g, tab_pad, w, V=V, W=W, NWIN=nwin, ALIGN=align,
                          interpret=bool(interpret), tile=tile)[:M]

    if _FLAG_SINK is not None:
        _FLAG_SINK[0].append(ok)
        return pallas_path(None)
    return jax.lax.cond(ok, pallas_path, xla_path, None)


# --------------------------------------------------------------------------
# fused lookup-conv: key-compare one-hot extraction (no separate index)
# --------------------------------------------------------------------------
#
# The round-4 itemized profile (tools/prof_trunk.py) put the windowed
# LOOKUPS (index builds + strided-plan gathers) at ~26 ms of the 67 ms
# trunk — yet the conv kernel already rebuilds a (tile, W) one-hot from
# the looked-up positions for every conv. Building that one-hot from a
# KEY COMPARE instead (win_keys == query_key) costs the same vector work
# and makes the positions unnecessary: the whole lookup stage collapses
# into a cheap XLA precompute (per-(tile, tap-group) window rows from a
# coarse searchsorted over the table's per-row guard keys + a value-based
# coverage check). Misses contribute a zero row exactly like the conv's
# loc=W convention. Two kernel-probed designs that tried to speed up the
# standalone lookup first (straight-line dual-window: 14.2 vs 11.3 ms at
# stage 0; MXU-dot extraction at Precision.HIGHEST: 21.4 ms) both LOST to
# the hop kernel — fusing is the move that wins, not a faster lookup.
#
# Contract: the feature rows must be PHYSICALLY key-sorted (true for the
# host-sorted stage-0 input and every strided-compaction output); an O(V)
# monotonicity check folds into the coverage flag, so an unsorted table
# replays through the exact XLA path like any other coverage miss.


# Fused-path window-base granularity. Bases are chosen by a coarse
# searchsorted over per-row guard keys; a granule of g wastes up to g-1
# ranks of the window below the lowest query (the base rounds DOWN to a
# granule boundary). At the original g=128 the waste ate the whole margin
# at bench scale: stage-0 tiles span <=333 ranks (W=384) yet missed
# coverage (tools/analyze_fused_miss.py, round-4 bench assert). g=32 cuts
# the waste to <=31 for a 4x larger keys_wide table (s0: 1.4 -> 5.8 MB
# VMEM), leaving the extraction matmul cost unchanged. Must stay a
# multiple of the feature-slice ALIGN (32 covers int8's 8*4/1).
FGRAN = 32


class FusedIndex(NamedTuple):
    """Precomputed per-stage state for fused lookup-convs (built once per
    position set, shared by every conv over it — the spconv indice_key
    analogue). All leaves are arrays (clean pytree); static geometry
    (tile, W, nwin, tap grouping) is re-derived from shapes + the knobs
    the caller passes to both build and apply."""

    queries: jnp.ndarray  # (Mp, K) int32 linear input keys; -2 = no neighbor
    bases: jnp.ndarray  # (T, NWIN*G) int32 window rows (FGRAN units)
    keys_wide: jnp.ndarray  # (R, W) int32 aligned key windows
    ok: jnp.ndarray  # scalar bool: sorted table AND every query covered


def _fused_conv_kernel(q_ref, base_ref, keys_ref, tab_ref, w_ref, out_ref, *,
                       NWIN: int, D: int, ALIGN: int):
    """grid (T,). q_ref (tile, K) int32 query keys (-2 = miss); base_ref
    (T, NWIN*G) SMEM window rows in FGRAN units — row r covers flat table
    positions [FGRAN r, FGRAN r + W) in ALIGNED layout (no guard shift, so
    the feature slice at FGRAN r is alignment-provable); keys_ref (R, W)
    widened key windows; tab_ref (FL, C) features in the same flat
    layout; w_ref (K, C, Co).

    Per tap group g (D=3 when the dx taps are unit-spaced in key — one
    window serves all three): slice the key window + feature window once,
    build a first-occurrence one-hot per tap from the key compare, and
    extract + accumulate rows on the MXU exactly like _conv_kernel. The
    second window (NWIN=2, bimodal strided tiles) is value-exclusive:
    only queries beyond window 1's last key use it."""
    tile, K = q_ref.shape
    G = K // D
    W = keys_ref.shape[1]
    dt = tab_ref.dtype
    t = pl.program_id(0)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for g in range(G):
        rows = [None] * D
        end1 = None
        for w in range(NWIN):
            r = base_ref[t, NWIN * g + w]
            kwin = keys_ref[pl.ds(r, 1), :]  # (1, W)
            fbase = pl.multiple_of(r * FGRAN, ALIGN)
            fwin = tab_ref[pl.ds(fbase, W), :]  # (W, C)
            # first occurrence of duplicate keys wins (searchsorted
            # side='left'); the wrap at lane 0 compares against lane W-1
            # whose key is >= — never equal for a covered query
            dup = kwin == pltpu.roll(kwin, 1, axis=1)
            first = ~dup | (lane1 == 0)
            end = kwin[0, W - 1]
            for j in range(D):
                q = q_ref[:, D * g + j]
                oh = (kwin == q[:, None]) & first
                if w == 1:
                    oh = oh & (q > end1)[:, None]
                rj = jax.lax.dot_general(
                    oh.astype(dt), fwin, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                rows[j] = rj if w == 0 else rows[j] + rj
            end1 = end
        for j in range(D):
            acc = acc + jax.lax.dot_general(
                rows[j].astype(dt), w_ref[D * g + j],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    out_ref[:] = acc


@functools.partial(jax.jit,
                   static_argnames=("NWIN", "D", "ALIGN", "interpret",
                                    "tile"))
def _fused_conv_call(q, bases, keys_wide, tab_pad, weight, NWIN: int, D: int,
                     ALIGN: int, interpret: bool, tile: int):
    Mp, K = q.shape
    Co = weight.shape[2]
    T = Mp // tile
    return pl.pallas_call(
        functools.partial(_fused_conv_kernel, NWIN=NWIN, D=D, ALIGN=ALIGN),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((tile, K), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
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
    )(q, bases, keys_wide, tab_pad, weight)


def build_fused_index(sorted_keys, queries, *, tile: int, window: int,
                      nwin: int = 1, triple: bool = True) -> FusedIndex:
    """Precompute the fused-conv state for one position set.

    sorted_keys (V,) ascending linear keys with SENTINEL tail (rows must
    be physically in this order — checked into `ok`); queries (M, K)
    int32 with SENTINEL where a tap has no neighbor; K in (dz, dy, dx)
    raster order with unit-spaced dx when triple (kx == 3)."""
    V = sorted_keys.shape[0]
    M, K = queries.shape
    W = window
    assert W % FGRAN == 0, "fused window must be a multiple of FGRAN"
    D = 3 if triple else 1
    G = K // D
    Mp = ((M + tile - 1) // tile) * tile
    T = Mp // tile
    R = (V + FGRAN - 1) // FGRAN + 1
    FL = (R - 1) * FGRAN + W

    qpad = jnp.full((Mp, K), SENTINEL, jnp.int32).at[:M].set(
        queries.astype(jnp.int32))
    keys_flat = jnp.full((FL,), SENTINEL, jnp.int32).at[:V].set(
        sorted_keys.astype(jnp.int32))
    keys_wide = jnp.concatenate(
        [keys_flat[i * FGRAN: i * FGRAN + R * FGRAN].reshape(R, FGRAN)
         for i in range(W // FGRAN)], axis=1)

    # guards[r] = key just before window r (-inf for r=0); ends[r] = its
    # last key. rowof(x) = largest r with guards[r] < x.
    guards = jnp.concatenate([
        jnp.full((1,), jnp.iinfo(jnp.int32).min, jnp.int32),
        keys_flat[FGRAN - 1: (R - 1) * FGRAN: FGRAN],
    ])
    ends = keys_flat[W - 1: FL: FGRAN]  # (R,)

    qt = qpad.reshape(T, tile, G, D)
    real = qt != SENTINEL
    qlo = jnp.min(jnp.where(real, qt, SENTINEL), axis=(1, 3))  # (T, G)
    qhi = jnp.max(jnp.where(real, qt, jnp.iinfo(jnp.int32).min), axis=(1, 3))
    anchors = (jnp.stack([qlo, qhi], axis=-1).reshape(T, 2 * G) if nwin == 2
               else qlo)
    rows = jnp.searchsorted(guards, anchors.reshape(-1), side="left",
                            method="sort").astype(jnp.int32) - 1
    rows = rows.reshape(T, G, nwin)
    if nwin == 2:
        # Anchor window 2 so it ENDS at qhi's granule rather than starting
        # there: the second cluster's low members otherwise fall below the
        # window when qhi sits near a granule boundary (round-4 bench bug:
        # d1 tile 117 g7 — cluster ranks [13563, 13588], qhi granule start
        # 13568). Backing off W/FGRAN - 1 granules covers W - FGRAN ranks
        # below qhi; the value-exclusive kernel rule (q > end1 uses w2)
        # makes any overlap with window 1 harmless.
        rows = rows.at[:, :, 1].add(-(W // FGRAN - 1))
    bases = jnp.clip(rows, 0, R - 1).reshape(T, nwin * G)

    # value-based coverage: every real query must fall in (guard, end] of
    # one of its group's windows; plus the physical-sort contract. cov2
    # mirrors the kernel's value-exclusive rule exactly (w2 only matches
    # queries beyond w1's end), so ok <=> kernel output == exact conv.
    b1 = bases.reshape(T, G, nwin)[:, :, 0]
    g1 = guards[b1][:, None, :, None]
    e1 = ends[b1][:, None, :, None]
    cov = (qt > g1) & (qt <= e1)
    if nwin == 2:
        b2 = bases.reshape(T, G, nwin)[:, :, 1]
        g2 = guards[b2][:, None, :, None]
        e2 = ends[b2][:, None, :, None]
        cov = cov | ((qt > g2) & (qt <= e2) & (qt > e1))
    ok = jnp.all(cov | ~real) & jnp.all(sorted_keys[1:] >= sorted_keys[:-1])
    qmask = jnp.where(qpad == SENTINEL, -2, qpad)
    return FusedIndex(queries=qmask, bases=bases, keys_wide=keys_wide, ok=ok)


def fused_conv_apply(feats, findex: FusedIndex, weight, *,
                     compute_dtype=None, nwin: int = 1, triple: bool = True,
                     interpret: bool | None = None, m_out: int | None = None):
    """Apply one conv through the fused lookup-conv kernel.

    feats (V, C) PHYSICALLY key-sorted rows matching findex.keys_wide;
    weight (K, C, Co). Returns (M, Co) f32 (M = m_out or the padded Mp).
    Exactness contract identical to windowed_gather_matmul: under a
    collect_coverage_flags sink the kernel runs unconditionally and
    findex.ok joins the hard flags; otherwise a lax.cond falls back to
    the searchsorted+gather XLA path."""
    if interpret is None:
        interpret = _interpret_default()
    V, C = feats.shape
    Mp, K = findex.queries.shape
    M = m_out if m_out is not None else Mp
    Co = weight.shape[2]
    D = 3 if triple else 1
    W = findex.keys_wide.shape[1]
    R = findex.keys_wide.shape[0]
    FL = (R - 1) * FGRAN + W
    tile = Mp // findex.bases.shape[0]
    dt = compute_dtype or feats.dtype
    align = 8 * 4 // jnp.dtype(dt).itemsize

    def xla_path(_):
        # exact fallback for ANY physical row order (the flag fires
        # precisely when rows are unsorted or a window under-covers):
        # argsort the physical keys (runs only on this cond branch),
        # searchsorted, then map back through the permutation
        keys = findex.keys_wide[:, :FGRAN].reshape(-1)[:V]
        order = jnp.argsort(keys)
        skeys = keys[order]
        q = findex.queries[:M]
        pos = jnp.searchsorted(skeys, q.reshape(-1), side="left",
                               method="sort")
        pos = jnp.clip(pos, 0, V - 1)
        found = (skeys[pos] == q.reshape(-1)) & (q.reshape(-1) >= 0)
        g = jnp.where(found, order[pos], V).reshape(M, K)
        padded = jnp.concatenate([feats, jnp.zeros((1, C), feats.dtype)], 0)
        return jax.lax.dot_general(
            padded[g].reshape(M, K * C).astype(dt),
            weight.reshape(K * C, Co).astype(dt),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    itemsize = jnp.dtype(dt).itemsize
    if FL * C * itemsize * (128 // min(C, 128)) > VMEM_TABLE_BYTES:
        return xla_path(None)

    tab_pad = jnp.zeros((FL, C), dt).at[:V].set(feats.astype(dt))
    w = weight.astype(dt)

    def pallas_path(_):
        return _fused_conv_call(findex.queries, findex.bases,
                                findex.keys_wide, tab_pad, w, NWIN=nwin,
                                D=D, ALIGN=align, interpret=bool(interpret),
                                tile=tile)[:M]

    if _FLAG_SINK is not None:
        _FLAG_SINK[0].append(findex.ok)
        return pallas_path(None)
    return jax.lax.cond(findex.ok, pallas_path, xla_path, None)
