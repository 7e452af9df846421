"""Vectorized scene tracker: fixed-capacity track table in a lax.scan.

The reference tracks on the host, one frame at a time, with a Python list
of dicts (pub_tracker.py:55-200) — at eval this costs a device->host
round-trip per frame. Here the whole scene streams on-device: the track
table is a fixed-capacity struct-of-arrays, greedy assignment is a masked
lax.scan, and track birth/death/aging are vectorized masks. Semantics
mirror PubTracker/PubTrackerMerged:

- centers back-projected by -v*lag before gating
- per-class center gates; class mismatch invalid
- greedy row-order assignment (det order = class-major, matching the
  merged tracker's per-class loops)
- non-newborn unmatched dets near an existing track -> suppressed
- dead-flagged unmatched tracks near a det -> dropped
- unmatched tracks age to max_age, centers advanced by the last motion
- optional per-class confidence refinement
  ((tp>alpha)*beta*conf + (1-beta)*prev)
- the merged quirk: classes with zero dets this frame lose their tracks

Table layout: slots [0, N) hold this frame's det-derived tracks (det-major
order), slots [N, CAP) hold aged tracks compacted front-first — the same
ordering the host tracker's `ret` list produces, so greedy tie-breaking
matches.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .greedy import greedy_assign_jax

BIG = 1e18


class TrackTable(NamedTuple):
    ct: jnp.ndarray  # (CAP, 2)
    tracking: jnp.ndarray  # (CAP, 2) last motion (-v*lag)
    cls: jnp.ndarray  # (CAP,) int32
    tid: jnp.ndarray  # (CAP,) int32 tracking id
    age: jnp.ndarray  # (CAP,) int32
    active: jnp.ndarray  # (CAP,) int32 consecutive-hit counter
    ref_score: jnp.ndarray  # (CAP,)
    dead: jnp.ndarray  # (CAP,) bool — det carried the ShaSTA dead flag
    used: jnp.ndarray  # (CAP,) bool

    @staticmethod
    def empty(cap: int) -> "TrackTable":
        return TrackTable(
            ct=jnp.zeros((cap, 2)),
            tracking=jnp.zeros((cap, 2)),
            cls=jnp.full((cap,), -1, jnp.int32),
            tid=jnp.zeros((cap,), jnp.int32),
            age=jnp.zeros((cap,), jnp.int32),
            active=jnp.zeros((cap,), jnp.int32),
            ref_score=jnp.zeros((cap,)),
            dead=jnp.zeros((cap,), bool),
            used=jnp.zeros((cap,), bool),
        )


class FrameDets(NamedTuple):
    """Per-frame fixed-shape det arrays (N rows, padded, class-major order)."""

    ct: jnp.ndarray  # (N, 2) raw centers
    velocity: jnp.ndarray  # (N, 2)
    cls: jnp.ndarray  # (N,) int32, -1 for padding
    score: jnp.ndarray  # (N,)
    ref_score: jnp.ndarray  # (N,) decision-rule refined score (tp prob)
    newborn: jnp.ndarray  # (N,) bool
    dead: jnp.ndarray  # (N,) bool (retro dead flag for this det's frame)
    valid: jnp.ndarray  # (N,) bool


class TrackerParams(NamedTuple):
    gates: jnp.ndarray  # (C,) per-class center gate
    alpha: jnp.ndarray  # (C,)
    beta: jnp.ndarray  # (C,)
    refine: jnp.ndarray  # (C,) bool
    max_age: int
    merged_mode: bool = True


def step_frame(table: TrackTable, id_count, dets: FrameDets, time_lag,
               params: TrackerParams):
    """One tracking step. Returns (new_table, id_count, det_tid,
    det_active, det_refsc)."""
    table, n_new, tid, used, ref, _ = step_frame_core(
        table, id_count, dets, time_lag, params)
    return table, id_count + n_new, tid, used, ref


def step_frame_core(table: TrackTable, id_count, dets: FrameDets, time_lag,
                    params: TrackerParams):
    """step_frame internals, additionally returning (n_new, is_new).

    With id_count=0 the new-track ids are RELATIVE (1 + within-frame
    rank): the fused multi-class pipeline runs one core per class lane
    under vmap, then rebases each lane's new ids by the global id count
    plus the preceding lanes' n_new — reproducing the merged tracker's
    det-order id assignment exactly (class-major det rows)."""
    N = dets.ct.shape[0]
    CAP = table.ct.shape[0]

    tracking = -dets.velocity * time_lag
    q = dets.ct + tracking  # back-projected det centers
    gate = params.gates[jnp.clip(dets.cls, 0, None)]

    diff = q[:, None, :] - table.ct[None, :, :]
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    invalid = (
        (dets.cls[:, None] != table.cls[None, :])
        | ~table.used[None, :]
        | ~dets.valid[:, None]
        | (dist > gate[:, None])
    )
    dist = jnp.where(invalid, BIG, dist)

    match = greedy_assign_jax(dist)  # (N,) track slot or -1
    matched = match >= 0
    mslot = jnp.clip(match, 0)

    # ---- det-derived track rows (slots 0..N-1) ----------------------------
    prev_ref = table.ref_score[mslot]
    prev_active = table.active[mslot]
    alpha = params.alpha[jnp.clip(dets.cls, 0, None)]
    beta = params.beta[jnp.clip(dets.cls, 0, None)]
    refine = params.refine[jnp.clip(dets.cls, 0, None)]

    refined = (dets.ref_score > alpha) * beta * dets.score + (1 - beta) * prev_ref
    plain = dets.score
    matched_ref = jnp.where(refine, refined, plain)

    # suppression of non-newborn unmatched dets near an existing track:
    # any valid (same-class, in-gate) track column exists
    near_track = jnp.min(dist, axis=1) <= gate
    suppressed = ~matched & ~dets.newborn & near_track

    is_new = dets.valid & ~matched & ~suppressed
    new_rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    new_tid = id_count + 1 + new_rank
    n_new = jnp.sum(is_new)

    new_ref = jnp.where(refine & params.merged_mode, beta * dets.score, dets.score)

    det_used = matched | is_new
    det_tid = jnp.where(matched, table.tid[mslot], jnp.where(is_new, new_tid, 0))
    det_active = jnp.where(matched, prev_active + 1, jnp.where(is_new, 1, 0))
    det_refsc = jnp.where(matched, matched_ref, new_ref)

    # ---- aged tracks (compacted into slots N..CAP-1) ----------------------
    col_matched = jnp.zeros((CAP,), bool).at[jnp.where(matched, mslot, CAP)].set(
        True, mode="drop"
    )
    # dead-flag removal: dead track near any valid det of its class
    t_gate = params.gates[jnp.clip(table.cls, 0, None)]
    near_det = jnp.min(jnp.where(invalid, BIG, dist), axis=0) <= t_gate
    drop_dead = table.dead & near_det
    # merged quirk: classes with zero dets this frame keep nothing
    C = params.gates.shape[0]
    class_has_dets = (
        jnp.zeros((C,), bool)
        .at[jnp.where(dets.valid, dets.cls, C)]
        .set(True, mode="drop")
    )
    cls_alive = class_has_dets[jnp.clip(table.cls, 0, None)] | ~jnp.asarray(
        params.merged_mode
    )

    survive = (
        table.used & ~col_matched & ~drop_dead & (table.age < params.max_age) & cls_alive
    )
    aged_ref = jnp.where(
        params.refine[jnp.clip(table.cls, 0, None)] & params.merged_mode,
        (1 - params.beta[jnp.clip(table.cls, 0, None)]) * table.ref_score,
        table.ref_score,
    )
    aged_ct = table.ct - table.tracking  # move forward

    n_aged_slots = CAP - N
    rank = jnp.cumsum(survive.astype(jnp.int32)) - 1
    dest = jnp.where(survive & (rank < n_aged_slots), N + rank, CAP)

    def scatter(dst_init, src):
        return dst_init.at[dest].set(src, mode="drop")

    new_table = TrackTable(
        ct=scatter(jnp.zeros((CAP, 2)).at[:N].set(jnp.where(det_used[:, None], dets.ct, 0.0)), aged_ct),
        tracking=scatter(jnp.zeros((CAP, 2)).at[:N].set(jnp.where(det_used[:, None], tracking, 0.0)), table.tracking),
        cls=scatter(jnp.full((CAP,), -1, jnp.int32).at[:N].set(jnp.where(det_used, dets.cls, -1)), table.cls),
        tid=scatter(jnp.zeros((CAP,), jnp.int32).at[:N].set(det_tid), table.tid),
        age=scatter(jnp.zeros((CAP,), jnp.int32).at[:N].set(jnp.where(det_used, 1, 0)), table.age + 1),
        active=scatter(jnp.zeros((CAP,), jnp.int32).at[:N].set(det_active), jnp.zeros((CAP,), jnp.int32)),
        ref_score=scatter(jnp.zeros((CAP,)).at[:N].set(jnp.where(det_used, det_refsc, 0.0)), aged_ref),
        dead=scatter(jnp.zeros((CAP,), bool).at[:N].set(jnp.where(det_used, dets.dead, False)), table.dead),
        used=scatter(jnp.zeros((CAP,), bool).at[:N].set(det_used), survive),
    )
    return new_table, n_new, det_tid, det_used, det_refsc, is_new


def track_scene(frames: FrameDets, time_lags: jnp.ndarray, params: TrackerParams,
                cap: int | None = None):
    """Scan a whole scene. frames: FrameDets with a leading (F,) axis;
    time_lags (F,). Returns (det_tid (F, N), det_active (F, N), ref (F, N))."""
    F, N = frames.ct.shape[:2]
    cap = cap or N * (params.max_age + 1)
    table0 = TrackTable.empty(cap)

    def body(carry, inp):
        table, idc = carry
        dets, lag = inp
        table, idc, tid, used, ref = step_frame(table, idc, dets, lag, params)
        return (table, idc), (tid, used, ref)

    (_, _), (tids, useds, refs) = jax.lax.scan(
        body, (table0, jnp.int32(0)), (frames, time_lags)
    )
    return tids, useds, refs
