"""Production scene-inference pipeline: one jitted on-device step per frame.

The reference's eval path (eval.py:96-181 + pub_tracker) runs batch-1
forwards with per-frame device->host round-trips of the full affinity
matrices, then tracks on the host. Here everything after voxel upload stays
on device:

  carry = (prev descriptors, prev boxes, track table, id counter)
  step: trunk (one frame) -> BEV descriptors -> affinity vs carried prev ->
        decision rules -> scan-tracker step
  download: only det track-ids / keep flags / refined scores (O(N) scalars)

The trunk runs ONCE per frame (descriptors are carried), affinities are
identical to the reference's recompute-both-frames scheme. Downstream
host code formats nuScenes annos from the tiny outputs.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .models.shasta import ShastaConfig, ShastaModel
from .tracker.decision import apply_decision_rules
from .tracker.pub_tracker import (
    NUSCENES_TRACKING_NAMES,
    NUSCENE_CLS_VELOCITY_ERROR,
    TRK_REF,
)
from .tracker import scan_tracker as st


def default_tracker_params(max_age: int = 4, merged: bool = True) -> st.TrackerParams:
    names = NUSCENES_TRACKING_NAMES
    return st.TrackerParams(
        gates=jnp.array([NUSCENE_CLS_VELOCITY_ERROR[n] for n in names]),
        alpha=jnp.array([TRK_REF[n]["alpha"] for n in names]),
        beta=jnp.array([TRK_REF[n]["beta"] for n in names]),
        refine=jnp.array([TRK_REF[n]["ref"] for n in names]),
        max_age=max_age,
        merged_mode=merged,
    )


class StepOutput:
    """Per-frame pipeline outputs. Det rows [0, N) are the current frame's
    detections; rows [N, 2N) are FN-propagated prev-frame boxes injected as
    synthetic detections (eval.py:141-148).

    Fields (leading (B,) axis for the batched pipeline):
      tid (2N,) int32 track id per det row; used (2N,) bool active-track
      flag; keep (N,) bool FP-elimination survivor; ref (2N,) f32 refined
      score; fn (N,) bool FN-propagation flag.

    The on-device pipelines return this LAZILY around one packed device
    array: the device->host fetch (a full RPC round trip on the tunneled
    TPU) happens on first field access, so issuing the next frame's step
    before reading these overlaps transfer with compute."""

    __slots__ = ("_packed", "_N", "_np", "_eager")

    def __init__(self, packed=None, N=None, **eager):
        self._packed = packed
        self._N = N
        self._np = None
        self._eager = eager or None

    def start_fetch(self) -> "StepOutput":
        """Begin the device->host copy of the packed outputs WITHOUT
        blocking (jax copy_to_host_async). Through the tunneled-TPU relay
        a blocking fetch serializes against device execution (~9 ms/frame
        measured round 5); calling this right after dispatching the NEXT
        frame's step lets the copy ride alongside its compute."""
        if self._packed is not None:
            try:
                self._packed.copy_to_host_async()
            except AttributeError:  # non-jax backends / eager outputs
                pass
        return self

    def _arr(self) -> np.ndarray:
        if self._np is None:
            self._np = np.asarray(self._packed)
            self._packed = None
        return self._np

    @property
    def tid(self) -> np.ndarray:
        if self._eager is not None:
            return self._eager["tid"]
        return self._arr()[..., 0, :].astype(np.int32)

    @property
    def used(self) -> np.ndarray:
        if self._eager is not None:
            return self._eager["used"]
        return self._arr()[..., 1, :] > 0.5

    @property
    def ref(self) -> np.ndarray:
        if self._eager is not None:
            return self._eager["ref"]
        return self._arr()[..., 2, :]

    @property
    def keep(self) -> np.ndarray:
        if self._eager is not None:
            return self._eager["keep"]
        return self._arr()[..., 3, : self._N] > 0.5

    @property
    def fn(self) -> np.ndarray:
        if self._eager is not None:
            return self._eager["fn"]
        return self._arr()[..., 4, : self._N] > 0.5

    @property
    def coverage_ok(self):
        """False when a Pallas kernel's window assumption was violated
        this frame (fast program only) — the caller must replay the scene
        through the safe program. Scalar, or (B,) for the batched
        pipeline."""
        if self._eager is not None:
            return self._eager.get("coverage_ok", True)
        p = self._arr()
        if p.shape[-2] < 6:
            return True
        return bool(np.all(p[..., 5, 0] > 0.5)) if p.ndim == 2 else (
            p[..., 5, 0] > 0.5
        )

    @property
    def coverage_ok_strict(self):
        """coverage_ok AND the soft flags (per-lane slot-budget truncation,
        ops/sparse.py): False means the fast program's results follow the
        documented per-lane semantics but may differ from the global-layout
        safe program — serving replays the scene on this one; benchmarks
        (identical cost either way) gate on coverage_ok alone."""
        if self._eager is not None:
            return self._eager.get(
                "coverage_ok_strict", self._eager.get("coverage_ok", True)
            )
        p = self._arr()
        if p.shape[-2] < 6:
            return True
        return bool(np.all(p[..., 5, 1] > 0.5)) if p.ndim == 2 else (
            p[..., 5, 1] > 0.5
        )


def _dets_with_fn(boxes, prev_boxes, dec, cls_id):
    """Build the tracker's det rows: kept curr dets [0, N) followed by
    FN-propagated prev boxes [N, 2N).

    Mirrors the reference exactly (eval.py:141-148): the propagated
    translation moves the prev box FORWARD by its own stored time lag
    (prev_det_boxes[0, 0, 9] — the prev frame's dt, not the current gap),
    keeps the prev velocity and raw score, and refines with
    1 - P(dead). FN rows carry no newborn flag, so like the reference's
    annos they are subject to near-track suppression in the tracker.
    """
    N = boxes.shape[0]
    fn_lag = prev_boxes[0, 9]
    fn_ct = prev_boxes[:, :2] + fn_lag * prev_boxes[:, 7:9]
    false_n = jnp.zeros((N,), bool)
    return st.FrameDets(
        ct=jnp.concatenate([boxes[:, :2], fn_ct]),
        velocity=jnp.concatenate([boxes[:, 7:9], prev_boxes[:, 7:9]]),
        cls=jnp.concatenate([
            jnp.where(dec.keep, cls_id, -1),
            jnp.where(dec.fn, cls_id, -1),
        ]).astype(jnp.int32),
        score=jnp.concatenate([boxes[:, 10], prev_boxes[:, 10]]),
        ref_score=jnp.concatenate([dec.ref_score, dec.fn_ref_score]),
        newborn=jnp.concatenate([dec.newborn, false_n]),
        dead=jnp.zeros((2 * N,), bool),
        valid=jnp.concatenate([dec.keep, dec.fn]),
    )


@dataclass
class ScenePipeline:
    """Jitted per-frame scene inference for one class model."""

    model: ShastaModel
    variables: Any
    cls_id: int  # index into NUSCENES_TRACKING_NAMES
    params: st.TrackerParams
    fp_thresh: float = 0.7
    decision_thresh: float = 0.5
    track_cap: int | None = None

    def __post_init__(self):
        cfg: ShastaConfig = self.model.cfg
        N = cfg.max_obj
        # det-major slots now hold 2N rows (curr dets + FN injections)
        self.cap = self.track_cap or 2 * N * (self.params.max_age + 1)

        def body(variables, frame, scalars, prev_boxes, prev_feat,
                 table, id_count):
            # scalars (3,) f32 [n_prev, n_curr, time_lag]: ONE host->device
            # put per step instead of three (each put is a relay RPC)
            n_prev = scalars[0].astype(jnp.int32)
            n_curr = scalars[1].astype(jnp.int32)
            time_lag = scalars[2]
            curr_feat = self.model.apply(
                variables, frame, train=False, method=ShastaModel.frame_features
            )
            m1, m2 = self.model.apply(
                variables, prev_boxes, frame["det_boxes"], prev_feat, curr_feat,
                method=ShastaModel.affinity_step,
            )
            dec = apply_decision_rules(
                m1[0], m2[0], n_prev, n_curr,
                fp_thresh=self.fp_thresh, decision_thresh=self.decision_thresh,
            )
            # Retroactive ShaSTA dead flags: dec.dead indexes the PREV
            # frame's dets, which occupy table slots 0..N-1 (det-major
            # layout) — mark those tracks so the tracker drops them when
            # unmatched near a det (eval.py:175-181 + pub_tracker.py:171).
            dead_pad = jnp.zeros((table.dead.shape[0],), bool).at[:N].set(dec.dead)
            table = table._replace(dead=table.dead | (dead_pad & table.used))
            dets = _dets_with_fn(
                frame["det_boxes"][0], prev_boxes[0], dec, self.cls_id
            )
            table, id_count, tid, used, ref = st.step_frame(
                table, id_count, dets, time_lag, self.params
            )
            return curr_feat, dec, table, id_count, tid, used, ref

        def make_step(fast: bool):
            def step(variables, frame, scalars, prev_boxes, prev_feat,
                     table, id_count):
                args = (variables, frame, scalars, prev_boxes,
                        prev_feat, table, id_count)
                if fast:
                    # conditional-free kernels: coverage flags ride the
                    # packed output; a tripped flag means this frame must
                    # be replayed through the safe program (lax.cond
                    # boundaries cost ~2.5 ms EACH on v5e — 18 of them
                    # measured 6.2 vs 8.6 frames/s end to end)
                    from .ops.pallas.window_conv import collect_coverage_flags

                    with collect_coverage_flags() as fl:
                        curr_feat, dec, table_, idc, tid, used, ref = body(*args)
                    ok = fl.all_ok()
                    ok_strict = fl.all_ok_strict()
                else:
                    curr_feat, dec, table_, idc, tid, used, ref = body(*args)
                    ok = ok_strict = jnp.bool_(True)
                # pack every host-bound output into ONE f32 array: through
                # the remote-TPU relay each device->host fetch is a round
                # trip (~30 ms); tids stay exact in f32 (< 2^24).
                # flag row: [0]=hard coverage ok, [1]=strict (incl. soft
                # truncation flags; serving replays on this one)
                flag_row = jnp.concatenate([
                    jnp.stack([ok, ok_strict]).astype(jnp.float32),
                    jnp.ones((2 * N - 2,), jnp.float32),
                ])
                packed = jnp.stack([
                    tid.astype(jnp.float32),
                    used.astype(jnp.float32),
                    ref,
                    jnp.pad(dec.keep.astype(jnp.float32), (0, N)),
                    jnp.pad(dec.fn.astype(jnp.float32), (0, N)),
                    flag_row,
                ])
                return curr_feat, packed, table_, idc
            return step

        self._step = jax.jit(make_step(True))
        self._step_safe = jax.jit(make_step(False))  # compiled on first use
        self._make_step = make_step
        self._chunks: dict = {}  # (T, fast) -> jitted scan program
        self.reset()

    def _get_chunk(self, T: int, fast: bool):
        """ONE program advancing T consecutive frames via lax.scan
        (carry = descriptors/boxes/table/ids). Amortizes the per-call
        dispatch + RPC overhead of the relay over T frames; the packed
        outputs come back as one (T, 6, 2N) fetch. Coverage flags fold
        into each step's packed row INSIDE the scan body (they are
        body-local traced values)."""
        key = (T, fast)
        if key in self._chunks:
            return self._chunks[key]
        step = self._make_step(fast)

        def chunk(variables, frames, scalars_t, prev_boxes, prev_feat,
                  table, id_count):
            def body_fn(carry, xs):
                prev_boxes, prev_feat, table, id_count = carry
                frame_t, sc = xs
                curr_feat, packed, table, id_count = step(
                    variables, frame_t, sc, prev_boxes, prev_feat, table,
                    id_count,
                )
                return (frame_t["det_boxes"], curr_feat, table, id_count), packed

            (prev_boxes, prev_feat, table, id_count), packed_t = jax.lax.scan(
                body_fn, (prev_boxes, prev_feat, table, id_count),
                (frames, scalars_t),
            )
            return prev_feat, packed_t, table, id_count

        fn = jax.jit(chunk)
        self._chunks[key] = fn
        return fn

    def step_chunk(self, frames_np: dict, n_currs, time_lags,
                   safe: bool = False) -> StepOutput:
        """Advance T consecutive frames of ONE scene in a single program
        call. frames_np values have a leading (T,) axis over the usual
        (1, ...) frame shapes; n_currs/time_lags are length-T sequences.
        Returns a StepOutput whose fields carry a leading (T,) axis
        (coverage_ok is (T,) — on any False, replay the scene through
        step_frame(..., safe=True) or a safe chunk)."""
        frames = {k: jnp.asarray(v) for k, v in frames_np.items()
                  if not isinstance(v, list)}
        T = len(n_currs)
        n_prevs = [float(self._n_prev)] + [float(n) for n in n_currs[:-1]]
        scalars_t = jnp.asarray(
            np.stack([n_prevs,
                      [float(n) for n in n_currs],
                      [float(t) for t in time_lags]], axis=1),
            jnp.float32,
        )  # (T, 3)
        fn = self._get_chunk(T, fast=not safe)
        curr_feat, packed_t, table, id_count = fn(
            self.variables, frames, scalars_t,
            self._prev_boxes, self._prev_feat, self._table, self._id_count,
        )
        self._prev_feat = curr_feat
        self._prev_boxes = frames["det_boxes"][-1]
        self._n_prev = int(n_currs[-1])
        self._table = table
        self._id_count = id_count
        return StepOutput(packed=packed_t, N=self.model.cfg.max_obj)

    def reset(self):
        cfg = self.model.cfg
        self._prev_feat = jnp.zeros((1, cfg.max_obj, cfg.num_point * cfg.share_conv_channel))
        self._prev_boxes = jnp.zeros((1, cfg.max_obj, 11))
        self._n_prev = 0  # host-side: n_curr is always host-known
        self._table = st.TrackTable.empty(self.cap)
        self._id_count = jnp.int32(0)

    def step_frame(self, frame_np: dict, n_curr: int, time_lag: float,
                   safe: bool = False) -> StepOutput:
        """frame_np: fixed-shape single-frame batch (B=1). Returns a
        StepOutput (det rows [0, N) = curr dets, [N, 2N) = FN injections).

        safe=True runs the program with in-graph XLA fallbacks (slower);
        the default fast program instead reports `coverage_ok` — callers
        replay a scene through safe=True when a frame flags (rare:
        pathological window spans or unsorted voxel tables)."""
        frame = {k: jnp.asarray(v) for k, v in frame_np.items() if not isinstance(v, list)}
        step_fn = self._step_safe if safe else self._step
        scalars = jnp.asarray(
            [float(self._n_prev), float(n_curr), float(time_lag)], jnp.float32
        )
        curr_feat, packed, table, id_count = step_fn(
            self.variables, frame, scalars,
            self._prev_boxes, self._prev_feat, self._table, self._id_count,
        )
        self._prev_feat = curr_feat
        self._prev_boxes = frame["det_boxes"]
        self._n_prev = int(n_curr)
        self._table = table
        self._id_count = id_count
        return StepOutput(packed=packed, N=self.model.cfg.max_obj)


@dataclass
class BatchedScenePipeline:
    """Scene-parallel inference: B independent scenes advance one frame per
    step in a single XLA program.

    The reference evaluates strictly sequentially at batch 1
    (eval.py:96-113); here the trunk/affinity run natively batched and the
    decision rules + tracker step are vmapped over the scene axis, so
    offline eval of the ~150-scene val split runs B scenes wide. Scenes of
    different lengths are handled with a per-scene `reset` mask (a True
    entry zeroes that lane's carried state before the step, starting the
    next scene in the slot).
    """

    model: ShastaModel
    variables: Any
    cls_id: int
    params: st.TrackerParams
    batch: int = 8
    fp_thresh: float = 0.7
    decision_thresh: float = 0.5
    track_cap: int | None = None

    def __post_init__(self):
        cfg: ShastaConfig = self.model.cfg
        N = cfg.max_obj
        B = self.batch
        self.cap = self.track_cap or 2 * N * (self.params.max_age + 1)
        F = cfg.num_point * cfg.share_conv_channel

        def one_lane(m1, m2, n_prev, n_curr, boxes, prev_boxes, table,
                     id_count, lag):
            dec = apply_decision_rules(
                m1, m2, n_prev, n_curr,
                fp_thresh=self.fp_thresh, decision_thresh=self.decision_thresh,
            )
            # retroactive dead flags onto prev-det track slots (see
            # ScenePipeline.step)
            dead_pad = jnp.zeros((table.dead.shape[0],), bool).at[:N].set(dec.dead)
            table = table._replace(dead=table.dead | (dead_pad & table.used))
            dets = _dets_with_fn(boxes, prev_boxes, dec, self.cls_id)
            table, id_count, tid, used, ref = st.step_frame(
                table, id_count, dets, lag, self.params
            )
            return table, id_count, tid, used, ref, dec.keep, dec.fn

        def body(variables, frame, scalars, prev_boxes,
                 prev_feat, tables, id_counts):
            # scalars (4, B) f32 [reset, n_prev, n_curr, lags]: ONE
            # host->device put per step instead of three relay RPCs
            reset = scalars[0] > 0.5
            n_prev = scalars[1].astype(jnp.int32)
            n_curr = scalars[2].astype(jnp.int32)
            lags = scalars[3]
            # zero carried state for lanes starting a new scene
            rz = reset[:, None, None]
            prev_feat = jnp.where(rz, 0.0, prev_feat)
            prev_boxes = jnp.where(rz, 0.0, prev_boxes)
            n_prev = jnp.where(reset, 0, n_prev)
            tables = jax.tree.map(
                lambda x: jnp.where(
                    reset.reshape((B,) + (1,) * (x.ndim - 1)),
                    jnp.zeros_like(x), x,
                ),
                tables,
            )
            curr_feat = self.model.apply(
                variables, frame, train=False, method=ShastaModel.frame_features
            )
            m1, m2 = self.model.apply(
                variables, prev_boxes, frame["det_boxes"], prev_feat, curr_feat,
                method=ShastaModel.affinity_step,
            )
            tables, id_counts, tid, used, ref, keep, fn = jax.vmap(one_lane)(
                m1, m2, n_prev, n_curr, frame["det_boxes"], prev_boxes,
                tables, id_counts, lags,
            )
            return curr_feat, tables, id_counts, tid, used, ref, keep, fn

        def make_step(fast: bool):
            def step(*args):
                if fast:
                    from .ops.pallas.window_conv import collect_coverage_flags

                    with collect_coverage_flags() as fl:
                        (curr_feat, tables, id_counts, tid, used, ref, keep,
                         fn) = body(*args)
                    ok = fl.all_ok()
                    ok_strict = fl.all_ok_strict()
                else:
                    (curr_feat, tables, id_counts, tid, used, ref, keep,
                     fn) = body(*args)
                    ok = ok_strict = jnp.bool_(True)
                # one packed host-bound array (see ScenePipeline.step);
                # flag row cols: [0]=hard ok, [1]=strict ok (incl. soft
                # per-lane-truncation flags)
                flag_row = jnp.concatenate([
                    jnp.stack([ok, ok_strict]).astype(jnp.float32),
                    jnp.ones((2 * N - 2,), jnp.float32),
                ])
                packed = jnp.stack([
                    tid.astype(jnp.float32),
                    used.astype(jnp.float32),
                    ref,
                    jnp.pad(keep.astype(jnp.float32), ((0, 0), (0, N))),
                    jnp.pad(fn.astype(jnp.float32), ((0, 0), (0, N))),
                    jnp.broadcast_to(flag_row[None], (B, 2 * N)),
                ], axis=1)  # (B, 6, 2N)
                return curr_feat, tables, id_counts, packed
            return step

        self._step = jax.jit(make_step(True))
        self._step_safe = jax.jit(make_step(False))  # compiled on first use
        self._make_step = make_step
        self._chunks: dict = {}  # (T, fast) -> jitted scan program
        self.reset()

    def _get_chunk(self, T: int, fast: bool):
        """lax.scan of T batched steps per program call (see
        ScenePipeline._get_chunk): B lanes x T frames = B*T frames per
        dispatch/fetch round trip."""
        key = (T, fast)
        if key in self._chunks:
            return self._chunks[key]
        step = self._make_step(fast)

        def chunk(variables, frames, scalars_t, prev_boxes, prev_feat,
                  tables, id_counts):
            def body_fn(carry, xs):
                prev_boxes, prev_feat, tables, id_counts = carry
                frame_t, sc = xs
                curr_feat, tables, id_counts, packed = step(
                    variables, frame_t, sc, prev_boxes, prev_feat, tables,
                    id_counts,
                )
                return (
                    (frame_t["det_boxes"], curr_feat, tables, id_counts),
                    packed,
                )

            (prev_boxes, prev_feat, tables, id_counts), packed_t = jax.lax.scan(
                body_fn, (prev_boxes, prev_feat, tables, id_counts),
                (frames, scalars_t),
            )
            return prev_feat, tables, id_counts, packed_t

        fn = jax.jit(chunk)
        self._chunks[key] = fn
        return fn

    def step_chunk(self, frames_np: dict, n_currs, resets, time_lags,
                   safe: bool = False) -> StepOutput:
        """Advance all B lanes through T frames in one program call.

        frames_np values: (T, B, ...); n_currs/resets/time_lags: (T, B).
        Returns a StepOutput with leading (T, B) axes (coverage_ok is
        (T, B))."""
        frames = {k: jnp.asarray(v) for k, v in frames_np.items()
                  if not isinstance(v, list)}
        n_currs = np.asarray(n_currs, np.float32)
        resets = np.asarray(resets, np.float32)
        lags = np.asarray(time_lags, np.float32)
        T = n_currs.shape[0]
        # per-step n_prev: previous step's n_curr (first step: carried)
        n_prevs = np.concatenate(
            [self._n_prev.astype(np.float32)[None], n_currs[:-1]], axis=0
        )
        scalars_t = jnp.asarray(
            np.stack([resets, n_prevs, n_currs, lags], axis=1)
        )  # (T, 4, B)
        fn = self._get_chunk(T, fast=not safe)
        curr_feat, tables, id_counts, packed_t = fn(
            self.variables, frames, scalars_t, self._prev_boxes,
            self._prev_feat, self._tables, self._id_counts,
        )
        self._prev_feat = curr_feat
        self._prev_boxes = frames["det_boxes"][-1]
        self._n_prev = np.asarray(n_currs[-1], np.int32)
        self._tables = tables
        self._id_counts = id_counts
        return StepOutput(packed=packed_t, N=self.model.cfg.max_obj)

    def reset(self):
        cfg = self.model.cfg
        B = self.batch
        self._prev_feat = jnp.zeros(
            (B, cfg.max_obj, cfg.num_point * cfg.share_conv_channel)
        )
        self._prev_boxes = jnp.zeros((B, cfg.max_obj, 11))
        self._n_prev = np.zeros((B,), np.int32)  # host-side
        self._tables = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape).copy(),
            st.TrackTable.empty(self.cap),
        )
        # large disjoint id offsets keep ids unique across lanes
        self._id_counts = jnp.arange(self.batch, dtype=jnp.int32) * 1_000_000

    def step_frames(self, frame_np: dict, n_curr, reset, time_lags,
                    safe: bool = False):
        """Advance all B scene lanes by one frame.

        frame_np: batched voxel/box arrays (B, ...); n_curr (B,) real det
        counts; reset (B,) bool new-scene flags; time_lags (B,).
        Returns a StepOutput of batched arrays: tid/used/ref (B, 2N) with
        FN rows at [N, 2N), keep/fn (B, N). See ScenePipeline.step_frame
        for the safe/coverage_ok contract."""
        frame = {k: jnp.asarray(v) for k, v in frame_np.items() if not isinstance(v, list)}
        step_fn = self._step_safe if safe else self._step
        scalars = jnp.asarray(np.stack([
            np.asarray(reset, np.float32),
            self._n_prev.astype(np.float32),
            np.asarray(n_curr, np.float32),
            np.asarray(time_lags, np.float32),
        ]))
        curr_feat, tables, id_counts, packed = step_fn(
            self.variables, frame, scalars, self._prev_boxes, self._prev_feat,
            self._tables, self._id_counts,
        )
        self._prev_feat = curr_feat
        self._prev_boxes = frame["det_boxes"]
        self._n_prev = np.asarray(n_curr, np.int32)
        self._tables = tables
        self._id_counts = id_counts
        return StepOutput(packed=packed, N=self.model.cfg.max_obj)


@dataclass
class MultiClassScenePipeline:
    """Shared-trunk 7-class inference, fully vmapped over classes.

    The reference evaluates 7 per-class models independently
    (official_val.sh), recomputing the BEV trunk 14x per frame pair. All 7
    released models share the SAME frozen trunk (bev_map.pth,
    configs/nusc/*.py:22), so here the trunk runs ONCE per frame, and the
    7 class heads run as ONE vmapped head over a (C,) class axis:

    - per-class affinity params (different max_obj per config) are
      transformed to a uniform width with the EXACT padding transform of
      shasta_tpu/multiclass.py (zero-scattered params + n_real masking);
    - BEV sampling / decision rules / tracker steps are vmapped;
    - each class tracks in its own fixed-capacity table (the merged
      tracker's distance matrix is block-diagonal by class — cross-class
      matches are gated off — so per-class tables reproduce
      PubTrackerMerged exactly up to the shared-CAP overflow edge case,
      and per-class caps here are at least as large);
    - new-track ids are assigned per class RELATIVELY and rebased by the
      global count + preceding classes' new-track counts, reproducing the
      merged det-order numbering (pub_tracker_merged.py semantics).

    Replaces the round-4 serialized per-class loop, whose 7 sequential
    head subgraphs + one 920-row merged greedy scan dominated the fused
    program at 80.5 ms/frame (PERF_NOTES): the vmapped tracker scans
    2*N_max=180 rows instead of 920.

    class_heads: {name: (model, variables)} — `variables` may share the
    trunk subtree; only the affinity parts differ per class. trunk_key:
    which class's variables provide the shared trunk + shared conv.
    """

    class_heads: dict
    trunk_key: str = "car"
    params: st.TrackerParams = None
    fp_thresh: float = 0.7
    decision_thresh: float = 0.5

    def __post_init__(self):
        from .models.affinity import AffinityNet
        from .multiclass import stack_class_heads

        self.params = self.params or default_tracker_params(max_age=4)
        self._names = tuple(n for n in NUSCENES_TRACKING_NAMES
                            if n in self.class_heads)
        cfgs = [self.class_heads[n][0].cfg for n in self._names]
        self.n_max = max(c.max_obj for c in cfgs)
        c0 = cfgs[0]
        assert all((c.pc_start, c.voxel_size, c.out_stride,
                    c.num_point, c.share_conv_channel)
                   == (c0.pc_start, c0.voxel_size, c0.out_stride,
                       c0.num_point, c0.share_conv_channel) for c in cfgs)
        # Test seam: duck-typed models without real params (empty
        # variables) keep their own affinity_step, vmapped directly —
        # only uniform max_obj is supported there.
        self._crafted = not all(
            isinstance(v, dict) and "params" in v
            for (_, v) in self.class_heads.values())
        if self._crafted:
            assert all(c.max_obj == self.n_max for c in cfgs), \
                "crafted heads require uniform max_obj"
            self._stacked = jnp.zeros((len(self._names),))
            self._n_real = jnp.full((len(self._names),), self.n_max,
                                    jnp.int32)
        else:
            self._stacked, self._n_real = stack_class_heads(
                self.class_heads, self._names, self.n_max)
        self._cls_ids = jnp.asarray(
            [NUSCENES_TRACKING_NAMES.index(n) for n in self._names],
            jnp.int32)
        self._head = AffinityNet(
            max_obj=self.n_max, num_feats=c0.num_feats,
            num_point=c0.num_point,
            share_conv_channel=c0.share_conv_channel)
        self._F = c0.num_point * c0.share_conv_channel
        self.cap = 2 * self.n_max * (self.params.max_age + 1)
        self._fused: dict = {}
        self.reset()

    def _get_fused(self, fast: bool):
        """ONE jitted program: trunk + vmapped heads + vmapped per-class
        tracker steps + global id rebase. Cached per fast/safe variant."""
        if fast in self._fused:
            return self._fused[fast]
        trunk_model, _ = self.class_heads[self.trunk_key]
        C = len(self._names)
        N = self.n_max
        cfg0 = self.class_heads[self._names[0]][0].cfg

        def body(trunk_vars, stacked, frame, boxes_st, prev_feats,
                 prev_boxes_st, scalars, tables, id_count):
            from .core.bilinear import sample_bev_features
            from .core.boxes import box_points_5

            n_prev = scalars[0:C].astype(jnp.int32)
            n_curr = scalars[C:2 * C].astype(jnp.int32)
            skip = scalars[2 * C:3 * C] > 0.5
            lag = scalars[3 * C]
            bev = trunk_model.apply(
                trunk_vars, frame, train=False, method=ShastaModel.bev_single
            )
            pts = jax.vmap(box_points_5)(boxes_st[..., :7])  # (C,1,N,5,3)
            curr_feats = jax.vmap(
                sample_bev_features, in_axes=(None, 0, None, None, None)
            )(bev, pts, cfg0.pc_start, cfg0.voxel_size, cfg0.out_stride)

            def head_one(p, pb, cb, pf, cf, nr):
                return self._head.apply(
                    {"params": p}, pb[:, :, :7], cb[:, :, :7],
                    cb[:, :, 7:9], cb[:, :, 9:10],
                    pf.astype(jnp.float32), cf.astype(jnp.float32),
                    n_real=nr)

            # stacked params come in as an ARGUMENT: the aug_shape layers
            # are ~50 MB/class at max_obj=90 — baking them as jit
            # constants would bloat the program by >1 GB
            if self._crafted:
                mdl = self.class_heads[self._names[0]][0]
                m1, m2 = jax.vmap(
                    lambda pb, cb, pf, cf: mdl.apply(
                        {}, pb, cb, pf, cf,
                        method=ShastaModel.affinity_step)
                )(prev_boxes_st, boxes_st, prev_feats, curr_feats)
            else:
                m1, m2 = jax.vmap(head_one)(
                    stacked, prev_boxes_st, boxes_st, prev_feats,
                    curr_feats, self._n_real)

            dec = jax.vmap(
                lambda a, b, np_, nc: apply_decision_rules(
                    a, b, np_, nc, fp_thresh=self.fp_thresh,
                    decision_thresh=self.decision_thresh)
            )(m1[:, 0], m2[:, 0], n_prev, n_curr)
            # retroactive dead flags: prev dets occupy slots [0, N) of
            # their class table (det-major layout)
            tables0 = tables
            dead_pad = jnp.zeros((C, self.cap), bool).at[:, :N].set(dec.dead)
            tables = tables._replace(
                dead=tables.dead | (dead_pad & tables.used))
            dets = jax.vmap(_dets_with_fn)(
                boxes_st[:, 0], prev_boxes_st[:, 0], dec, self._cls_ids)
            tables2, n_new, tid, used, ref, is_new = jax.vmap(
                st.step_frame_core, in_axes=(0, None, 0, None, None)
            )(tables, jnp.int32(0), dets, lag, self.params)
            # freeze lanes whose class was not provided this frame (the
            # per-class sequential API semantics: absent != zero dets) —
            # against the PRE-step, pre-dead-flag state
            tables = jax.tree.map(
                lambda new, old: jnp.where(
                    skip.reshape((C,) + (1,) * (new.ndim - 1)), old, new),
                tables2, tables0)
            n_new = jnp.where(skip, 0, n_new)
            # global det-order id rebase (class-major, like the merged
            # tracker's single det row stream)
            base = id_count + jnp.concatenate(
                [jnp.zeros((1,), jnp.int32), jnp.cumsum(n_new)[:-1]])
            renew = is_new & ~skip[:, None]
            tid = jnp.where(renew, tid + base[:, None], tid)
            tables = tables._replace(tid=jnp.where(
                jnp.zeros((C, self.cap), bool).at[:, :2 * N].set(renew),
                tables.tid + base[:, None], tables.tid))
            id_count = id_count + jnp.sum(n_new)
            return (curr_feats, tables, id_count, tid, used, ref,
                    dec.keep, dec.fn)

        def step(trunk_vars, stacked_unused, frame, boxes_st, prev_feats,
                 prev_boxes_st, scalars, tables, id_count):
            args = (trunk_vars, stacked_unused, frame, boxes_st, prev_feats,
                    prev_boxes_st, scalars, tables, id_count)
            if fast:
                from .ops.pallas.window_conv import collect_coverage_flags

                with collect_coverage_flags() as fl:
                    (curr_feats, tables_, idc, tid, used, ref, keep,
                     fn_) = body(*args)
                ok = fl.all_ok()
                ok_strict = fl.all_ok_strict()
            else:
                (curr_feats, tables_, idc, tid, used, ref, keep,
                 fn_) = body(*args)
                ok = ok_strict = jnp.bool_(True)
            # ONE packed host-bound f32 array, uniform (C, N)-padded
            # layout: tid/used/ref (C*2N each), keep/fn (C*N each), flags
            packed = jnp.concatenate([
                tid.astype(jnp.float32).reshape(-1),
                used.astype(jnp.float32).reshape(-1),
                ref.reshape(-1),
                keep.astype(jnp.float32).reshape(-1),
                fn_.astype(jnp.float32).reshape(-1),
                ok.astype(jnp.float32)[None],
                ok_strict.astype(jnp.float32)[None],
            ])
            return curr_feats, tables_, idc, packed

        fn = jax.jit(step)
        self._fused[fast] = fn
        return fn

    def reset(self):
        C = len(self._names)
        self._prev_feat = jnp.zeros((C, 1, self.n_max, self._F))
        self._prev_boxes = jnp.zeros((C, 1, self.n_max, 11))
        self._n_prev = np.zeros((C,), np.int32)  # host-side
        self._tables = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (C,) + x.shape).copy(),
            st.TrackTable.empty(self.cap))
        self._id_count = jnp.int32(0)

    def dispatch_frame(self, frame_np: dict, class_boxes: dict,
                       time_lag: float, safe: bool = False):
        """Enqueue one frame's fused program; returns (packed_handle,
        names) WITHOUT forcing the device->host fetch. Pair with
        unpack_frame — fetching frame t-1's packed array while frame t
        computes overlaps the relay round trip with compute.

        NOTE: tracker state (tables, id counter, per-class prev_*) has
        already advanced when this returns; if unpack_frame later
        surfaces coverage_ok=False, mid-scene recovery is impossible —
        reset() and replay the WHOLE scene through safe=True (the same
        contract ScenePipeline documents on step_frame)."""
        frame = {k: jnp.asarray(v) for k, v in frame_np.items()
                 if not isinstance(v, list)}
        names = tuple(n for n in self._names if n in class_boxes)
        C = len(self._names)
        N = self.n_max
        boxes_np = np.zeros((C, 1, N, 11), np.float32)
        n_curr = np.zeros((C,), np.float32)
        skip = np.ones((C,), np.float32)
        for i, n in enumerate(self._names):
            if n in class_boxes:
                b, nc = class_boxes[n]
                boxes_np[i, :, : b.shape[1]] = np.asarray(b, np.float32)
                n_curr[i] = float(nc)
                skip[i] = 0.0
        scalars = jnp.asarray(np.concatenate([
            self._n_prev.astype(np.float32), n_curr, skip,
            [float(time_lag)]]))
        fn = self._get_fused(fast=not safe)
        boxes_st = jnp.asarray(boxes_np)
        curr_feats, self._tables, self._id_count, packed = fn(
            self.class_heads[self.trunk_key][1], self._stacked, frame,
            boxes_st, self._prev_feat, self._prev_boxes, scalars,
            self._tables, self._id_count,
        )
        # freeze host-side state for absent classes
        sk = skip.astype(bool)
        self._prev_feat = jnp.where(
            jnp.asarray(sk)[:, None, None, None], self._prev_feat,
            curr_feats)
        self._prev_boxes = jnp.where(
            jnp.asarray(sk)[:, None, None, None], self._prev_boxes,
            boxes_st)
        self._n_prev = np.where(sk, self._n_prev, n_curr.astype(np.int32))
        return packed, names

    def step_frame(self, frame_np: dict, class_boxes: dict, time_lag: float,
                   safe: bool = False):
        """frame_np: voxel arrays (B=1), optionally with plan_* keys
        (host sparse-conv plans). class_boxes: {name: (det_boxes11
        (1,N_c,11), n_curr)}. Returns {name: StepOutput} with per-class
        tid/used/ref of length 2*N_c (FN rows at [N_c, 2*N_c)).

        The whole frame (trunk + vmapped heads + vmapped tracker) runs as
        ONE jitted program with ONE scalar put and ONE packed fetch. Each
        StepOutput carries coverage_ok; when any is False the caller
        replays the scene with safe=True (same contract as
        ScenePipeline)."""
        packed, names = self.dispatch_frame(frame_np, class_boxes, time_lag,
                                            safe=safe)
        return self.unpack_frame(packed, names)

    def unpack_frame(self, packed, names):
        """Fetch + decode one dispatch_frame result into {name: StepOutput}.

        The packed layout is (C, N_max)-padded class-major; per-class
        outputs are re-sliced to the class's own 2*N_c rows (curr rows
        [0, N_c) + FN rows [N_max, N_max + N_c))."""
        p = np.asarray(packed)
        C = len(self._names)
        N = self.n_max
        tid_a = p[: C * 2 * N].reshape(C, 2 * N).astype(np.int32)
        used_a = p[C * 2 * N: 2 * C * 2 * N].reshape(C, 2 * N) > 0.5
        ref_a = p[2 * C * 2 * N: 3 * C * 2 * N].reshape(C, 2 * N)
        off = 3 * C * 2 * N
        keep_a = p[off: off + C * N].reshape(C, N) > 0.5
        fn_a = p[off + C * N: off + 2 * C * N].reshape(C, N) > 0.5
        off += 2 * C * N
        ok = bool(p[off] > 0.5)
        ok_strict = bool(p[off + 1] > 0.5)
        out = {}
        for i, name in enumerate(self._names):
            if name not in names:
                continue
            n_c = self.class_heads[name][0].cfg.max_obj

            def two(a, i=i, n_c=n_c):
                return np.concatenate([a[i, :n_c], a[i, N: N + n_c]])

            out[name] = StepOutput(
                tid=two(tid_a), used=two(used_a), ref=two(ref_a),
                keep=keep_a[i, :n_c], fn=fn_a[i, :n_c],
                coverage_ok=ok, coverage_ok_strict=ok_strict,
            )
        return out


def track_scene_dataset(pipeline: ScenePipeline, dataset, frame_lags=None,
                        progress: bool = False,
                        use_host_plans: bool = True) -> dict:
    """Run the pipeline over a dataset of ordered frames; returns
    tracking_result-style {token: [annos]} using the datasets' cls dicts.

    use_host_plans (Pallas serving only): build each frame's sparse-conv
    plans on the host (shasta_tpu/plans.py — C++ runtime when available)
    and feed the position-fed block kernels; frames whose plans don't
    fit their windows (planner ok=False) fall back to the in-graph
    program for that frame."""
    results: dict[str, list] = {}
    it = range(len(dataset))
    if progress:
        try:
            from tqdm import tqdm

            it = tqdm(it)
        except ImportError:
            pass
    from .data.nuscenes import collate

    N = pipeline.model.cfg.max_obj

    def anno_from(src: dict, token: str, tid: int, score: float,
                  translation=None) -> dict:
        return {
            "sample_token": token,
            "translation": list(translation if translation is not None
                                else src["translation"]),
            "size": list(src["size"]),
            "rotation": list(src["rotation"]),
            "velocity": list(src["velocity"]),
            "tracking_id": str(int(tid)),
            "tracking_name": src["detection_name"],
            "tracking_score": float(score),
            "attribute_name": src.get("attribute_name"),
        }

    plans_on = use_host_plans and pipeline.model.cfg.use_pallas_gather

    def step(sample, safe: bool):
        batch = collate([sample])
        n_curr = len(sample["cls_det_boxes"])
        lag = float(sample["det_boxes"][0, 9]) if n_curr else 0.5
        if plans_on and not safe:
            from . import plans as hp

            fp = hp.frame_plans(batch["coordinates"][0],
                                batch["voxels_valid"][0],
                                pipeline.model.cfg)
            if fp.ok:
                batch = hp.attach_plans(batch, fp)
        return pipeline.step_frame(batch, n_curr, lag, safe=safe)

    def format_out(sample, out):
        n_curr = len(sample["cls_det_boxes"])
        annos = []
        for k in range(n_curr):
            if not out.used[k]:
                continue
            annos.append(anno_from(
                sample["cls_det_boxes"][k], sample["token"],
                out.tid[k], out.ref[k],
            ))
        # FN-propagated prev boxes tracked this frame (eval.py:141-148):
        # translation moved forward by the prev frame's stored dt.
        prev_cls = sample.get("prev_cls_det_boxes") or []
        if prev_cls:
            fn_lag = float(sample["prev_det_boxes"][0, 9])
            for n in range(len(prev_cls)):
                if not (out.fn[n] and out.used[N + n]):
                    continue
                src = prev_cls[n]
                tr = list(src["translation"])
                tr[0] += fn_lag * src["velocity"][0]
                tr[1] += fn_lag * src["velocity"][1]
                annos.append(anno_from(
                    src, sample["token"], out.tid[N + n], out.ref[N + n],
                    translation=tr,
                ))
        results[sample["token"]] = annos
        # strict: replay also on soft per-lane-truncation divergence
        return bool(np.all(out.coverage_ok_strict))

    def replay_scene(scene_samples):
        """A frame tripped a Pallas coverage flag: rerun the whole scene
        through the safe program (in-graph XLA fallbacks)."""
        pipeline.reset()
        for s in scene_samples:
            format_out(s, step(s, safe=True))

    # Deferred formatting, TWO frames deep: frame i's packed fetch starts
    # asynchronously (StepOutput.start_fetch) right after frame i+1's
    # step is issued and is consumed only after frame i+2's — through the
    # tunneled-TPU relay a blocking fetch serializes against device
    # execution (~2 frames of round-trip latency, measured round 5:
    # 34.8 -> 45.6 f/s on the bench loop).
    from collections import deque

    DEPTH = 2
    pipeline.reset()
    scene: list = []
    scene_ok = True
    pending: deque = deque()

    def drain(all_: bool = False):
        nonlocal scene_ok
        while pending and (all_ or len(pending) > DEPTH):
            scene_ok &= format_out(*pending.popleft())

    for i in it:
        sample = dataset[i]
        if not sample["prev_token"]:
            drain(all_=True)
            if not scene_ok:
                replay_scene(scene)
            pipeline.reset()
            scene, scene_ok = [], True
        scene.append(sample)
        out = step(sample, safe=False)
        out.start_fetch()
        pending.append((sample, out))
        drain()
    drain(all_=True)
    if not scene_ok:
        replay_scene(scene)
    return {"results": results, "meta": {
        "use_camera": False, "use_lidar": True, "use_radar": False,
        "use_map": False, "use_external": False,
    }}
