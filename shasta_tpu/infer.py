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
    """Shared-trunk 7-class inference.

    The reference evaluates 7 per-class models independently
    (official_val.sh), recomputing the BEV trunk 14x per frame pair. All 7
    released models share the SAME frozen trunk (bev_map.pth,
    configs/nusc/*.py:22), so here the trunk runs ONCE per frame; each
    class's affinity head (its own converted checkpoint, its own max_obj)
    samples descriptors from the shared 64-channel BEV map, and one merged
    multi-class scan-tracker table tracks everything on device.

    class_heads: {name: (model, variables)} — `variables` may share the
    trunk subtree; only the affinity/shared-conv parts differ per class.
    trunk_key: which class's variables provide the shared trunk + shared
    conv (they are identical when converted from the reference release).
    """

    class_heads: dict
    trunk_key: str = "car"
    params: st.TrackerParams = None
    fp_thresh: float = 0.7
    decision_thresh: float = 0.5

    def __post_init__(self):
        self.params = self.params or default_tracker_params(max_age=4)
        # ONE fused program per active-class subset (see _get_fused). The
        # per-head introspection programs this class once carried were
        # deleted per the standing condition (NEXT_STEPS round 2) after
        # the fused program's on-chip record landed: 80.5 ms/frame for the
        # release 7-class workload, 143 s compile (PERF_NOTES round 4,
        # tools/measure_multiclass.py).
        self._fused: dict = {}
        self.reset()

    def _get_fused(self, names: tuple, fast: bool):
        """ONE jitted program for trunk + every class head + the merged
        tracker step. The per-head path costs ~10 dispatches and 7 scalar
        puts per frame — each a relay round trip on tunneled TPUs; fusing
        collapses them into one dispatch + one scalar put. Cached per
        active-class subset (stable across a scene) and fast/safe variant.
        """
        key = (names, fast)
        if key in self._fused:
            return self._fused[key]
        trunk_model, _ = self.class_heads[self.trunk_key]
        models = {n: self.class_heads[n][0] for n in names}
        C = len(names)
        cap = self._table.used.shape[0]

        def body(trunk_vars, class_vars, frame, boxes_d, prev_feats,
                 prev_boxes_d, scalars, table, id_count):
            from .core.bilinear import sample_bev_features
            from .core.boxes import box_points_5

            bev = trunk_model.apply(
                trunk_vars, frame, train=False, method=ShastaModel.bev_single
            )
            lag = scalars[2 * C]
            det_parts, keeps, fns, curr_feats = [], [], [], {}
            dead_pad = jnp.zeros((cap,), bool)
            offset = 0
            for i, name in enumerate(names):
                model = models[name]
                cfg = model.cfg
                boxes = boxes_d[name]
                prev_boxes = prev_boxes_d[name]
                n_prev = scalars[i].astype(jnp.int32)
                n_curr = scalars[C + i].astype(jnp.int32)
                pts = box_points_5(boxes[:, :, :7])
                curr_feat = sample_bev_features(
                    bev, pts, cfg.pc_start, cfg.voxel_size, cfg.out_stride
                )
                m1, m2 = model.apply(
                    class_vars[name], prev_boxes, boxes, prev_feats[name],
                    curr_feat, method=ShastaModel.affinity_step,
                )
                dec = apply_decision_rules(
                    m1[0], m2[0], n_prev, n_curr,
                    fp_thresh=self.fp_thresh,
                    decision_thresh=self.decision_thresh,
                )
                # retroactive dead flags for this class's prev-det slots
                dead_pad = dead_pad.at[offset: offset + cfg.max_obj].set(dec.dead)
                cid = NUSCENES_TRACKING_NAMES.index(name)
                det_parts.append(_dets_with_fn(boxes[0], prev_boxes[0], dec, cid))
                keeps.append(dec.keep)
                fns.append(dec.fn)
                curr_feats[name] = curr_feat
                offset += 2 * cfg.max_obj
            table = table._replace(dead=table.dead | (dead_pad & table.used))
            dets = st.FrameDets(*[
                jnp.concatenate([getattr(p, f) for p in det_parts], axis=0)
                for f in st.FrameDets._fields
            ])
            table, id_count, tid, used, ref = st.step_frame(
                table, id_count, dets, lag, self.params
            )
            return curr_feats, table, id_count, tid, used, ref, keeps, fns

        def step(trunk_vars, class_vars, frame, boxes_d, prev_feats,
                 prev_boxes_d, scalars, table, id_count):
            args = (trunk_vars, class_vars, frame, boxes_d, prev_feats,
                    prev_boxes_d, scalars, table, id_count)
            if fast:
                from .ops.pallas.window_conv import collect_coverage_flags

                with collect_coverage_flags() as fl:
                    (curr_feats, table_, idc, tid, used, ref, keeps,
                     fns) = body(*args)
                ok = fl.all_ok()
                ok_strict = fl.all_ok_strict()
            else:
                (curr_feats, table_, idc, tid, used, ref, keeps,
                 fns) = body(*args)
                ok = ok_strict = jnp.bool_(True)
            # ONE packed host-bound array: tid/used/ref (class-major 2N_c
            # spans) + per-class keep + fn + the [hard, strict] flags
            packed = jnp.concatenate(
                [tid.astype(jnp.float32), used.astype(jnp.float32), ref]
                + [k.astype(jnp.float32) for k in keeps]
                + [f.astype(jnp.float32) for f in fns]
                + [ok.astype(jnp.float32)[None],
                   ok_strict.astype(jnp.float32)[None]]
            )
            return curr_feats, table_, idc, packed

        fn = jax.jit(step)
        self._fused[key] = fn
        return fn

    def reset(self):
        self._state = {}
        for name, (model, _) in self.class_heads.items():
            cfg = model.cfg
            self._state[name] = {
                "prev_feat": jnp.zeros((1, cfg.max_obj, cfg.num_point * cfg.share_conv_channel)),
                "prev_boxes": jnp.zeros((1, cfg.max_obj, 11)),
                "n_prev": 0,  # host-side (goes into the fused scalar put)
            }
        cap = sum(2 * m.cfg.max_obj for m, _ in self.class_heads.values())
        self._table = st.TrackTable.empty(cap * (self.params.max_age + 1))
        self._id_count = jnp.int32(0)

    def dispatch_frame(self, frame_np: dict, class_boxes: dict,
                       time_lag: float, safe: bool = False):
        """Enqueue one frame's fused program; returns (packed_handle,
        names) WITHOUT forcing the device->host fetch. Pair with
        unpack_frame — fetching frame t-1's packed array while frame t
        computes overlaps the relay round trip with compute, exactly like
        ScenePipeline's deferred-fetch eval loop."""
        frame = {k: jnp.asarray(v) for k, v in frame_np.items() if not isinstance(v, list)}
        names = tuple(
            n for n in NUSCENES_TRACKING_NAMES
            if n in self.class_heads and n in class_boxes
        )
        fn = self._get_fused(names, fast=not safe)
        # one (2C+1,) f32 put: per-class n_prev, n_curr, then the lag
        scalars = jnp.asarray(
            [float(self._state[n]["n_prev"]) for n in names]
            + [float(class_boxes[n][1]) for n in names]
            + [float(time_lag)], jnp.float32,
        )
        boxes_d = {n: jnp.asarray(class_boxes[n][0]) for n in names}
        class_vars = {n: self.class_heads[n][1] for n in names}
        prev_feats = {n: self._state[n]["prev_feat"] for n in names}
        prev_boxes_d = {n: self._state[n]["prev_boxes"] for n in names}
        trunk_vars = self.class_heads[self.trunk_key][1]
        curr_feats, self._table, self._id_count, packed = fn(
            trunk_vars, class_vars, frame, boxes_d, prev_feats,
            prev_boxes_d, scalars, self._table, self._id_count,
        )
        for n in names:
            s = self._state[n]
            s["prev_feat"] = curr_feats[n]
            s["prev_boxes"] = boxes_d[n]
            s["n_prev"] = int(class_boxes[n][1])
        return packed, names

    def step_frame(self, frame_np: dict, class_boxes: dict, time_lag: float,
                   safe: bool = False):
        """frame_np: voxel arrays (B=1). class_boxes: {name: (det_boxes11
        (1,N_c,11), n_curr)}. Returns {name: StepOutput} with per-class
        tid/used/ref of length 2*N_c (FN rows at [N_c, 2*N_c)).

        The whole frame (trunk + every class head + merged tracker step)
        runs as ONE jitted program with ONE scalar put and ONE packed
        output fetch. Each StepOutput carries coverage_ok; when any is
        False the caller replays the scene with safe=True (same contract
        as ScenePipeline)."""
        packed, names = self.dispatch_frame(frame_np, class_boxes, time_lag,
                                            safe=safe)
        return self.unpack_frame(packed, names)

    def unpack_frame(self, packed, names):
        """Fetch + decode one dispatch_frame result into {name: StepOutput}."""
        p = np.asarray(packed)
        L = sum(2 * self.class_heads[n][0].cfg.max_obj for n in names)
        tid_np, used_np, ref_np = (
            p[:L].astype(np.int32), p[L:2 * L] > 0.5, p[2 * L:3 * L]
        )
        off = 3 * L
        kf: dict[str, list] = {}
        for half in range(2):  # keeps then fns, class order
            for name in names:
                n_c = self.class_heads[name][0].cfg.max_obj
                kf.setdefault(name, [None, None])[half] = p[off:off + n_c] > 0.5
                off += n_c
        ok = bool(p[off] > 0.5)
        ok_strict = bool(p[off + 1] > 0.5) if off + 1 < len(p) else ok
        out = {}
        lo = 0
        for name in names:
            hi = lo + 2 * self.class_heads[name][0].cfg.max_obj
            out[name] = StepOutput(
                tid=tid_np[lo:hi], used=used_np[lo:hi],
                keep=kf[name][0], ref=ref_np[lo:hi],
                fn=kf[name][1], coverage_ok=ok,
                coverage_ok_strict=ok_strict,
            )
            lo = hi
        return out


def track_scene_dataset(pipeline: ScenePipeline, dataset, frame_lags=None,
                        progress: bool = False) -> dict:
    """Run the pipeline over a dataset of ordered frames; returns
    tracking_result-style {token: [annos]} using the datasets' cls dicts."""
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

    def step(sample, safe: bool):
        batch = collate([sample])
        n_curr = len(sample["cls_det_boxes"])
        lag = float(sample["det_boxes"][0, 9]) if n_curr else 0.5
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

    # Deferred formatting: frame i's packed fetch + host anno assembly
    # happen AFTER frame i+1's step is issued, overlapping the RPC round
    # trip with device compute (the step only consumes device-side carry).
    pipeline.reset()
    scene: list = []
    scene_ok = True
    pending: tuple | None = None
    for i in it:
        sample = dataset[i]
        if not sample["prev_token"]:
            if pending is not None:
                scene_ok &= format_out(*pending)
                pending = None
            if not scene_ok:
                replay_scene(scene)
            pipeline.reset()
            scene, scene_ok = [], True
        scene.append(sample)
        out = step(sample, safe=False)
        if pending is not None:
            scene_ok &= format_out(*pending)
        pending = (sample, out)
    if pending is not None:
        scene_ok &= format_out(*pending)
    if not scene_ok:
        replay_scene(scene)
    return {"results": results, "meta": {
        "use_camera": False, "use_lidar": True, "use_radar": False,
        "use_map": False, "use_external": False,
    }}
