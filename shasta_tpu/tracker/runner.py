"""Affinity-eval + tracking runners shared by the tools CLIs.

Behavioral reference: tools/nusc_shasta/eval.py:61-195 (per-pair affinity
eval loop incl. FN propagation and retroactive dead marking),
eval.py:197-305 (save_first_frame / track), validate.py:24-301.

The decision rules themselves run vectorized on-device
(shasta_tpu.tracker.decision); this module does the host-side assembly of
nuScenes annotation dicts around them.
"""
from __future__ import annotations

import json
import os
import time
from typing import Any, Callable

import numpy as np

from .decision import apply_decision_rules
from .pub_tracker import PubTracker, PubTrackerMerged


def run_affinity_eval(
    forward: Callable[[dict], tuple[np.ndarray, np.ndarray]],
    dataset,
    fp_thresh: float = 0.7,
    decision_thresh: float = 0.5,
    progress: bool = False,
) -> dict:
    """Run the net pair-by-pair over `dataset`, apply decision rules, and
    assemble the refined per-frame annotation lists (eval.py:103-193).

    `forward(batch)` -> (matched1 (1,T-2,D), matched2 (1,T,D-2)).
    """
    import jax.numpy as jnp

    from ..data.nuscenes import collate

    nusc_annos: dict[str, Any] = {"results": {}, "meta": None}
    dead_tracker: dict[str, dict] = {}

    it = range(len(dataset))
    if progress:
        try:
            from tqdm import tqdm

            it = tqdm(it)
        except ImportError:
            pass

    for i in it:
        sample = dataset[i]
        batch = collate([sample])
        n_prev = len(sample["prev_cls_det_boxes"])
        n_curr = len(sample["cls_det_boxes"])

        m1, m2 = forward(batch)
        dec = apply_decision_rules(
            jnp.asarray(m1[0]), jnp.asarray(m2[0]),
            jnp.int32(n_prev), jnp.int32(n_curr),
            fp_thresh=fp_thresh, decision_thresh=decision_thresh,
        )
        dec_np = {
            "dead": np.asarray(dec.dead), "fn": np.asarray(dec.fn),
            "fn_ref": np.asarray(dec.fn_ref_score), "keep": np.asarray(dec.keep),
            "newborn": np.asarray(dec.newborn), "ref": np.asarray(dec.ref_score),
        }
        _assemble_frame_annos(sample, dec_np, nusc_annos, dead_tracker)

    return _finalize_annos(nusc_annos, dead_tracker)


def _assemble_frame_annos(sample, dec_np, nusc_annos, dead_tracker):
    """Shared anno assembly for one (prev, curr) pair (eval.py:103-193):
    FN propagation, FP-survivor list, newborn flags, dead bookkeeping."""
    token = sample["token"]
    dead_tracker.setdefault(token, {"dead_idx": [], "keep_idx": []})
    cls_det_boxes = sample["cls_det_boxes"]
    prev_cls = sample["prev_cls_det_boxes"]
    n_prev, n_curr = len(prev_cls), len(cls_det_boxes)

    annos: list[dict] = []
    fn_annos: list[dict] = []
    if n_prev > 0:
        prev_token = sample["prev_token"]
        dead_tracker.setdefault(prev_token, {"dead_idx": [], "keep_idx": []})
        time_lag = float(sample["prev_det_boxes"][0, 9])
        for n in range(n_prev):
            if dec_np["dead"][n]:
                dead_tracker[prev_token]["dead_idx"].append(n)
            elif dec_np["fn"][n]:
                a = dict(prev_cls[n])
                a["translation"] = list(a["translation"])
                a["translation"][:2] = [
                    t + time_lag * v
                    for t, v in zip(a["translation"][:2], a["velocity"])
                ]
                a["FN"] = True
                a["token"] = token
                a["ref_detection_score"] = float(dec_np["fn_ref"][n])
                fn_annos.append(a)

    keep_idx = []
    for k in range(n_curr):
        if not dec_np["keep"][k]:
            continue
        a = dict(cls_det_boxes[k])
        if dec_np["newborn"][k]:
            a["newborn"] = True
        a["ref_detection_score"] = float(dec_np["ref"][k])
        keep_idx.append(k)
        annos.append(a)
    dead_tracker[token]["keep_idx"] = keep_idx
    annos.extend(fn_annos)
    nusc_annos["results"][token] = annos


def _finalize_annos(nusc_annos, dead_tracker):
    """Retroactive dead marking (eval.py:175-181) + meta."""
    for token, annos in nusc_annos["results"].items():
        keep_idx = dead_tracker[token]["keep_idx"]
        for i in dead_tracker[token]["dead_idx"]:
            if i in keep_idx:
                annos[keep_idx.index(i)]["dead"] = True
    nusc_annos["meta"] = {
        "use_camera": False,
        "use_lidar": True,
        "use_radar": False,
        "use_map": False,
        "use_external": False,
    }
    return nusc_annos


def run_affinity_eval_batched(
    model,
    variables,
    dataset,
    batch: int = 8,
    fp_thresh: float = 0.7,
    decision_thresh: float = 0.5,
    progress: bool = False,
    chunk: int = 1,
) -> dict:
    """Scene-batched affinity eval: B scene lanes advance one frame per
    jitted step, the trunk runs ONCE per frame (prev descriptors carried),
    and only the decision bits come back to the host.

    The reference (and run_affinity_eval) recompute BOTH frames' backbones
    per pair at batch 1 (eval.py:96-113); this produces identical annos
    (decision rules mask prev rows at scene starts, and carried descriptors
    equal recomputed ones under fixed weights) at a fraction of the
    compute. This is the default path for tools/eval.py and
    tools/validate.py; pass --parity there for the reference-shaped loop.
    """
    import jax
    import jax.numpy as jnp

    from ..data.nuscenes import collate
    from ..models.shasta import ShastaModel

    cfg = model.cfg
    B = batch
    F = cfg.num_point * cfg.share_conv_channel

    def body(variables, frame, reset, n_prev, n_curr, prev_boxes, prev_feat):
        rz = reset[:, None, None]
        prev_feat = jnp.where(rz, 0.0, prev_feat)
        prev_boxes = jnp.where(rz, 0.0, prev_boxes)
        n_prev = jnp.where(reset, 0, n_prev)
        curr_feat = model.apply(
            variables, frame, train=False, method=ShastaModel.frame_features
        )
        m1, m2 = model.apply(
            variables, prev_boxes, frame["det_boxes"], prev_feat, curr_feat,
            method=ShastaModel.affinity_step,
        )
        dec = jax.vmap(
            lambda a, b, np_, nc: apply_decision_rules(
                a, b, np_, nc, fp_thresh=fp_thresh,
                decision_thresh=decision_thresh,
            )
        )(m1, m2, n_prev, n_curr)
        return curr_feat, dec

    def make_step(fast: bool):
        def step(variables, frame, reset, n_prev, n_curr, prev_boxes,
                 prev_feat):
            if fast:
                from ..ops.pallas.window_conv import collect_coverage_flags

                with collect_coverage_flags() as fl:
                    curr_feat, dec = body(variables, frame, reset, n_prev,
                                          n_curr, prev_boxes, prev_feat)
                # strict: scenes also replay on soft truncation flags so
                # batched results stay bit-consistent with the safe path
                ok = fl.all_ok_strict()
            else:
                curr_feat, dec = body(variables, frame, reset, n_prev,
                                      n_curr, prev_boxes, prev_feat)
                ok = jnp.bool_(True)
            # ONE packed host-bound array per step (each device->host
            # fetch is a full RPC round trip on a tunneled TPU)
            packed = jnp.stack([
                dec.dead.astype(jnp.float32),
                dec.fn.astype(jnp.float32),
                dec.fn_ref_score,
                dec.keep.astype(jnp.float32),
                dec.newborn.astype(jnp.float32),
                dec.ref_score,
                jnp.broadcast_to(
                    ok.astype(jnp.float32), dec.keep.shape
                ),
            ], axis=1)  # (B, 7, N)
            return curr_feat, packed
        return step

    jit_step = jax.jit(make_step(True))
    jit_step_safe = jax.jit(make_step(False))  # compiled only if a flag trips

    def make_chunk(T: int):
        """lax.scan of T batched eval steps: B*T frames per dispatch/fetch
        round trip (lane scheduling is deterministic, so the host can
        stage T steps of frames ahead of time)."""
        step = make_step(True)

        def chunkfn(variables, frames, resets_t, n_prevs_t, n_currs_t,
                    prev_boxes, prev_feat):
            def body_fn(carry, xs):
                prev_boxes, prev_feat = carry
                frame_t, reset, n_prev, n_curr = xs
                curr_feat, packed = step(
                    variables, frame_t, reset, n_prev, n_curr, prev_boxes,
                    prev_feat,
                )
                return (frame_t["det_boxes"], curr_feat), packed

            (prev_boxes, prev_feat), packed_t = jax.lax.scan(
                body_fn, (prev_boxes, prev_feat),
                (frames, resets_t, n_prevs_t, n_currs_t),
            )
            return prev_feat, prev_boxes, packed_t

        return jax.jit(chunkfn)

    def unpack_dec(packed_np, li):
        p = packed_np[li]
        return {
            "dead": p[0] > 0.5, "fn": p[1] > 0.5, "fn_ref": p[2],
            "keep": p[3] > 0.5, "newborn": p[4] > 0.5, "ref": p[5],
        }

    # group the frame-ordered dataset into scenes (prev_token == '' starts)
    samples = [dataset[i] for i in range(len(dataset))]
    scenes: list[list] = []
    for s in samples:
        if not s["prev_token"] or not scenes:
            scenes.append([])
        scenes[-1].append(s)
    queue = list(range(len(scenes)))
    lane_scene = [queue.pop(0) if queue else -1 for _ in range(B)]
    lane_pos = [0] * B

    nusc_annos: dict[str, Any] = {"results": {}, "meta": None}
    dead_tracker: dict[str, dict] = {}
    flagged_scenes: set[int] = set()
    prev_feat = jnp.zeros((B, cfg.max_obj, F))
    prev_boxes = jnp.zeros((B, cfg.max_obj, 11))
    n_prev = np.zeros((B,), np.int32)

    total = len(samples)
    done = 0
    bar = None
    if progress:
        try:
            from tqdm import tqdm

            bar = tqdm(total=total)
        except ImportError:
            pass

    keys = ("voxels", "num_points", "coordinates", "voxels_valid", "det_boxes")

    # Deferred output processing: the packed fetch of step i happens AFTER
    # step i+1 is issued, so the device->host round trip (and the host-side
    # anno assembly) overlaps the next frame's device compute. Lane
    # scheduling depends only on frame counts, never on step outputs, so
    # issuing ahead is always safe.
    pending = None  # (lane_samples, active_scene_ids, packed device array)

    def process(entry):
        nonlocal done
        lane_samples_p, active_p, packed_dev = entry
        packed_np = np.asarray(packed_dev)
        if packed_np[0, 6, 0] <= 0.5:  # a Pallas coverage flag tripped
            flagged_scenes.update(active_p)
        for li, s in enumerate(lane_samples_p):
            if s is None:
                continue
            _assemble_frame_annos(
                s, unpack_dec(packed_np, li), nusc_annos, dead_tracker
            )
            done += 1
            if bar:
                bar.update(1)

    def process_chunk(entry):
        nonlocal done
        metas, packed_dev = entry
        packed_np = np.asarray(packed_dev)  # (T, B, 7, N)
        for t, (lane_samples_p, active_p) in enumerate(metas):
            if packed_np[t, 0, 6, 0] <= 0.5:  # coverage flag at step t
                flagged_scenes.update(active_p)
            for li, s in enumerate(lane_samples_p):
                if s is None:
                    continue
                _assemble_frame_annos(
                    s, unpack_dec(packed_np[t], li), nusc_annos, dead_tracker
                )
                done += 1
                if bar:
                    bar.update(1)

    # ---- the full lane schedule is deterministic: precompute it --------
    sched: list[list] = []  # rows of per-lane (scene_idx, frame_pos) | None
    while any(si >= 0 for si in lane_scene):
        row = []
        for li in range(B):
            si = lane_scene[li]
            row.append((si, lane_pos[li]) if si >= 0 else None)
        sched.append(row)
        for li in range(B):
            if lane_scene[li] < 0:
                continue
            lane_pos[li] += 1
            if lane_pos[li] >= len(scenes[lane_scene[li]]):
                lane_scene[li] = queue.pop(0) if queue else -1
                lane_pos[li] = 0

    # Occupancy-tiered datasets (PointPipelineConfig.voxel_tiers) emit
    # per-frame voxel capacities; batched/chunked serving needs ONE static
    # shape per program, so re-pad every frame to the dataset-global max
    # tier up front (a per-row max would recompile per distinct shape mix).
    vox_keys = ("voxels", "num_points", "coordinates", "voxels_valid")
    v_max = max((s["voxels"].shape[0] for s in samples), default=0)
    tiered = any(s["voxels"].shape[0] != v_max for s in samples)

    def _pad_tiers(batch_np):
        for k in vox_keys:
            a = batch_np[k]
            if a.shape[1] < v_max:
                pad = np.zeros(
                    (a.shape[0], v_max - a.shape[1]) + a.shape[2:], a.dtype
                )
                batch_np[k] = np.concatenate([a, pad], axis=1)
        return batch_np

    def row_inputs(row):
        lane_samples, resets, n_currs = [], [], []
        for entry in row:
            if entry is None:  # idle lane: feed a dummy (template) frame
                lane_samples.append(None)
                resets.append(True)
                n_currs.append(0)
                continue
            si, pos = entry
            s = scenes[si][pos]
            lane_samples.append(s)
            resets.append(pos == 0)
            n_currs.append(len(s["cls_det_boxes"]))
        template = next((s for s in lane_samples if s is not None), None)
        batch_np = collate(
            [s if s is not None else template for s in lane_samples]
        )
        if tiered:
            batch_np = _pad_tiers(batch_np)
        return lane_samples, resets, n_currs, batch_np

    if chunk > 1:
        chunk_fn = make_chunk(chunk)
        # pad the tail group with idle rows (outputs skipped)
        pad = (-len(sched)) % chunk
        sched_p = sched + [[None] * B] * pad if pad else sched
        # idle-pad rows still need a template frame to collate
        for t0 in range(0, len(sched_p), chunk):
            group = sched_p[t0:t0 + chunk]
            metas, f_rows, r_rows, nc_rows = [], [], [], []
            for row in group:
                if all(e is None for e in row):
                    # fully idle pad row: reuse the previous row's frame
                    lane_samples, resets, n_currs = [None] * B, [True] * B, [0] * B
                    batch_np = np_prev_frame
                else:
                    lane_samples, resets, n_currs, batch_np = row_inputs(row)
                    np_prev_frame = batch_np
                active = sorted({e[0] for e in row if e is not None})
                metas.append((lane_samples, active))
                f_rows.append(batch_np)
                r_rows.append(resets)
                nc_rows.append(n_currs)
            frames = {
                k: jnp.asarray(np.stack([fr[k] for fr in f_rows]))
                for k in keys
            }
            n_currs_t = np.asarray(nc_rows, np.int32)
            n_prevs_t = np.concatenate([n_prev[None], n_currs_t[:-1]], axis=0)
            prev_feat, prev_boxes, packed_t = chunk_fn(
                variables, frames, jnp.asarray(np.asarray(r_rows)),
                jnp.asarray(n_prevs_t), jnp.asarray(n_currs_t),
                prev_boxes, prev_feat,
            )
            n_prev = n_currs_t[-1]
            try:  # async D2H: don't serialize the relay against compute
                packed_t.copy_to_host_async()
            except AttributeError:
                pass
            if pending is not None:
                process_chunk(pending)
            pending = (metas, packed_t)
        if pending is not None:
            process_chunk(pending)
    else:
        for row in sched:
            lane_samples, resets, n_currs, batch_np = row_inputs(row)
            frame = {k: jnp.asarray(batch_np[k]) for k in keys}
            curr_feat, packed = jit_step(
                variables, frame, jnp.asarray(resets), jnp.asarray(n_prev),
                jnp.asarray(n_currs, jnp.int32), prev_boxes, prev_feat,
            )
            active = sorted({e[0] for e in row if e is not None})
            prev_feat = curr_feat
            prev_boxes = frame["det_boxes"]
            n_prev = np.asarray(n_currs, np.int32)
            try:  # async D2H (see StepOutput.start_fetch)
                packed.copy_to_host_async()
            except AttributeError:
                pass
            if pending is not None:
                process(pending)
            pending = (lane_samples, active, packed)
        if pending is not None:
            process(pending)
    if bar:
        bar.close()
    assert done == total

    # REPLAY scenes that were in flight when a coverage flag tripped,
    # through the safe (in-graph fallback) program — lane 0 active only.
    for si in sorted(flagged_scenes):
        for s in scenes[si]:
            nusc_annos["results"].pop(s["token"], None)
            dead_tracker.pop(s["token"], None)
        pf = jnp.zeros((B, cfg.max_obj, F))
        pb = jnp.zeros((B, cfg.max_obj, 11))
        npv = np.zeros((B,), np.int32)
        for pos, s in enumerate(scenes[si]):
            batch_np = collate([s] * B)
            frame = {k: jnp.asarray(batch_np[k]) for k in keys}
            n_c = len(s["cls_det_boxes"])
            cf, packed = jit_step_safe(
                variables, frame, jnp.asarray([pos == 0] * B),
                jnp.asarray(npv), jnp.asarray([n_c] * B, jnp.int32), pb, pf,
            )
            _assemble_frame_annos(
                s, unpack_dec(np.asarray(packed), 0), nusc_annos, dead_tracker
            )
            pf, pb, npv = cf, frame["det_boxes"], np.full((B,), n_c, np.int32)

    return _finalize_annos(nusc_annos, dead_tracker)


def save_first_frame(frame_info_path: str, save_path: str) -> list[dict]:
    """frames_meta.json from the frame_info artifact (eval.py:197-223 —
    devkit-free: scene starts are tokens with prev == '')."""
    with open(frame_info_path) as f:
        frame_info = json.load(f)
    frames = [
        {
            "token": tok,
            "timestamp": fi["timestamp"] * 1e-6,
            "first": fi["prev"] == "",
        }
        for tok, fi in frame_info.items()
    ]
    frames.sort(key=lambda f: f["timestamp"])
    os.makedirs(save_path, exist_ok=True)
    with open(os.path.join(save_path, "frames_meta.json"), "w") as f:
        json.dump({"frames": frames}, f)
    return frames


def track(
    predictions: dict,
    frames: list[dict],
    max_age: int = 4,
    hungarian: bool = False,
    refine_confidence: bool = False,
    alpha: float = 0.5,
    beta: float = 0.5,
    merged: bool = False,
) -> tuple[dict, float]:
    """Host tracking over ordered frames (eval.py:226-305). Returns
    (tracking_result_dict, fps)."""
    if merged:
        tracker = PubTrackerMerged(max_age=max_age, hungarian=hungarian)
    else:
        tracker = PubTracker(
            max_age=max_age, hungarian=hungarian,
            refine_confidence=refine_confidence, alpha=alpha, beta=beta,
        )
    nusc_annos: dict[str, Any] = {"results": {}, "meta": None}
    start = time.time()
    last_ts = 0.0
    for fr in frames:
        token = fr["token"]
        if fr["first"]:
            tracker.reset()
            last_ts = fr["timestamp"]
        time_lag = fr["timestamp"] - last_ts
        last_ts = fr["timestamp"]
        outputs = tracker.step_centertrack(predictions.get(token, []), time_lag)
        annos = []
        for item in outputs:
            if item["active"] == 0:
                continue
            a = {
                "sample_token": token,
                "translation": list(item["translation"]),
                "size": list(item["size"]),
                "rotation": list(item["rotation"]),
                "velocity": list(item["velocity"]),
                "tracking_id": str(item["tracking_id"]),
                "tracking_name": item["detection_name"],
                "tracking_score": item["detection_score"],
                "attribute_name": item.get("attribute_name"),
            }
            if refine_confidence or merged:
                a["tracking_score"] = item["ref_detection_score"]
            annos.append(a)
        nusc_annos["results"][token] = annos
    fps = len(frames) / max(time.time() - start, 1e-9)
    nusc_annos["meta"] = {
        "use_camera": False,
        "use_lidar": True,
        "use_radar": False,
        "use_map": False,
        "use_external": False,
    }
    return nusc_annos, fps


GENERAL_TO_TRACKING = {
    "vehicle.car": "car",
    "vehicle.truck": "truck",
    "vehicle.bus": "bus",
    "vehicle.bus.bendy": "bus",
    "vehicle.bus.rigid": "bus",
    "vehicle.trailer": "trailer",
    "vehicle.motorcycle": "motorcycle",
    "vehicle.bicycle": "bicycle",
    "human.pedestrian.adult": "pedestrian",
    "human.pedestrian.child": "pedestrian",
    "human.pedestrian.construction_worker": "pedestrian",
    "human.pedestrian.police_officer": "pedestrian",
}


def eval_tracking_lite(results: dict, gt_info_dir: str, classes=None) -> dict:
    """Devkit-free AMOTA using the gt_info per-frame artifacts
    (gt_info.py individual_frames jsons). Development metric; the official
    TrackingEval remains the reporting path."""
    import os as _os

    from ..mot.amota import evaluate_amota, frames_from_tracking_result

    gt: dict[str, list] = {}
    for tok in results:
        path = _os.path.join(gt_info_dir, tok + ".json")
        if not _os.path.exists(path):
            continue
        with open(path) as f:
            d = json.load(f)
        annos = []
        for gid, gtype, box in zip(d["frame_ids"], d["frame_types"], d["frame_bboxes"]):
            name = GENERAL_TO_TRACKING.get(gtype)
            if name is None:
                continue
            annos.append({
                "instance_id": gid,
                "translation": list(box[:3]),
                "tracking_name": name,
            })
        gt[tok] = annos

    classes = classes or sorted({a["tracking_name"] for v in gt.values() for a in v})
    out = {}
    for cls in classes:
        gt_frames, hyp_frames = frames_from_tracking_result(results, gt, cls)
        out[cls] = evaluate_amota(gt_frames, hyp_frames)
    if out:
        out["mean_amota"] = float(
            sum(v["amota"] for k, v in out.items() if isinstance(v, dict)) / len(out)
        )
    return out


def eval_tracking_nuscenes(res_path, eval_set, output_dir, nusc_version, root_path):
    """Official TrackingEval wrapper (eval.py:322-339); requires the
    nuscenes devkit, which is optional in this environment."""
    try:
        from nuscenes.eval.common.config import config_factory as track_configs
        from nuscenes.eval.tracking.evaluate import TrackingEval
    except ImportError:
        print("nuscenes devkit not available; skipping official TrackingEval")
        return None
    cfg = track_configs("tracking_nips_2019")
    nusc_eval = TrackingEval(
        config=cfg,
        result_path=res_path,
        eval_set=eval_set,
        output_dir=output_dir,
        verbose=True,
        nusc_version=nusc_version,
        nusc_dataroot=root_path,
    )
    return nusc_eval.main()
