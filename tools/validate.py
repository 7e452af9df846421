#!/usr/bin/env python
"""Validation: affinity eval over val split + tracking + official scoring.

Behavioral reference: tools/nusc_shasta/validate.py:24-301 (the per-epoch
validation loop train.py calls: decision rules -> cp_val.json ->
save_first_frame -> PubTracker -> TrackingEval, logging AMOTA/AMOTP both
plain and confidence-refined).

Usage:
  python tools/validate.py --config configs/nusc/car.py \
      --checkpoint work_dirs/car/epoch_3 --work_dir work_dirs/car/val3
or from tools/train.py via validate(config, checkpoint, work_dir).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def validate(config_path: str, checkpoint: str, work_dir: str,
             cpu: bool = False, run_official_eval: bool = True,
             root: str = "data/nuScenes", gt_info_dir: str | None = None,
             parity: bool = False, batch: int = 8) -> dict:
    """Returns {'fps': float, 'metrics': ..., 'metrics_refined': ...}."""
    import jax
    import jax.numpy as jnp

    from shasta_tpu.data.nuscenes import NuScenesTrackDataset, PointPipelineConfig
    from shasta_tpu.data.synthetic import make_batch
    from shasta_tpu.train.checkpoint import load_checkpoint, merge_pretrained
    from shasta_tpu.tracker.runner import (
        eval_tracking_nuscenes,
        run_affinity_eval,
        run_affinity_eval_batched,
        save_first_frame,
        track,
    )
    from shasta_tpu.utils import Config

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from train import build_model

    cfg = Config.fromfile(config_path)
    os.makedirs(work_dir, exist_ok=True)
    model, mc = build_model(cfg)

    pp = dict(cfg.point_pipeline)
    pp["shuffle_points"] = False
    ds = NuScenesTrackDataset(
        **dict(cfg.data.val),
        det_type=list(cfg.det_type),
        max_objects=cfg.max_objects,
        pipeline=PointPipelineConfig(**pp),
    )

    init_np = make_batch(mc, batch_size=1, num_voxels_cap=pp["max_voxels"], n_dets=4)
    one = {k: jnp.asarray(v) for k, v in init_np.items()}
    variables = model.init(jax.random.PRNGKey(0), one, train=False)
    variables = merge_pretrained(variables, load_checkpoint(checkpoint))

    if parity:
        @jax.jit
        def fwd(variables, b):
            return model.apply(variables, b, train=False)

        def forward(batch_np):
            b = {k: jnp.asarray(v) for k, v in batch_np.items() if not isinstance(v, list)}
            return fwd(variables, b)

        annos = run_affinity_eval(
            forward, ds,
            fp_thresh=cfg.get("fp_elim", 0.7),
            decision_thresh=cfg.get("decision_thresh", 0.5),
            progress=True,
        )
    else:
        annos = run_affinity_eval_batched(
            model, variables, ds, batch=batch,
            fp_thresh=cfg.get("fp_elim", 0.7),
            decision_thresh=cfg.get("decision_thresh", 0.5),
            progress=True,
        )
    with open(os.path.join(work_dir, "cp_val.json"), "w") as f:
        json.dump(annos, f)

    frames = save_first_frame(cfg.data.val["frame_info_path"], work_dir)
    result, fps = track(annos["results"], frames, max_age=cfg.max_age)
    res_path = os.path.join(work_dir, "tracking_result.json")
    with open(res_path, "w") as f:
        json.dump(result, f)
    print(f"validate: tracked {len(frames)} frames at {fps:.1f} FPS")

    out = {"fps": fps, "metrics": None, "metrics_refined": None}
    if gt_info_dir and os.path.isdir(gt_info_dir):
        from shasta_tpu.tracker.runner import eval_tracking_lite

        out["metrics_lite"] = eval_tracking_lite(result["results"], gt_info_dir)
        print("AMOTA-lite:", json.dumps(out["metrics_lite"]))
    if run_official_eval:
        out["metrics"] = eval_tracking_nuscenes(
            res_path, "val", work_dir, "v1.0-trainval", root
        )
        result_rc, _ = track(
            annos["results"], frames, max_age=cfg.max_age,
            refine_confidence=True, alpha=cfg.alpha, beta=cfg.beta,
        )
        rc_path = os.path.join(work_dir, "tracking_result_refined.json")
        with open(rc_path, "w") as f:
            json.dump(result_rc, f)
        out["metrics_refined"] = eval_tracking_nuscenes(
            rc_path, "val", work_dir + "_refined", "v1.0-trainval", root
        )
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/nusc/car.py")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--work_dir", default="work_dirs/validate")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--skip_eval", action="store_true")
    ap.add_argument("--root", default="data/nuScenes")
    ap.add_argument("--gt_info_dir", default=None,
                    help="gt_info/individual_frames dir for devkit-free AMOTA")
    ap.add_argument("--parity", action="store_true",
                    help="reference-shaped per-pair B=1 loop (default: scene-batched)")
    ap.add_argument("--batch", type=int, default=8, help="scene lanes (fast path)")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    validate(args.config, args.checkpoint, args.work_dir,
             run_official_eval=not args.skip_eval, root=args.root,
             gt_info_dir=args.gt_info_dir, parity=args.parity, batch=args.batch)


if __name__ == "__main__":
    main()
