#!/usr/bin/env python
"""Per-class affinity eval: refined detections + flags -> cp_{split}.json.

Behavioral reference: tools/nusc_shasta/eval.py:61-195 (+ the standalone
track/eval entry at :341-352). The decision rules run vectorized on-device.

Usage:
  python tools/eval.py --config configs/nusc/car.py --checkpoint work_dirs/car/epoch_3 \
      --work_dir work_dirs/car_eval --split val
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="Evaluate the affinity model")
    p.add_argument("--config", default="configs/nusc/car.py")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--work_dir", default="work_dirs/eval")
    p.add_argument("--split", default="val", choices=["val", "test"])
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--alpha", type=float, default=None)
    p.add_argument("--beta", type=float, default=None)
    p.add_argument("--track", action="store_true", help="also run tracking + official eval")
    p.add_argument("--root", default="data/nuScenes")
    p.add_argument("--parity", action="store_true",
                   help="reference-shaped per-pair B=1 loop (default: scene-batched)")
    p.add_argument("--batch", type=int, default=8, help="scene lanes (fast path)")
    p.add_argument("--chunk", type=int, default=1,
                   help="frames per program call (lax.scan; amortizes dispatch)")
    return p.parse_args()


def main():
    args = parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from shasta_tpu.data.nuscenes import NuScenesTrackDataset, PointPipelineConfig
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
    from train import build_model  # noqa: E402

    cfg = Config.fromfile(args.config)
    os.makedirs(args.work_dir, exist_ok=True)
    model, mc = build_model(cfg)

    split_cfg = dict(cfg.data[args.split])
    pp = dict(cfg.point_pipeline)
    pp["shuffle_points"] = False
    ds = NuScenesTrackDataset(
        **split_cfg,
        det_type=list(cfg.det_type),
        max_objects=cfg.max_objects,
        pipeline=PointPipelineConfig(**pp),
    )

    from shasta_tpu.data.synthetic import make_batch

    init_np = make_batch(mc, batch_size=1, num_voxels_cap=pp["max_voxels"], n_dets=4)
    one = {k: jnp.asarray(v) for k, v in init_np.items()}
    variables = model.init(jax.random.PRNGKey(0), one, train=False)
    variables = merge_pretrained(variables, load_checkpoint(args.checkpoint))
    print(f"loaded {args.checkpoint}")

    if args.parity:
        # reference-shaped loop: recompute both frames per pair at B=1
        @jax.jit
        def fwd(variables, batch):
            return model.apply(variables, batch, train=False)

        def forward(batch_np):
            batch = {
                k: jnp.asarray(v)
                for k, v in batch_np.items()
                if not isinstance(v, list)
            }
            return fwd(variables, batch)

        annos = run_affinity_eval(
            forward, ds,
            fp_thresh=cfg.get("fp_elim", 0.7),
            decision_thresh=cfg.get("decision_thresh", 0.5),
            progress=True,
        )
    else:
        # default: scene-batched lanes, trunk once per frame
        annos = run_affinity_eval_batched(
            model, variables, ds, batch=args.batch, chunk=args.chunk,
            fp_thresh=cfg.get("fp_elim", 0.7),
            decision_thresh=cfg.get("decision_thresh", 0.5),
            progress=True,
        )
    out_path = os.path.join(args.work_dir, f"cp_{args.split}.json")
    with open(out_path, "w") as f:
        json.dump(annos, f)
    print(f"wrote {out_path}")

    if args.track:
        frames = save_first_frame(split_cfg["frame_info_path"], args.work_dir)
        result, fps = track(
            annos["results"], frames, max_age=cfg.max_age,
            refine_confidence=False,
        )
        res_path = os.path.join(args.work_dir, "tracking_result.json")
        with open(res_path, "w") as f:
            json.dump(result, f)
        print(f"tracking: {fps:.1f} frames/s -> {res_path}")
        eval_tracking_nuscenes(
            res_path, args.split, args.work_dir,
            "v1.0-trainval" if args.split == "val" else "v1.0-test", args.root,
        )
        # confidence-refined variant (eval.py:351-352)
        a = args.alpha if args.alpha is not None else cfg.alpha
        b = args.beta if args.beta is not None else cfg.beta
        result_rc, _ = track(
            annos["results"], frames, max_age=cfg.max_age,
            refine_confidence=True, alpha=a, beta=b,
        )
        rc_path = os.path.join(args.work_dir, f"tracking_result_ref_alpha{a}_beta{b}.json")
        with open(rc_path, "w") as f:
            json.dump(result_rc, f)
        eval_tracking_nuscenes(
            rc_path, args.split, args.work_dir + "_refined",
            "v1.0-trainval" if args.split == "val" else "v1.0-test", args.root,
        )


if __name__ == "__main__":
    main()
