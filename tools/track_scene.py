#!/usr/bin/env python
"""Fast-path tracking: the fully on-device scene pipeline (one class).

Unlike tools/eval.py + tools/pub_test.py (the reference-parity path), this
runs trunk + affinity + decision rules + tracker as ONE jitted step per
frame with only O(N) scalars downloaded — the production serving path.

Usage:
  python tools/track_scene.py --config configs/nusc/car.py \
      --checkpoint work_dirs/car/epoch_3 --out tracking_result.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/nusc/car.py")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--split", default="val")
    ap.add_argument("--out", default="work_dirs/track_scene/tracking_result.json")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--render", default=None, help="optional BEV png path")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from shasta_tpu.data.nuscenes import NuScenesTrackDataset, PointPipelineConfig
    from shasta_tpu.data.synthetic import make_batch
    from shasta_tpu.infer import ScenePipeline, default_tracker_params, track_scene_dataset
    from shasta_tpu.tracker.pub_tracker import NUSCENES_TRACKING_NAMES
    from shasta_tpu.train.checkpoint import load_checkpoint, merge_pretrained
    from shasta_tpu.utils import Config

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from train import build_model

    cfg = Config.fromfile(args.config)
    model, mc = build_model(cfg)
    pp = dict(cfg.point_pipeline)
    pp["shuffle_points"] = False
    ds = NuScenesTrackDataset(
        **dict(cfg.data[args.split]),
        det_type=list(cfg.det_type),
        max_objects=cfg.max_objects,
        pipeline=PointPipelineConfig(**pp),
    )
    init_np = make_batch(mc, batch_size=1, num_voxels_cap=pp["max_voxels"], n_dets=4)
    one = {k: jnp.asarray(v) for k, v in init_np.items()}
    variables = model.init(jax.random.PRNGKey(0), one, train=False)
    variables = merge_pretrained(variables, load_checkpoint(args.checkpoint))

    pipe = ScenePipeline(
        model=model,
        variables=variables,
        cls_id=NUSCENES_TRACKING_NAMES.index(cfg.det_type[0]),
        params=default_tracker_params(max_age=cfg.max_age),
        fp_thresh=cfg.get("fp_elim", 0.7),
        decision_thresh=cfg.get("decision_thresh", 0.5),
    )
    result = track_scene_dataset(pipe, ds, progress=True)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f)
    print(f"wrote {args.out} ({len(result['results'])} frames)")

    if args.render:
        from shasta_tpu.viz.visualizer2d import render_scene_tracks

        render_scene_tracks(result["results"], args.render)
        print(f"rendered {args.render}")


if __name__ == "__main__":
    main()
