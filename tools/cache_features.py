#!/usr/bin/env python
"""Precompute frozen-trunk BEV descriptors for cached affinity training.

The reference recomputes BOTH frames' BEV backbones for every training
pair, every epoch (train.py:195-215), even though the trunk is frozen
(train.py:184-191) — the descriptors are constants of (weights, frame).
This tool computes each frame's (max_obj, num_point*C) descriptor tensor
ONCE (frames batched through one jitted trunk program) and stores it per
token; training then runs the affinity head alone
(tools/train.py --cached_features, make_train_step(cached=True)).

Usage:
  python tools/cache_features.py --config configs/nusc/car.py \
      --checkpoint bev_map_converted --split train --out work_dirs/feat_cache/car
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/nusc/car.py")
    ap.add_argument("--checkpoint", default=None,
                    help="trunk checkpoint (bev_map or full model); random init if absent")
    ap.add_argument("--split", default="train")
    ap.add_argument("--out", required=True)
    ap.add_argument("--batch", type=int, default=8, help="frames per trunk program")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from shasta_tpu.data.nuscenes import (
        NuScenesTrackDataset,
        PointPipelineConfig,
        collate,
    )
    from shasta_tpu.data.synthetic import make_batch
    from shasta_tpu.models import ShastaModel
    from shasta_tpu.train.checkpoint import load_checkpoint, merge_pretrained
    from shasta_tpu.utils import Config

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from train import build_model

    cfg = Config.fromfile(args.config)
    model, mc = build_model(cfg)
    pp = dict(cfg.point_pipeline)
    pp["shuffle_points"] = False
    split_cfg = dict(cfg.data[args.split])
    split_cfg["test_mode"] = True  # descriptors need no GT / augmentation
    split_cfg.pop("labels_path", None)
    ds = NuScenesTrackDataset(
        **split_cfg, det_type=list(cfg.det_type), max_objects=cfg.max_objects,
        pipeline=PointPipelineConfig(**pp),
    )

    init_np = make_batch(mc, batch_size=1, num_voxels_cap=pp["max_voxels"], n_dets=4)
    one = {k: jnp.asarray(v) for k, v in init_np.items()}
    variables = model.init(jax.random.PRNGKey(0), one, train=False)
    if args.checkpoint:
        variables = merge_pretrained(variables, load_checkpoint(args.checkpoint))
        print(f"loaded {args.checkpoint}")

    @jax.jit
    def feats(variables, frame):
        return model.apply(
            variables, frame, train=False, method=ShastaModel.frame_features
        )

    os.makedirs(args.out, exist_ok=True)
    keys = ("voxels", "num_points", "coordinates", "voxels_valid", "det_boxes")
    n = len(ds)
    B = args.batch
    for start in range(0, n, B):
        group = [ds[i] for i in range(start, min(start + B, n))]
        # pad the trailing group to the compiled batch size
        padded = group + [group[-1]] * (B - len(group))
        batch = collate(padded)
        frame = {k: jnp.asarray(batch[k]) for k in keys}
        out = np.asarray(feats(variables, frame))
        for gi, s in enumerate(group):
            np.savez_compressed(
                os.path.join(args.out, s["token"] + ".npz"),
                feat=out[gi].astype(np.float32),
            )
        print(f"cached {min(start + B, n)}/{n}", end="\r")
    print(f"\nwrote {n} descriptor files -> {args.out}")


if __name__ == "__main__":
    main()
