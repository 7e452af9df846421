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
    ap.add_argument("--config", default="configs/nusc/car.py",
                    help="one config, or comma-separated per-class configs; "
                         "with several, the (shared, frozen) trunk runs ONCE "
                         "per frame and every class samples its descriptors "
                         "from the same BEV map -> {out}/{config_stem}/")
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

    config_paths = args.config.split(",")
    multi = len(config_paths) > 1

    entries = []  # (stem, model, box_dataset, out_dir)
    vox_ds = None
    pp0 = None
    for cp in config_paths:
        cfg = Config.fromfile(cp)
        model, mc = build_model(cfg)
        pp = dict(cfg.point_pipeline)
        pp["shuffle_points"] = False
        split_cfg = dict(cfg.data[args.split])
        split_cfg["test_mode"] = True  # descriptors need no GT / augmentation
        split_cfg.pop("labels_path", None)
        kw = dict(
            **split_cfg, det_type=list(cfg.det_type),
            max_objects=cfg.max_objects, pipeline=PointPipelineConfig(**pp),
        )
        if vox_ds is None:
            vox_ds = NuScenesTrackDataset(**kw)
            pp0 = pp
        stem = os.path.basename(cp)[:-3]
        out_dir = os.path.join(args.out, stem) if multi else args.out
        entries.append((stem, model, NuScenesTrackDataset(**kw, load_points=False), out_dir))
        os.makedirs(out_dir, exist_ok=True)

    trunk_model = entries[0][1]
    init_np = make_batch(trunk_model.cfg, batch_size=1,
                         num_voxels_cap=pp0["max_voxels"], n_dets=4)
    one = {k: jnp.asarray(v) for k, v in init_np.items()}
    variables = trunk_model.init(jax.random.PRNGKey(0), one, train=False)
    if args.checkpoint:
        variables = merge_pretrained(variables, load_checkpoint(args.checkpoint))
        print(f"loaded {args.checkpoint}")

    @jax.jit
    def bev_of(variables, frame):
        return trunk_model.apply(
            variables, frame, train=False, method=ShastaModel.bev_single
        )

    def _sample(bev, boxes, _cfg_key: int):
        # one program per distinct (pc_start, voxel_size, stride, max_obj)
        from shasta_tpu.core.bilinear import sample_bev_features
        from shasta_tpu.core.boxes import box_points_5

        cfg = entries[_cfg_key][1].cfg
        pts = box_points_5(boxes[:, :, :7])
        return sample_bev_features(bev, pts, cfg.pc_start, cfg.voxel_size,
                                   cfg.out_stride)

    sample = jax.jit(_sample, static_argnames=("_cfg_key",))

    vox_keys = ("voxels", "num_points", "coordinates", "voxels_valid", "det_boxes")
    n = len(vox_ds)
    B = args.batch
    for start in range(0, n, B):
        idxs = list(range(start, min(start + B, n)))
        group = [vox_ds[i] for i in idxs]
        padded = group + [group[-1]] * (B - len(group))
        batch = collate(padded)
        frame = {k: jnp.asarray(batch[k]) for k in vox_keys}
        bev = bev_of(variables, frame)  # ONE trunk pass for all classes
        for ei, (stem, model, box_ds, out_dir) in enumerate(entries):
            boxes = np.stack([box_ds[i]["det_boxes"] for i in idxs])
            boxes = np.concatenate(
                [boxes, np.repeat(boxes[-1:], B - len(idxs), axis=0)]
            ) if len(idxs) < B else boxes
            feats = np.asarray(
                sample(bev, jnp.asarray(boxes, jnp.float32), _cfg_key=ei)
            )
            for gi, i in enumerate(idxs):
                np.savez_compressed(
                    os.path.join(out_dir, group[gi]["token"] + ".npz"),
                    feat=feats[gi].astype(np.float32),
                )
        print(f"cached {min(start + B, n)}/{n}", end="\r")
    print(f"\nwrote {n} frames x {len(entries)} class(es) -> {args.out}")


if __name__ == "__main__":
    main()
