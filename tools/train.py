#!/usr/bin/env python
"""Train a per-class ShaSTA affinity model (data-parallel over all devices).

Behavioral reference: tools/nusc_shasta/train.py:44-257 (custom loop: Adam,
frozen BEV trunk, masked bidirectional CE, per-epoch checkpoint+validate).
TPU-native: shard_map DP over a jax.sharding.Mesh instead of apex DDP.

Usage:
  python tools/train.py --config configs/nusc/car.py --work_dir work_dirs/car
  python tools/train.py --config configs/nusc/car.py --smoke   # synthetic
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="Train the ShaSTA affinity model")
    p.add_argument("--config", default="configs/nusc/car.py")
    p.add_argument("--work_dir", default=None)
    p.add_argument("--checkpoint", default=None, help="resume/init checkpoint")
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest epoch_N in work_dir")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--smoke", action="store_true", help="synthetic data smoke run")
    p.add_argument("--smoke_steps", type=int, default=3)
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--validate", action="store_true", help="run validation per epoch")
    p.add_argument("--cached_features", default=None,
                   help="dir of precomputed BEV descriptors (tools/cache_features.py);"
                        " trains the affinity head alone (~100x fewer FLOPs/step)")
    p.add_argument("--pallas_trunk", action="store_true",
                   help="frozen-trunk fast path: differentiate only "
                        "shared_conv+affinity so the (frozen) trunk runs the "
                        "inference Pallas kernels inside the train step; "
                        "requires freeze_bev")
    return p.parse_args()


def build_model(cfg, use_pallas: bool = False):
    from shasta_tpu.models import ShastaModel, ShastaConfig

    m = dict(cfg.model)
    m.pop("type", None)
    if use_pallas:
        m["use_pallas_gather"] = True
    mc = ShastaConfig(
        **{k: tuple(v) if isinstance(v, list) else v for k, v in m.items()}
    )
    return ShastaModel(mc), mc


def main():
    args = parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from shasta_tpu.data.loader import DataLoader
    from shasta_tpu.data.nuscenes import NuScenesTrackDataset, PointPipelineConfig
    from shasta_tpu.data.synthetic import make_batch
    from shasta_tpu.parallel import make_mesh, shard_batch
    from shasta_tpu.train.checkpoint import load_checkpoint, merge_pretrained, save_checkpoint
    from shasta_tpu.train.loop import (
        create_train_state,
        make_optimizer,
        make_train_step,
        one_cycle_schedule,
    )
    from shasta_tpu.utils import Config

    cfg = Config.fromfile(args.config)
    work_dir = args.work_dir or f"work_dirs/{os.path.basename(args.config)[:-3]}"
    os.makedirs(work_dir, exist_ok=True)
    epochs = args.epochs or cfg.total_epochs
    seed = args.seed if args.seed is not None else cfg.get("seed", 0)

    model, mc = build_model(cfg, use_pallas=args.pallas_trunk)
    n_dev = jax.device_count()
    mesh = make_mesh()
    print(f"devices: {n_dev} ({jax.devices()[0].platform}), work_dir: {work_dir}")

    # ---- data ----
    if args.smoke:
        B = n_dev
        steps_per_epoch = args.smoke_steps
        smoke_np = make_batch(cfg_like(mc), batch_size=B, num_voxels_cap=2048,
                              n_dets=min(8, mc.max_obj), with_gt=True)

        def batches():
            for _ in range(steps_per_epoch):
                yield smoke_np
    else:
        ds = NuScenesTrackDataset(
            **dict(cfg.data.train),
            det_type=list(cfg.det_type),
            max_objects=cfg.max_objects,
            fp_ratio=cfg.fp_ratio,
            dead_trk_ratio=cfg.dead_trk_ratio,
            pipeline=PointPipelineConfig(**dict(cfg.point_pipeline)),
            seed=seed,
            load_points=args.cached_features is None,
        )
        if args.cached_features:
            from shasta_tpu.data.nuscenes import CachedFeatureDataset

            ds = CachedFeatureDataset(ds, args.cached_features)
        loader = DataLoader(
            ds, batch_size=cfg.data.samples_per_device * n_dev,
            num_workers=cfg.data.workers, seed=seed,
        )
        steps_per_epoch = len(loader)

        def batches():
            yield from loader

    # ---- init ----
    init_np = (
        smoke_np if args.smoke
        else make_batch(cfg_like(mc), batch_size=1, num_voxels_cap=2048, n_dets=4, with_gt=True)
    )
    one = {k: jnp.asarray(v[:1]) for k, v in init_np.items()}
    variables = model.init(jax.random.PRNGKey(seed), one, train=False)

    pretrained = cfg.get("pretrained_bev_map")
    start_epoch = 0
    if args.resume:
        import re

        found = sorted(
            (int(m.group(1)), d)
            for d in os.listdir(work_dir)
            if (m := re.fullmatch(r"epoch_(\d+)", d))
        )
        if found:
            start_epoch, latest = found[-1]
            variables = merge_pretrained(
                variables, load_checkpoint(os.path.join(work_dir, latest))
            )
            print(f"resumed from {latest} (epoch {start_epoch})")
    if args.checkpoint:
        variables = merge_pretrained(variables, load_checkpoint(args.checkpoint))
        print(f"loaded checkpoint {args.checkpoint}")
    elif pretrained and os.path.exists(pretrained):
        variables = merge_pretrained(variables, load_checkpoint(pretrained))
        print(f"loaded pretrained BEV trunk {pretrained}")

    schedule = (
        one_cycle_schedule(epochs * steps_per_epoch, **dict(cfg.scheduler))
        if cfg.get("use_scheduler")
        else None
    )
    tx = make_optimizer(
        learning_rate=cfg.learning_rate,
        weight_decay=cfg.weight_decay,
        freeze_bev=cfg.freeze_bev,
        params=variables["params"],
        schedule=schedule,
        grad_clip_norm=cfg.get("grad_clip"),
    )
    state = create_train_state(model, variables, tx)
    if args.pallas_trunk and not cfg.freeze_bev:
        raise SystemExit("--pallas_trunk requires freeze_bev in the config")
    step_fn = make_train_step(
        model, tx, mesh=mesh, cached=args.cached_features is not None,
        frozen_trunk_fast=args.pallas_trunk and args.cached_features is None,
    )

    # ---- loop ----
    log_path = os.path.join(work_dir, "train_log.jsonl")
    for epoch in range(start_epoch, epochs):
        if not args.smoke:
            loader.epoch = epoch  # fresh shuffle per epoch (sampler reseed)
        losses = []
        t0 = time.time()
        for i, batch_np in enumerate(batches()):
            batch = shard_batch(
                {k: jnp.asarray(v) for k, v in batch_np.items()
                 if isinstance(v, np.ndarray)}, mesh)
            state, metrics = step_fn(state, batch)
            loss = float(metrics["loss"])
            losses.append(loss)
            with open(log_path, "a") as f:
                f.write(json.dumps({"epoch": epoch, "step": i, "loss": loss}) + "\n")
        print(
            f"epoch {epoch}: loss={np.mean(losses):.4f} "
            f"({len(losses)} steps, {time.time()-t0:.1f}s)"
        )
        ckpt_path = os.path.join(work_dir, f"epoch_{epoch + 1}")
        save_checkpoint(
            ckpt_path,
            {"params": state.params, "batch_stats": state.batch_stats},
        )
        print(f"saved {ckpt_path}")
        if args.validate and not args.smoke:
            from validate import validate  # noqa: F401 (tools/validate.py)

            validate(args.config, ckpt_path, os.path.join(work_dir, f"val_epoch{epoch+1}"))
    print("done")


def cfg_like(mc):
    return mc


if __name__ == "__main__":
    main()
