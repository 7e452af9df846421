"""Whole-program on-chip timing: full bev_single (trunk+neck+shared)
chained, vs the sum of prof_plans pieces — exposes glue cost the
per-piece profile can't see (XLA materialization between convs, VFE,
table packing).

Usage: python tools/prof_full.py [--iters N] [--bf16] [--no-plans]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from prof_trunk import chain_bench, _fold_f  # noqa: E402

V = 120000


def main():
    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from shasta_tpu import plans as hp
    from shasta_tpu.data.synthetic import make_batch
    from shasta_tpu.models import ShastaConfig, ShastaModel
    from shasta_tpu.ops.pallas.window_conv import collect_coverage_flags

    iters = int(sys.argv[sys.argv.index("--iters") + 1]) if "--iters" in sys.argv else 10
    dt = jnp.bfloat16 if "--bf16" in sys.argv else None
    with_plans = "--no-plans" not in sys.argv
    print(f"platform: {jax.devices()[0].platform} dtype={dt} "
          f"plans={with_plans}", flush=True)

    cfg = ShastaConfig(max_obj=90, cap_conv2=50000, cap_conv3=25000,
                       cap_conv4=12000, cap_extra=12000, dtype=dt,
                       use_pallas_gather=True, assume_sorted_voxels=True)
    model = ShastaModel(cfg)
    batch = make_batch(cfg, batch_size=1, num_voxels_cap=V, n_dets=60, seed=0)
    frame = {k: jax.device_put(batch[k]) for k in
             ("voxels", "num_points", "coordinates", "voxels_valid",
              "det_boxes")}
    if with_plans:
        fp = hp.frame_plans(batch["coordinates"][0], batch["voxels_valid"][0],
                            cfg)
        assert fp.ok
        for k, v in fp.arrays.items():
            frame["plan_" + k] = jax.device_put(v)

    var_shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), batch, train=False))
    rng = np.random.default_rng(0)
    variables = jax.tree.map(
        lambda s: jax.device_put(
            rng.normal(0, 0.05, s.shape).astype(np.float32)
            if s.dtype == jnp.float32 else np.ones(s.shape, s.dtype)),
        var_shapes)

    def bev_step(tok):
        f = dict(frame)
        f["voxels"] = f["voxels"] + tok
        with collect_coverage_flags() as cf:
            bev = model.apply(variables, f, train=False,
                              method=ShastaModel.bev_single)
        return _fold_f(tok, bev) + (1.0 - cf.all_ok().astype(jnp.float32))
    chain_bench("bev_single(full)", bev_step, iters)

    # trunk only (backbone, minus neck/shared): module-level apply
    def trunk_step(tok):
        f = dict(frame)
        f["voxels"] = f["voxels"] + tok
        from shasta_tpu.core.boxes import box_points_5  # noqa: F401
        from shasta_tpu.models.shasta import sp as _sp
        from shasta_tpu.models.vfe import voxel_mean_vfe

        B, Vv = f["voxels"].shape[:2]
        feats = voxel_mean_vfe(
            f["voxels"].reshape(B * Vv, *f["voxels"].shape[2:]),
            f["num_points"].reshape(B * Vv), cfg.num_input_features)
        bidx = jax.lax.broadcasted_iota(jnp.int32, (B, Vv), 0)
        coords = jnp.concatenate(
            [bidx.reshape(B * Vv, 1), f["coordinates"].reshape(B * Vv, 3)],
            axis=1)
        st = _sp.SparseTensor(feats=feats, coords=coords,
                              valid=f["voxels_valid"].reshape(B * Vv),
                              shape=cfg.grid_shape, batch_size=B)
        plans = {k[5:]: v for k, v in f.items() if k.startswith("plan_")}
        with collect_coverage_flags() as cf:
            out = model.apply(variables, st, train=False,
                              plans=plans or None,
                              method=lambda m, st_, train, plans: m.backbone(
                                  st_, train, plans=plans))
        return _fold_f(tok, out) + (1.0 - cf.all_ok().astype(jnp.float32))
    chain_bench("backbone(full)", trunk_step, iters)


if __name__ == "__main__":
    main()
