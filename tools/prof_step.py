"""On-chip stage timing for the B=1 serving step: locates the gap between
sum-of-stages and the fused ScenePipeline step.

Run on TPU:  python tools/prof_step.py  [--no-pallas] [--bf16]

Times, each as its own jitted program (median of iters, block_until_ready):
  full          ScenePipeline._step (fast program, same args every call)
  dispatch      _step called WITHOUT fresh scalar device_puts
  frame_feat    ShastaModel.frame_features alone
  bev_single    trunk + neck + shared conv
  backbone      sparse trunk only
  affinity      affinity_step
  tail          decisions + tracker step + packing (full minus model parts)
  put_scalar    cost of jnp.float32(x) host->device through the relay
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def median_ms(fn, iters=10, name=""):
    import jax

    t0 = time.perf_counter()
    jax.block_until_ready(fn())  # warmup/compile
    print(f"  [{name} compile+first: {time.perf_counter() - t0:.1f}s]",
          flush=True)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn()
        jax.block_until_ready(r)
        ts.append((time.perf_counter() - t0) * 1e3)
    m = statistics.median(ts)
    print(f"{name:>18}: {m:8.1f} ms", flush=True)
    return m


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from bench import N_DETS, V_PER_FRAME, _frames, _make_cfg, _random_variables
    from shasta_tpu.infer import ScenePipeline, default_tracker_params
    from shasta_tpu.models import ShastaModel

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    cfg = _make_cfg(1)
    model = ShastaModel(cfg)
    batch, frame = _frames(cfg, 1)
    variables = _random_variables(model, batch)
    pipe = ScenePipeline(
        model=model, variables=variables, cls_id=2,
        params=default_tracker_params(max_age=4),
    )

    # warm the pipeline state once so carried args are realistic
    out = pipe.step_frame(frame, N_DETS, 0.5)
    _ = out.tid

    results = {}

    # --- full step with the pipeline's own host-side plumbing
    def full():
        o = pipe.step_frame(frame, N_DETS, 0.5)
        return o._packed if o._packed is not None else 0

    results["full_step"] = median_ms(full, name="full_step")

    # --- same program, all args pre-committed (no fresh scalar puts)
    args = (pipe.variables, frame,
            jnp.asarray([float(pipe._n_prev), float(N_DETS), 0.5],
                        jnp.float32),
            pipe._prev_boxes, pipe._prev_feat, pipe._table, pipe._id_count)
    jax.block_until_ready(args)

    def dispatch():
        return pipe._step(*args)[1]

    results["step_pre_put"] = median_ms(dispatch, name="step_pre_put")

    # --- model parts
    ff = jax.jit(lambda v, f: model.apply(v, f, train=False,
                                          method=ShastaModel.frame_features))
    results["frame_features"] = median_ms(lambda: ff(variables, frame), name="frame_features")

    bs = jax.jit(lambda v, f: model.apply(v, f, train=False,
                                          method=ShastaModel.bev_single))
    results["bev_single"] = median_ms(lambda: bs(variables, frame), name="bev_single")

    # backbone only (same sparse input build as bev_single, no neck)
    def bb(v, f):
        from shasta_tpu.models.vfe import voxel_mean_vfe
        from shasta_tpu.ops import sparse as sp

        B, V = f["voxels"].shape[:2]
        feats = voxel_mean_vfe(
            f["voxels"].reshape(B * V, *f["voxels"].shape[2:]),
            f["num_points"].reshape(B * V), cfg.num_input_features,
        )
        bidx = jax.lax.broadcasted_iota(jnp.int32, (B, V), 0)
        coords = jnp.concatenate(
            [bidx.reshape(B * V, 1), f["coordinates"].reshape(B * V, 3)], axis=1
        )
        st = sp.SparseTensor(feats=feats, coords=coords,
                             valid=f["voxels_valid"].reshape(B * V),
                             shape=cfg.grid_shape, batch_size=B)
        return model.apply(v, st, False, method=lambda m, s, t: m.backbone(s, t))

    bbj = jax.jit(bb)
    results["backbone"] = median_ms(lambda: bbj(variables, frame), name="backbone")

    # affinity alone
    af = jax.jit(lambda v, pb, cb, pf, cf: model.apply(
        v, pb, cb, pf, cf, method=ShastaModel.affinity_step))
    pf = pipe._prev_feat
    results["affinity"] = median_ms(
        lambda: af(variables, pipe._prev_boxes, frame["det_boxes"], pf, pf),
        name="affinity",
    )

    # scalar device_put cost
    def put():
        return jnp.float32(0.5)

    results["put_scalar"] = median_ms(put, iters=20, name="put_scalar")

    tail = (
        results["step_pre_put"] - results["frame_features"] - results["affinity"]
    )
    print(f"derived tail (step_pre_put - frame_features - affinity): "
          f"{tail:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
