"""Benchmark: tracked frames/sec/chip on the full serving path.

Measures the per-frame on-device scene-inference step at nuScenes-car scale
on one TPU chip: sparse trunk over a full point-cloud frame (120k voxel
budget) -> BEV descriptor sampling -> affinity vs carried prev descriptors
(max_obj=90) -> vectorized decision rules -> on-device scan-tracker step.
60 real detections of 90 padded per frame.

This is strictly MORE work per frame than the reference's eval step — which
recomputes BOTH frames' backbones, downloads the affinity matrices, and
tracks on the host (eval.py:96-181, pub_tracker.py) — yet runs as one jitted
XLA program with only O(N) scalars downloaded per frame.

Baseline note: the reference publishes NO throughput number (BASELINE.md).
vs_baseline uses an estimated 20 frames/sec for the reference GPU eval step
(batch 1, two spconv backbone passes/frame on a CUDA-11-era GPU); the
BASELINE.json north star is >=20x that on one chip.
"""
from __future__ import annotations

import json
import multiprocessing
import os
import sys
import time

REFERENCE_FPS_ESTIMATE = 20.0


def _probe_devices(q):
    try:
        import jax

        q.put(str(jax.devices()))
    except Exception as e:  # pragma: no cover
        q.put(f"error: {e}")


def ensure_backend_alive(timeout_s: float = 240.0) -> bool:
    """The axon TPU is reached through a stdio relay that can die; probing
    jax.devices() then hangs forever. Probe in a subprocess with a timeout
    and fall back to CPU so the bench always terminates."""
    ctx = multiprocessing.get_context("spawn")
    q = ctx.Queue()
    p = ctx.Process(target=_probe_devices, args=(q,))
    p.start()
    p.join(timeout_s)
    if p.is_alive():
        p.kill()
        return False
    return not str(q.get()).startswith("error")


def main():
    fallback = False
    if not ensure_backend_alive():
        os.environ["JAX_PLATFORMS"] = "cpu"
        fallback = True
    import jax
    import jax.numpy as jnp

    if fallback:
        jax.config.update("jax_platforms", "cpu")
        print("WARNING: TPU backend unreachable; benchmarking on CPU", file=sys.stderr)

    from shasta_tpu.data.synthetic import make_batch
    from shasta_tpu.infer import ScenePipeline, default_tracker_params
    from shasta_tpu.models import ShastaModel, ShastaConfig

    cfg = ShastaConfig(
        max_obj=90,
        cap_conv2=50000,
        cap_conv3=25000,
        cap_conv4=12000,
        cap_extra=12000,
        # --pallas: A/B the VMEM-resident sparse-gather kernel vs XLA gather
        use_pallas_gather="--pallas" in sys.argv,
        # --bf16: trunk matmuls in bf16 (f32 accumulation)
        dtype=jnp.bfloat16 if "--bf16" in sys.argv else None,
    )
    model = ShastaModel(cfg)
    V = 120000
    N_DETS = 60
    batch = make_batch(cfg, batch_size=1, num_voxels_cap=V, n_dets=N_DETS, seed=0)
    frame = {
        k: jnp.asarray(batch[k])
        for k in ("voxels", "num_points", "coordinates", "voxels_valid", "det_boxes")
    }

    # shape-only init (eager init would run thousands of ops through the
    # remote-TPU tunnel); random weights for honest compute
    var_shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), batch, train=False)
    )
    import numpy as np

    rng = np.random.default_rng(0)
    variables = jax.tree.map(
        lambda s: jnp.asarray(
            rng.normal(0, 0.05, s.shape).astype(np.float32)
            if s.dtype == jnp.float32
            else np.ones(s.shape, s.dtype)
        ),
        var_shapes,
    )

    pipe = ScenePipeline(
        model=model, variables=variables, cls_id=2,
        params=default_tracker_params(max_age=4),
    )

    # warmup / compile
    out = pipe.step_frame(frame, N_DETS, 0.5)

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        out = pipe.step_frame(frame, N_DETS, 0.5)
    dt = time.perf_counter() - t0
    fps = iters / dt

    print(
        json.dumps(
            {
                "metric": "tracked_frames_per_sec_per_chip",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / REFERENCE_FPS_ESTIMATE, 2),
                "platform": jax.devices()[0].platform,
            }
        )
    )


if __name__ == "__main__":
    main()
