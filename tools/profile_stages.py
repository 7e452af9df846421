"""Stage-level TPU cost breakdown of the serving step.

Times each compiled piece of the scene-inference path separately at car
scale (B=1, 120k voxels, max_obj=90): full step, trunk, backbone, neck,
affinity, plus micro-benchmarks of the suspected hot ops (argsort,
searchsorted lookup, HBM gather, Pallas VMEM variants). Prints one
JSON-ish line per stage so the numbers can be pasted into PERF_NOTES.md.

Usage: python tools/profile_stages.py [--iters N] [--micro-only]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

V = 120000
N_DETS = 60


def timeit(name, fn, *args, iters=10):
    try:
        out = fn(*args)
        jax.block_until_ready(out)  # compile + warmup
    except Exception as e:
        print(f"{name:42s}     FAILED: {type(e).__name__}: {str(e)[:120]}")
        return None
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:42s} {dt * 1e3:10.2f} ms")
    return dt


def main():
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from shasta_tpu.data.synthetic import make_batch
    from shasta_tpu.models import ShastaConfig, ShastaModel
    from shasta_tpu.ops import sparse as sp

    print(f"platform: {jax.devices()[0].platform}", file=sys.stderr)
    iters = 10
    if "--iters" in sys.argv:
        iters = int(sys.argv[sys.argv.index("--iters") + 1])

    cfg = ShastaConfig(
        max_obj=90, cap_conv2=50000, cap_conv3=25000, cap_conv4=12000,
        cap_extra=12000, assume_sorted_voxels=True,
        use_pallas_gather="--pallas" in sys.argv,
        dtype=__import__("jax.numpy", fromlist=["bfloat16"]).bfloat16
        if "--bf16" in sys.argv else None,
    )
    model = ShastaModel(cfg)
    batch = make_batch(cfg, batch_size=1, num_voxels_cap=V, n_dets=N_DETS, seed=0)
    keys = ("voxels", "num_points", "coordinates", "voxels_valid", "det_boxes")
    frame = {k: jnp.asarray(batch[k]) for k in keys}

    # ---- micro ops at stage-0 shapes ----------------------------------
    rng = np.random.default_rng(0)
    coords = np.concatenate(
        [np.zeros((V, 1), np.int32), np.asarray(batch["coordinates"][0])], axis=1
    )
    valid = np.asarray(batch["voxels_valid"][0])
    st0 = sp.SparseTensor(
        feats=jnp.asarray(rng.normal(size=(V, 16)).astype(np.float32)),
        coords=jnp.asarray(coords), valid=jnp.asarray(valid),
        shape=cfg.grid_shape, batch_size=1,
    )

    raw_keys = sp.encode_keys(st0.coords, st0.valid, st0.shape, 1)

    timeit("argsort 120k keys", jax.jit(jnp.argsort), raw_keys, iters=iters)

    # SparseTensor carries static fields (shape/batch_size) — close over it
    # instead of passing through jit, mirroring how the model traces it.
    def with_feats(f):
        return st0._replace(feats=f)

    @jax.jit
    def subm_index_xla(f):
        return sp.build_subm_index(with_feats(f), table=sp.key_table(with_feats(f)), use_pallas=False)

    @jax.jit
    def subm_index_pl(f):
        return sp.build_subm_index(with_feats(f), table=sp.key_table(with_feats(f)), use_pallas=True)

    f0 = st0.feats
    timeit("keytable+subm index (searchsorted)", subm_index_xla, f0, iters=iters)
    timeit("keytable+subm index (pallas lookup)", subm_index_pl, f0, iters=iters)
    idx = subm_index_xla(f0)

    # raw searchsorted method A/B at the same shapes
    tbl0 = jax.jit(lambda f: sp.key_table(with_feats(f)))(f0)
    skeys, perm = jnp.asarray(tbl0.sorted_keys), jnp.asarray(tbl0.perm)
    queries = jnp.asarray(
        rng.integers(0, 85_000_000, size=(V, 27)).astype(np.int32)
    )

    @jax.jit
    def ss_scan(k, q):
        return jnp.searchsorted(k, q.reshape(-1), side="left")

    @jax.jit
    def ss_sort(k, q):
        return jnp.searchsorted(k, q.reshape(-1), side="left", method="sort")

    timeit("searchsorted 3.24M (method=scan)", ss_scan, skeys, queries, iters=iters)
    timeit("searchsorted 3.24M (method=sort)", ss_sort, skeys, queries, iters=iters)

    # raw row gather at conv shapes: (V,27) indices from a (V+1,C) table
    gidx = jnp.asarray(rng.integers(0, V, size=(V, 27)).astype(np.int32))

    def row_gather(feats, g):
        padded = jnp.concatenate([feats, jnp.zeros((1, feats.shape[1]), feats.dtype)], 0)
        return padded[g]

    timeit("row gather (120k,27,16) from HBM", jax.jit(row_gather), f0, gidx, iters=iters)
    f128 = jnp.asarray(rng.normal(size=(12000, 128)).astype(np.float32))
    gidx128 = jnp.asarray(rng.integers(0, 12000, size=(12000, 27)).astype(np.int32))
    timeit("row gather (12k,27,128) from HBM", jax.jit(row_gather), f128, gidx128, iters=iters)

    w16 = jnp.asarray(rng.normal(size=(27, 16, 16)).astype(np.float32))

    @jax.jit
    def conv_xla(f, idx, w):
        return sp.subm_conv_apply(with_feats(f), idx, w, use_pallas=False).feats

    @jax.jit
    def conv_pl(f, idx, w):
        return sp.subm_conv_apply(with_feats(f), idx, w, use_pallas=True).feats

    timeit("subm conv C16 (XLA gather+matmul)", conv_xla, f0, idx, w16, iters=iters)
    timeit("subm conv C16 (pallas VMEM)", conv_pl, f0, idx, w16, iters=iters)

    @jax.jit
    def strided_plan(f):
        st = with_feats(f)
        return sp.build_strided_plan(st, (3, 3, 3), (2, 2, 2), (1, 1, 1),
                                     cfg.cap_conv2, table=sp.key_table(st))

    @jax.jit
    def strided_plan_pl(f):
        st = with_feats(f)
        return sp.build_strided_plan(st, (3, 3, 3), (2, 2, 2), (1, 1, 1),
                                     cfg.cap_conv2, table=sp.key_table(st),
                                     use_pallas=True)

    timeit("strided plan conv2 (dedup sort)", strided_plan, f0, iters=iters)
    timeit("strided plan conv2 (pallas compact)", strided_plan_pl, f0, iters=iters)

    if "--micro-only" in sys.argv:
        return

    # ---- model stages --------------------------------------------------
    var_shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), batch, train=False)
    )
    variables = jax.tree.map(
        lambda s: jnp.asarray(
            rng.normal(0, 0.05, s.shape).astype(np.float32)
            if s.dtype == jnp.float32 else np.ones(s.shape, s.dtype)
        ),
        var_shapes,
    )

    @jax.jit
    def backbone_only(variables, frame):
        def run(m, frame):
            B, Vv = frame["voxels"].shape[:2]
            from shasta_tpu.models.vfe import voxel_mean_vfe

            feats = voxel_mean_vfe(
                frame["voxels"].reshape(B * Vv, *frame["voxels"].shape[2:]),
                frame["num_points"].reshape(B * Vv),
                cfg.num_input_features,
            )
            bidx = jax.lax.broadcasted_iota(jnp.int32, (B, Vv), 0)
            cc = jnp.concatenate(
                [bidx.reshape(B * Vv, 1), frame["coordinates"].reshape(B * Vv, 3)],
                axis=1,
            )
            st = sp.SparseTensor(
                feats=feats, coords=cc,
                valid=frame["voxels_valid"].reshape(B * Vv),
                shape=cfg.grid_shape, batch_size=B,
            )
            return m.backbone(st, False)

        return model.apply(variables, frame, method=run)

    @jax.jit
    def neck_shared(variables, bevin):
        def run(m, bevin):
            return m.shared_conv(m.neck(bevin, False), False)

        return model.apply(variables, bevin, method=run)

    @jax.jit
    def trunk(variables, frame):
        return model.apply(variables, frame, train=False,
                           method=ShastaModel.bev_single)

    @jax.jit
    def feats_fn(variables, frame):
        return model.apply(variables, frame, train=False,
                           method=ShastaModel.frame_features)

    @jax.jit
    def aff(variables, pb, cb, pf, cf):
        return model.apply(variables, pb, cb, pf, cf,
                           method=ShastaModel.affinity_step)

    timeit("backbone (sparse trunk)", backbone_only, variables, frame, iters=iters)
    bevin = jnp.asarray(rng.normal(size=(1, 180, 180, 256)).astype(np.float32))
    timeit("neck + shared conv", neck_shared, variables, bevin, iters=iters)
    timeit("trunk (backbone+neck+shared)", trunk, variables, frame, iters=iters)
    timeit("frame_features (trunk+sampling)", feats_fn, variables, frame, iters=iters)

    pf = jnp.asarray(rng.normal(size=(1, cfg.max_obj, 320)).astype(np.float32))
    cf = jnp.asarray(rng.normal(size=(1, cfg.max_obj, 320)).astype(np.float32))
    pb = jnp.asarray(batch["det_boxes"])
    timeit("affinity step", aff, variables, pb, pb, pf, cf, iters=iters)

    from shasta_tpu.infer import ScenePipeline, default_tracker_params

    pipe = ScenePipeline(model=model, variables=variables, cls_id=2,
                         params=default_tracker_params(max_age=4))
    pipe.step_frame(batch, N_DETS, 0.5)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = pipe.step_frame(batch, N_DETS, 0.5)
    del out
    dt = (time.perf_counter() - t0) / iters
    print(f"{'FULL serving step (B=1)':42s} {dt * 1e3:10.2f} ms")


if __name__ == "__main__":
    main()
