"""Itemized on-chip profile of the HOST-PLAN trunk path (round 5).

Same chained-iteration timing as tools/prof_trunk.py (per-call =
(t_N - t_1)/(N-1) inside one jitted fori_loop — cancels the relay's
~30 ms upload floor), but over the plan-backed stage pieces:

  s0.conv      position-fed block kernel, C=16 packing (x5 in trunk)
  d1.conv      strided pos kernel (nwin=2), C=16 packing
  d1s.conv     subm pos kernel, C=32 packing (x4)
  d2.conv      strided pos kernel, C=32 packing
  d2s.findex   on-device fused index build for the C=64 stage
  d2s.conv     legacy one-hot fused kernel (x4)
  d3.plan      strided_plan_from_keys (host out set, device gather)
  d3.conv / d3s.findex / d3s.conv / ex.plan / ex.conv
  dense        to_dense + BEV reshape

Also reports the HOST planner wall time (numpy, single thread) — in
serving it runs in loader prefetch threads, overlapped.

Usage: python tools/prof_plans.py [--iters N] [--bf16]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from prof_trunk import chain_bench, _fold_f, _fold_i, _itok  # noqa: E402

V = 120000


def main():
    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from shasta_tpu import plans as hp
    from shasta_tpu.data.synthetic import make_batch
    from shasta_tpu.models import ShastaConfig
    from shasta_tpu.ops import sparse as sp
    from shasta_tpu.ops.pallas.block_conv import PosIndex, pos_conv_apply
    from shasta_tpu.ops.pallas.window_conv import collect_coverage_flags

    iters = int(sys.argv[sys.argv.index("--iters") + 1]) if "--iters" in sys.argv else 10
    dt = jnp.bfloat16 if "--bf16" in sys.argv else None
    print(f"platform: {jax.devices()[0].platform}  dtype={dt}", flush=True)

    cfg = ShastaConfig(max_obj=90, cap_conv2=50000, cap_conv3=25000,
                       cap_conv4=12000, cap_extra=12000,
                       use_pallas_gather=True, assume_sorted_voxels=True)
    batch = make_batch(cfg, batch_size=1, num_voxels_cap=V, n_dets=60, seed=0)
    coords3 = np.asarray(batch["coordinates"][0])
    valid_np = np.asarray(batch["voxels_valid"][0])

    t0 = time.perf_counter()
    fp = hp.frame_plans(coords3, valid_np, cfg)
    t_host = time.perf_counter() - t0
    print(f"host planner: {t_host * 1e3:8.2f} ms (numpy, 1 thread) "
          f"ok={fp.ok}", flush=True)
    P = {k: jax.device_put(v) for k, v in fp.arrays.items()}

    rng = np.random.default_rng(0)
    coords_np = np.concatenate([np.zeros((V, 1), np.int32), coords3], axis=1)
    shape0 = tuple(int(v) for v in cfg.grid_shape)
    st0 = sp.SparseTensor(
        feats=jax.device_put(rng.normal(size=(V, 16)).astype(np.float32)),
        coords=jax.device_put(coords_np.astype(np.int32)),
        valid=jax.device_put(valid_np),
        shape=shape0, batch_size=1)

    total = 0.0
    rows = []

    def add(name, ms, mult=1):
        nonlocal total
        rows.append((name, ms, mult))
        total += ms * mult

    # ---- s0 conv (pos kernel) -------------------------------------------
    w0 = jax.device_put(rng.normal(size=(27, 16, 16)).astype(np.float32) * .05)
    pidx0 = PosIndex(P["s0_pos"], P["s0_bases"])

    def s0_step(tok):
        out = pos_conv_apply(st0.feats + tok, pidx0, w0, compute_dtype=dt,
                             m_out=V)
        return _fold_f(tok, out)
    add("s0.conv", chain_bench("s0.conv", s0_step, iters), mult=5)

    # ---- d1 strided (pos kernel) ----------------------------------------
    c1, v1, shape1 = sp.decode_strided_keys(
        P["d1_keys"], shape0, (3, 3, 3), (2, 2, 2), (1, 1, 1), 1)
    shape1 = tuple(int(v) for v in shape1)
    pidx1 = PosIndex(P["d1_pos"], P["d1_bases"])
    wd1 = jax.device_put(rng.normal(size=(27, 16, 32)).astype(np.float32) * .05)

    def d1_step(tok):
        out = pos_conv_apply(st0.feats + tok, pidx1, wd1, compute_dtype=dt,
                             m_out=cfg.cap_conv2)
        return _fold_f(tok, out)
    add("d1.conv", chain_bench("d1.conv", d1_step, iters))

    st1 = sp.SparseTensor(
        feats=jax.device_put(
            rng.normal(size=(cfg.cap_conv2, 32)).astype(np.float32)),
        coords=jax.device_put(np.asarray(c1)),
        valid=jax.device_put(np.asarray(v1)), shape=shape1, batch_size=1)

    # ---- d1s subm (pos kernel, C=32) ------------------------------------
    pidx1s = PosIndex(P["d1s_pos"], P["d1s_bases"])
    w1s = jax.device_put(rng.normal(size=(27, 32, 32)).astype(np.float32) * .05)

    def d1s_step(tok):
        out = pos_conv_apply(st1.feats + tok, pidx1s, w1s, compute_dtype=dt,
                             m_out=cfg.cap_conv2)
        return _fold_f(tok, out)
    add("d1s.conv", chain_bench("d1s.conv", d1s_step, iters), mult=4)

    # ---- d2 strided (pos kernel) ----------------------------------------
    c2, v2, shape2 = sp.decode_strided_keys(
        P["d2_keys"], shape1, (3, 3, 3), (2, 2, 2), (1, 1, 1), 1)
    shape2 = tuple(int(v) for v in shape2)
    pidx2 = PosIndex(P["d2_pos"], P["d2_bases"])
    wd2 = jax.device_put(rng.normal(size=(27, 32, 64)).astype(np.float32) * .05)

    def d2_step(tok):
        out = pos_conv_apply(st1.feats + tok, pidx2, wd2, compute_dtype=dt,
                             m_out=cfg.cap_conv3)
        return _fold_f(tok, out)
    add("d2.conv", chain_bench("d2.conv", d2_step, iters))

    st2 = sp.SparseTensor(
        feats=jax.device_put(
            rng.normal(size=(cfg.cap_conv3, 64)).astype(np.float32)),
        coords=jax.device_put(np.asarray(c2)),
        valid=jax.device_put(np.asarray(v2)), shape=shape2, batch_size=1)

    def cov(fn):
        def wrapped(*a, **k):
            with collect_coverage_flags() as cf:
                out = fn(*a, **k)
            return out, cf.all_ok()
        return wrapped

    # ---- d2s (legacy fused kernel, C=64) --------------------------------
    t2 = jax.jit(lambda c: sp.key_table_presorted(st2._replace(coords=c)))(
        st2.coords)

    def d2s_fi_step(tok):
        fi = sp.build_subm_index_fused(
            st2._replace(coords=st2.coords + _itok(tok)), t2)
        return _fold_i(tok, fi.queries) + (1.0 - fi.ok.astype(jnp.float32))
    add("d2s.findex", chain_bench("d2s.findex", d2s_fi_step, iters))
    fi2 = jax.jit(lambda c: sp.build_subm_index_fused(
        st2._replace(coords=c), t2))(st2.coords)
    w2s = jax.device_put(rng.normal(size=(27, 64, 64)).astype(np.float32) * .05)

    def d2s_step(tok):
        (out, ok) = cov(sp.subm_conv_apply)(
            st2._replace(feats=st2.feats + tok), fi2, w2s, compute_dtype=dt,
            use_pallas=True)
        return _fold_f(tok, out.feats) + (1.0 - ok.astype(jnp.float32))
    add("d2s.conv", chain_bench("d2s.conv", d2s_step, iters), mult=4)

    # ---- d3 (from-keys plan + legacy conv) ------------------------------
    def d3_plan_step(tok):
        (pl_, ok) = cov(sp.strided_plan_from_keys)(
            st2._replace(coords=st2.coords + _itok(tok)), P["d3_keys"],
            (3, 3, 3), (2, 2, 2), (0, 1, 1), table=t2, use_pallas=True,
            fused=True, knobs=(128, 320, 1))
        return _fold_i(tok, pl_.gather.queries) + (1.0 - ok.astype(jnp.float32))
    add("d3.plan", chain_bench("d3.plan", d3_plan_step, iters))
    plan3 = jax.jit(lambda c: cov(sp.strided_plan_from_keys)(
        st2._replace(coords=c), P["d3_keys"], (3, 3, 3), (2, 2, 2),
        (0, 1, 1), table=t2, use_pallas=True, fused=True,
        knobs=(128, 320, 1))[0])(st2.coords)
    plan3 = sp.StridedPlan(plan3.coords, plan3.valid, plan3.gather,
                           tuple(int(v) for v in plan3.out_shape))
    wd3 = jax.device_put(rng.normal(size=(27, 64, 128)).astype(np.float32) * .05)

    def d3_step(tok):
        (out, ok) = cov(sp.strided_conv_apply)(
            st2._replace(feats=st2.feats + tok), plan3, wd3,
            compute_dtype=dt, use_pallas=True, knobs=(128, 320, 1))
        return _fold_f(tok, out.feats) + (1.0 - ok.astype(jnp.float32))
    add("d3.conv", chain_bench("d3.conv", d3_step, iters))

    st3 = sp.SparseTensor(
        feats=jax.device_put(
            rng.normal(size=(cfg.cap_conv4, 128)).astype(np.float32)),
        coords=plan3.coords, valid=plan3.valid,
        shape=plan3.out_shape, batch_size=1)
    t3 = jax.jit(lambda c: sp.key_table_presorted(st3._replace(coords=c)))(
        st3.coords)

    def d3s_fi_step(tok):
        fi = sp.build_subm_index_fused(
            st3._replace(coords=st3.coords + _itok(tok)), t3)
        return _fold_i(tok, fi.queries) + (1.0 - fi.ok.astype(jnp.float32))
    add("d3s.findex", chain_bench("d3s.findex", d3s_fi_step, iters))
    fi3 = jax.jit(lambda c: sp.build_subm_index_fused(
        st3._replace(coords=c), t3))(st3.coords)
    w3s = jax.device_put(rng.normal(size=(27, 128, 128)).astype(np.float32) * .05)

    def d3s_step(tok):
        (out, ok) = cov(sp.subm_conv_apply)(
            st3._replace(feats=st3.feats + tok), fi3, w3s, compute_dtype=dt,
            use_pallas=True)
        return _fold_f(tok, out.feats) + (1.0 - ok.astype(jnp.float32))
    add("d3s.conv", chain_bench("d3s.conv", d3s_step, iters), mult=4)

    # ---- ex --------------------------------------------------------------
    def ex_plan_step(tok):
        (pl_, ok) = cov(sp.strided_plan_from_keys)(
            st3._replace(coords=st3.coords + _itok(tok)), P["ex_keys"],
            (3, 1, 1), (2, 1, 1), (0, 0, 0), table=t3, use_pallas=True,
            fused=True, knobs=(128, 224, 1))
        return _fold_i(tok, pl_.gather.queries) + (1.0 - ok.astype(jnp.float32))
    add("ex.plan", chain_bench("ex.plan", ex_plan_step, iters))
    planx = jax.jit(lambda c: cov(sp.strided_plan_from_keys)(
        st3._replace(coords=c), P["ex_keys"], (3, 1, 1), (2, 1, 1),
        (0, 0, 0), table=t3, use_pallas=True, fused=True,
        knobs=(128, 224, 1))[0])(st3.coords)
    planx = sp.StridedPlan(planx.coords, planx.valid, planx.gather,
                           tuple(int(v) for v in planx.out_shape))
    wx = jax.device_put(rng.normal(size=(3, 128, 128)).astype(np.float32) * .05)

    def ex_step(tok):
        (out, ok) = cov(sp.strided_conv_apply)(
            st3._replace(feats=st3.feats + tok), planx, wx,
            compute_dtype=dt, use_pallas=True, knobs=(128, 224, 1))
        return _fold_f(tok, out.feats) + (1.0 - ok.astype(jnp.float32))
    add("ex.conv", chain_bench("ex.conv", ex_step, iters))

    stx = sp.SparseTensor(
        feats=jax.device_put(
            rng.normal(size=(cfg.cap_extra, 128)).astype(np.float32)),
        coords=planx.coords, valid=planx.valid,
        shape=planx.out_shape, batch_size=1)

    def dense_step(tok):
        d = sp.to_dense(stx._replace(feats=stx.feats + tok))
        B, D, H, W_, C = d.shape
        out = jnp.transpose(d, (0, 2, 3, 4, 1)).reshape(B, H, W_, C * D)
        return _fold_f(tok, out)
    add("dense", chain_bench("dense", dense_step, iters))

    print("\n---- weighted plan-trunk total ----", flush=True)
    for name, ms, mult in rows:
        label = name + (f" x{mult}" if mult > 1 else "")
        print(f"{label:24s} {ms * mult:8.2f} ms", flush=True)
    print(f"{'SUM of pieces':24s} {total:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
