"""On-chip A/B of the two windowed-lookup kernels (hop vs straight-line)
at the trunk's real lookup shapes, using the chained in-program timing of
tools/probe_conv.py (per-call = (t_N - t_1)/(N - 1), cancels the relay's
per-call upload floor).

Shapes profiled (car scale, from tools/prof_trunk.py round-4 numbers):
  s0.index   subm triple lookup  V=120k table, M=120k x 9 centers  13.4 ms
  d1.gather  strided triple      V=120k table, M=50k x 9 centers    5.6 ms
  s1.index   subm triple         V=50k  table, M=50k x 9 centers    5.2 ms
  d2.gather  strided triple      V=50k  table, M=25k x 9 centers

Usage: python tools/probe_lookup.py [--iters N]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed_chain(step, iters):
    @jax.jit
    def run(tok):
        return jax.lax.fori_loop(0, iters, lambda _, t: step(t), tok)

    float(run(jnp.float32(0.0)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(jnp.float32(0.0)))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from shasta_tpu.data.synthetic import make_batch
    from shasta_tpu.models import ShastaConfig
    from shasta_tpu.ops import sparse as sp
    from shasta_tpu.ops.pallas.window_conv import (collect_coverage_flags,
                                                   windowed_lookup_triple)

    iters = int(sys.argv[sys.argv.index("--iters") + 1]) if "--iters" in sys.argv else 10
    print(f"platform: {jax.devices()[0].platform}", flush=True)

    V = 120000
    cfg = ShastaConfig(max_obj=90, cap_conv2=50000, cap_conv3=25000,
                       cap_conv4=12000, cap_extra=12000,
                       assume_sorted_voxels=True)
    batch = make_batch(cfg, batch_size=1, num_voxels_cap=V, n_dets=60, seed=0)
    coords_np = np.concatenate(
        [np.zeros((V, 1), np.int32), np.asarray(batch["coordinates"][0])], axis=1)
    st0 = sp.SparseTensor(
        feats=jax.device_put(np.zeros((V, 16), np.float32)),
        coords=jax.device_put(coords_np.astype(np.int32)),
        valid=jax.device_put(np.asarray(batch["voxels_valid"][0])),
        shape=tuple(int(v) for v in cfg.grid_shape), batch_size=1)

    def subm_centers(st):
        """The 9 (dz, dy) center queries of a subm 3x3x3 build — mirrors
        ops/sparse.build_subm_index."""
        Z, Y, X = st.shape
        offs = np.stack(np.meshgrid(np.arange(3) - 1, np.arange(3) - 1,
                                    np.arange(3) - 1, indexing="ij"),
                        -1).reshape(-1, 3)
        b = st.coords[:, 0]
        n = st.coords[:, 1:4][:, None, :] + jnp.asarray(offs, jnp.int32)
        dims = jnp.asarray([Z, Y, X], jnp.int32)
        in_range = jnp.all((n >= 0) & (n < dims), axis=-1) & st.valid[:, None]
        cell = (n[..., 0] * Y + n[..., 1]) * X + n[..., 2]
        key = b[:, None] * (Z * Y * X + 1) + cell
        return jnp.where(in_range, key, sp.SENTINEL)[:, 1::3]

    def strided_centers(st, plan, ker, strd, pad):
        strides = jnp.asarray(strd, jnp.int32)
        pads = jnp.asarray(pad, jnp.int32)
        offs = np.stack(np.meshgrid(*[np.arange(k) for k in ker],
                                    indexing="ij"), -1).reshape(-1, 3)
        ic = plan.coords[:, None, 1:4] * strides + jnp.asarray(offs, jnp.int32) - pads
        dims = jnp.asarray(st.shape, jnp.int32)
        in_range = jnp.all((ic >= 0) & (ic < dims), axis=-1) & plan.valid[:, None]
        Z, Y, X = st.shape
        cell = (ic[..., 0] * Y + ic[..., 1]) * X + ic[..., 2]
        qk = plan.coords[:, :1] * (Z * Y * X + 1) + cell
        return jnp.where(in_range, qk, sp.SENTINEL)[:, 1::3]

    # build device-resident tables/queries for each shape
    tbl0 = jax.jit(lambda c: sp.key_table_checked(st0._replace(coords=c)))(st0.coords)
    q_s0 = jax.jit(lambda c: subm_centers(st0._replace(coords=c)))(st0.coords)

    plan1 = jax.jit(lambda c: sp.build_strided_plan(
        st0._replace(coords=c), (3, 3, 3), (2, 2, 2), (1, 1, 1),
        cfg.cap_conv2, table=tbl0, use_pallas=False))(st0.coords)
    plan1 = sp.StridedPlan(plan1.coords, plan1.valid, plan1.gather,
                           tuple(int(v) for v in plan1.out_shape))
    q_d1 = jax.jit(lambda c: strided_centers(
        st0._replace(coords=c), plan1, (3, 3, 3), (2, 2, 2), (1, 1, 1)))(st0.coords)

    st1 = sp.SparseTensor(feats=jnp.zeros((cfg.cap_conv2, 32), jnp.float32),
                          coords=plan1.coords, valid=plan1.valid,
                          shape=plan1.out_shape, batch_size=1)
    tbl1 = jax.jit(lambda c: sp.key_table_presorted(st1._replace(coords=c)))(st1.coords)
    q_s1 = jax.jit(lambda c: subm_centers(st1._replace(coords=c)))(st1.coords)

    plan2 = jax.jit(lambda c: sp.build_strided_plan(
        st1._replace(coords=c), (3, 3, 3), (2, 2, 2), (1, 1, 1),
        cfg.cap_conv3, table=tbl1, use_pallas=False))(st1.coords)
    plan2 = sp.StridedPlan(plan2.coords, plan2.valid, plan2.gather,
                           tuple(int(v) for v in plan2.out_shape))
    q_d2 = jax.jit(lambda c: strided_centers(
        st1._replace(coords=c), plan2, (3, 3, 3), (2, 2, 2), (1, 1, 1)))(st1.coords)

    cases = [
        ("s0.index V=120k M=120k", tbl0, q_s0),
        ("d1.gather V=120k M=50k", tbl0, q_d1),
        ("s1.index V=50k  M=50k", tbl1, q_s1),
        ("d2.gather V=50k  M=25k", tbl1, q_d2),
    ]
    for name, tbl, q in cases:
        for straight in (False, True):
            def step(tok, tbl=tbl, q=q, straight=straight):
                qq = q + (tok != 0.0).astype(jnp.int32)
                with collect_coverage_flags() as cf:
                    out = windowed_lookup_triple(tbl.sorted_keys, tbl.perm,
                                                 qq, straight=straight)
                return (tok + (jnp.min(out) == -7).astype(jnp.float32)
                        + (1.0 - cf.all_ok().astype(jnp.float32)))
            try:
                t1 = timed_chain(step, 1)
                tN = timed_chain(step, 1 + iters)
                # a tripped coverage flag adds 1.0 to tok each iter -> nan
                # never fires; instead verify flags directly once:
                with collect_coverage_flags() as cf:
                    jax.jit(lambda q2, tbl=tbl, s=straight: windowed_lookup_triple(
                        tbl.sorted_keys, tbl.perm, q2, straight=s))(q)
                print(f"{name} straight={int(straight)}: "
                      f"{(tN - t1) / iters * 1e3:7.2f} ms/call", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{name} straight={int(straight)}: FAIL "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)

    # coverage sanity on the real shapes (fetch the flag values)
    for name, tbl, q in cases:
        with collect_coverage_flags() as cf:
            out = jax.jit(lambda q2, tbl=tbl: windowed_lookup_triple(
                tbl.sorted_keys, tbl.perm, q2, straight=True))(q)
        # flags were traced outside jit context here; recompute directly
        def flagged(q2, tbl=tbl):
            with collect_coverage_flags() as cf2:
                r = windowed_lookup_triple(tbl.sorted_keys, tbl.perm, q2,
                                           straight=True)
            return cf2.all_ok(), r

        ok, r_v2 = jax.jit(flagged)(q)
        r_v1 = jax.jit(lambda q2, tbl=tbl: windowed_lookup_triple(
            tbl.sorted_keys, tbl.perm, q2, straight=False))(q)
        same = bool(jnp.array_equal(r_v1, r_v2))
        print(f"{name}: v2 coverage_ok={bool(ok)} match_v1={same}", flush=True)


if __name__ == "__main__":
    main()
