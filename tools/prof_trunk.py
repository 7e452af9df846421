"""Itemized on-chip cost breakdown of the sparse trunk (the whole per-frame
cost, per tools/prof_step.py: backbone ~= full step once dispatch is
amortized), with an MFU line from the useful conv FLOPs (VERDICT r3 #2).

Relay-safe timing (the lesson of the round-4 first attempt): per-call
blocking timing through the axon relay carries a ~30 ms floor of host->
device argument/constant upload, which swamps every piece. Instead each
piece is timed as N data-dependent iterations chained inside ONE jitted
program via lax.fori_loop (the tools/probe_conv.py method); per-call time
= (t_N - t_1) / (N - 1), which cancels upload + dispatch + fetch exactly.
The chain carry is a single f32 scalar `tok` (0.0 at runtime) threaded
into every piece's inputs and folded from its outputs, so XLA cannot
hoist the piece out of the loop or fold the perturbation away.

Pieces per stage (pallas path, car scale V=120k):
  sN.keytable  encode + monotonicity-guarded table (checked at s0,
               presorted after — matches models/backbone.py:172,193)
  sN.index     submanifold neighbor build (windowed triple lookup)
  sN.conv xM   the stage's subm convs (conv_input + 2 blocks = 5 at s0;
               4 per later stage)
  dN.plan      strided plan build; itemized further for down1:
                 d1.cand+sort   candidate enumeration + jnp.sort (V*8)
                 d1.compact     cumsum + windowed compaction lookup
                 d1.gather      the 27-tap output->input triple lookup
  dN.conv      the strided conv apply (windowed one-hot kernel)

Usage: python tools/prof_trunk.py [--iters N] [--bf16] [--xla] [--fused]

--fused profiles the round-4 fused lookup-conv path (no separate index
lookups; see ops/pallas/window_conv.py fused section): sN.findex rows are
the XLA-side query/base precompute, sN.conv rows run the fused kernel.
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


def chain_bench(name, step, iters=10):
    """step: tok (f32 scalar) -> tok'. Returns per-call ms."""

    def run_n(n):
        @jax.jit
        def run(tok):
            return jax.lax.fori_loop(0, n, lambda _, t: step(t), tok)

        float(run(jnp.float32(0.0)))  # compile + warm (incl. fetch)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(jnp.float32(0.0)))
            best = min(best, time.perf_counter() - t0)
        return best

    try:
        t1 = run_n(1)
        tN = run_n(1 + iters)
    except Exception as e:  # noqa: BLE001
        print(f"{name:24s}      FAILED {type(e).__name__}: {str(e)[:110]}",
              flush=True)
        return 0.0
    ms = (tN - t1) / iters * 1e3
    print(f"{name:24s} {ms:8.2f} ms   (t1={t1 * 1e3:7.1f} tN={tN * 1e3:7.1f})",
          flush=True)
    return ms


def _itok(tok):
    return (tok != 0.0).astype(jnp.int32)  # 0 at runtime, data-dependent


def _fold_i(tok, arr):  # int output -> tok'
    return tok + (jnp.min(arr) == -987654321).astype(jnp.float32)


def _fold_f(tok, arr):  # float output -> tok'
    return tok + jnp.isnan(jnp.sum(arr)).astype(jnp.float32)


def main():
    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from shasta_tpu.data.synthetic import make_batch
    from shasta_tpu.models import ShastaConfig
    from shasta_tpu.ops import sparse as sp
    from shasta_tpu.ops.pallas.window_conv import (collect_coverage_flags,
                                                   windowed_lookup,
                                                   windowed_lookup_triple)

    iters = int(sys.argv[sys.argv.index("--iters") + 1]) if "--iters" in sys.argv else 10
    use_pallas = "--xla" not in sys.argv
    fused = "--fused" in sys.argv
    dt = jnp.bfloat16 if "--bf16" in sys.argv else None
    print(f"platform: {jax.devices()[0].platform}  pallas={use_pallas} "
          f"fused={fused} dtype={dt}", flush=True)

    cfg = ShastaConfig(max_obj=90, cap_conv2=50000, cap_conv3=25000,
                       cap_conv4=12000, cap_extra=12000,
                       assume_sorted_voxels=True)
    batch = make_batch(cfg, batch_size=1, num_voxels_cap=V, n_dets=60, seed=0)
    coords_np = np.concatenate(
        [np.zeros((V, 1), np.int32), np.asarray(batch["coordinates"][0])], axis=1)
    rng = np.random.default_rng(0)
    st0 = sp.SparseTensor(
        feats=jax.device_put(rng.normal(size=(V, 16)).astype(np.float32)),
        coords=jax.device_put(coords_np.astype(np.int32)),
        valid=jax.device_put(np.asarray(batch["voxels_valid"][0])),
        shape=tuple(int(v) for v in cfg.grid_shape), batch_size=1)

    def cov(fn):
        """Run fn under a flag sink; fold all_ok into the scalar result."""
        def wrapped(*a, **k):
            with collect_coverage_flags() as cf:
                out = fn(*a, **k)
            return out, cf.all_ok()
        return wrapped

    stages = [
        # (name, C_in, C_out, kernel, stride, pad, cap, knobs, n_subm_convs)
        ("d1", 16, 32, (3, 3, 3), (2, 2, 2), (1, 1, 1), cfg.cap_conv2, (256, 512, 2), 4),
        ("d2", 32, 64, (3, 3, 3), (2, 2, 2), (1, 1, 1), cfg.cap_conv3, (256, 384, 1), 4),
        ("d3", 64, 128, (3, 3, 3), (2, 2, 2), (0, 1, 1), cfg.cap_conv4, (256, 512, 1), 4),
        ("ex", 128, 128, (3, 1, 1), (2, 1, 1), (0, 0, 0), cfg.cap_extra, (256, 384, 1), 0),
    ]

    total = 0.0
    flops = 0.0
    rows = []

    def add(name, ms, mult=1):
        nonlocal total
        rows.append((name, ms, mult))
        total += ms * mult

    st = st0
    # ---- stage 0 ---------------------------------------------------------
    def kt0_step(tok, st=st0):
        t = sp.key_table_checked(st._replace(coords=st.coords + _itok(tok)))
        return _fold_i(tok, t.sorted_keys)
    add("s0.keytable", chain_bench("s0.keytable", kt0_step, iters))
    tbl = jax.jit(lambda c: sp.key_table_checked(st0._replace(coords=c)))(st0.coords)

    if fused:
        def idx0_step(tok, st=st0, tbl=tbl):
            fi = sp.build_subm_index_fused(
                st._replace(coords=st.coords + _itok(tok)), tbl)
            return (_fold_i(tok, fi.queries)
                    + (1.0 - fi.ok.astype(jnp.float32)))
        add("s0.findex", chain_bench("s0.findex", idx0_step, iters))
        idx = jax.jit(lambda c, st=st0, tbl=tbl: sp.build_subm_index_fused(
            st._replace(coords=c), tbl))(st0.coords)
    else:
        def idx0_step(tok, st=st0, tbl=tbl):
            (idx, ok) = cov(sp.build_subm_index)(
                st._replace(coords=st.coords + _itok(tok)), table=tbl,
                use_pallas=use_pallas)
            return _fold_i(tok, idx.gather) + (1.0 - ok.astype(jnp.float32))
        add("s0.index", chain_bench("s0.index", idx0_step, iters))
        idx = jax.jit(lambda c, st=st0, tbl=tbl: cov(sp.build_subm_index)(
            st._replace(coords=c), table=tbl,
            use_pallas=use_pallas)[0])(st0.coords)
    w0 = jax.device_put(rng.normal(size=(27, 16, 16)).astype(np.float32))

    def conv0_step(tok, st=st0, idx=idx, w=w0):
        (out, ok) = cov(sp.subm_conv_apply)(
            st._replace(feats=st.feats + tok), idx, w, compute_dtype=dt,
            use_pallas=use_pallas)
        return _fold_f(tok, out.feats) + (1.0 - ok.astype(jnp.float32))
    add("s0.conv", chain_bench("s0.conv", conv0_step, iters), mult=5)
    nval = float(np.asarray(jnp.sum(st0.valid)))
    flops += 5 * nval * 27 * 16 * 16 * 2

    # ---- strided stages --------------------------------------------------
    for (nm, Ci, Co, ker, strd, pad, cap, knobs, nconv) in stages:
        stc, tblc = st, tbl

        def plan_step(tok, stc=stc, tblc=tblc, ker=ker, strd=strd, pad=pad,
                      cap=cap, knobs=knobs):
            (pl_, ok) = cov(sp.build_strided_plan)(
                stc._replace(coords=stc.coords + _itok(tok)), ker, strd, pad,
                cap, table=tblc, use_pallas=use_pallas, fused=fused,
                knobs=knobs)
            g = pl_.gather.queries if fused else pl_.gather
            return _fold_i(tok, g) + (1.0 - ok.astype(jnp.float32))
        add(f"{nm}.plan", chain_bench(f"{nm}.plan", plan_step, iters))
        plan = jax.jit(lambda c, stc=stc, tblc=tblc, ker=ker, strd=strd,
                       pad=pad, cap=cap, knobs=knobs: cov(sp.build_strided_plan)(
                           stc._replace(coords=c), ker, strd, pad, cap,
                           table=tblc, use_pallas=use_pallas, fused=fused,
                           knobs=knobs)[0])(stc.coords)
        plan = sp.StridedPlan(plan.coords, plan.valid, plan.gather,
                              tuple(int(v) for v in plan.out_shape))

        if nm == "d1":
            # itemize the plan build: candidates+sort / compact / gather
            def cand_keys(coords, valid, stc=stc):
                b, zyx = coords[:, 0], coords[:, 1:4]
                strides = jnp.asarray([2, 2, 2], jnp.int32)
                pads = jnp.asarray([1, 1, 1], jnp.int32)
                i_grid = np.stack(np.meshgrid(*[np.arange(2)] * 3,
                                              indexing="ij"), -1).reshape(-1, 3)
                r = (zyx + pads) % strides
                taps = r[:, None, :] + jnp.asarray(i_grid, jnp.int32) * strides
                o = (zyx[:, None, :] + pads - taps) // strides
                OZ = (stc.shape[0] + 2 - 3) // 2 + 1
                OY = (stc.shape[1] + 2 - 3) // 2 + 1
                OX = (stc.shape[2] + 2 - 3) // 2 + 1
                ok = (jnp.all(taps < 3, axis=-1) & jnp.all(o >= 0, axis=-1)
                      & jnp.all(o < jnp.asarray([OZ, OY, OX]), axis=-1)
                      & valid[:, None])
                cell = (o[..., 0] * OY + o[..., 1]) * OX + o[..., 2]
                return jnp.where(ok, b[:, None] * (OZ * OY * OX + 1) + cell,
                                 sp.SENTINEL).reshape(-1)

            def cand_sort_step(tok, stc=stc):
                s = jnp.sort(cand_keys(stc.coords + _itok(tok), stc.valid))
                return _fold_i(tok, s)
            chain_bench("  d1.cand+sort", cand_sort_step, iters)

            skeys = jax.jit(lambda c, stc=stc: jnp.sort(
                cand_keys(c, stc.valid)))(stc.coords)

            def compact_step(tok, skeys=skeys, cap=cap):
                s = skeys + _itok(tok)  # +0 at runtime, keeps sortedness
                head = (s != jnp.concatenate(
                    [jnp.full((1,), -1, s.dtype), s[:-1]])) & (s != sp.SENTINEL)
                ch = jnp.cumsum(head.astype(jnp.int32))
                with collect_coverage_flags() as cf:
                    pos = windowed_lookup(
                        ch, jnp.arange(s.shape[0], dtype=jnp.int32),
                        jnp.arange(1, cap + 1, dtype=jnp.int32)[:, None],
                        identity_perm=True)[:, 0]
                out = jnp.where(pos < s.shape[0],
                                s[jnp.minimum(pos, s.shape[0] - 1)], sp.SENTINEL)
                return _fold_i(tok, out) + (1.0 - cf.all_ok().astype(jnp.float32))
            chain_bench("  d1.compact", compact_step, iters)

            def gather_step(tok, pl_=plan, stc=stc, tblc=tblc):
                strides = jnp.asarray([2, 2, 2], jnp.int32)
                pads = jnp.asarray([1, 1, 1], jnp.int32)
                offs = np.stack(np.meshgrid(*[np.arange(3)] * 3,
                                            indexing="ij"), -1).reshape(-1, 3)
                ic = (pl_.coords[:, None, 1:4] * strides
                      + jnp.asarray(offs, jnp.int32) - pads + _itok(tok))
                dims = jnp.asarray(stc.shape, jnp.int32)
                in_range = (jnp.all((ic >= 0) & (ic < dims), axis=-1)
                            & pl_.valid[:, None])
                Z, Y, X = stc.shape
                cell = (ic[..., 0] * Y + ic[..., 1]) * X + ic[..., 2]
                qk = pl_.coords[:, :1] * (Z * Y * X + 1) + cell
                qk = jnp.where(in_range, qk, sp.SENTINEL)
                with collect_coverage_flags() as cf:
                    out = windowed_lookup_triple(tblc.sorted_keys, tblc.perm,
                                                 qk[:, 1::3])
                return _fold_i(tok, out) + (1.0 - cf.all_ok().astype(jnp.float32))
            chain_bench("  d1.gather", gather_step, iters)

        wd = jax.device_put(rng.normal(
            size=(int(np.prod(ker)), Ci, Co)).astype(np.float32))

        def dconv_step(tok, stc=stc, pl_=plan, w=wd, knobs=knobs):
            (out, ok) = cov(sp.strided_conv_apply)(
                stc._replace(feats=stc.feats + tok), pl_, w, compute_dtype=dt,
                use_pallas=use_pallas, knobs=knobs)
            return _fold_f(tok, out.feats) + (1.0 - ok.astype(jnp.float32))
        add(f"{nm}.conv", chain_bench(f"{nm}.conv", dconv_step, iters))
        stn_feats = jax.jit(lambda f, stc=stc, pl_=plan, w=wd, knobs=knobs:
                            cov(sp.strided_conv_apply)(
                                stc._replace(feats=f), pl_, w, compute_dtype=dt,
                                use_pallas=use_pallas, knobs=knobs)[0].feats)(
                                    stc.feats)
        st = sp.SparseTensor(feats=stn_feats, coords=plan.coords,
                             valid=plan.valid, shape=plan.out_shape,
                             batch_size=1)
        nval = float(np.asarray(jnp.sum(plan.valid)))
        flops += nval * np.prod(ker) * Ci * Co * 2

        def ktn_step(tok, st=st):
            t = sp.key_table_presorted(
                st._replace(coords=st.coords + _itok(tok)))
            return _fold_i(tok, t.sorted_keys)
        add(f"{nm}->s.keytable", chain_bench(f"{nm}->s.keytable", ktn_step,
                                             iters))
        tbl = jax.jit(lambda c, st=st: sp.key_table_presorted(
            st._replace(coords=c)))(st.coords)

        if nconv:
            if fused:
                def idx_step(tok, st=st, tbl=tbl):
                    fi = sp.build_subm_index_fused(
                        st._replace(coords=st.coords + _itok(tok)), tbl)
                    return (_fold_i(tok, fi.queries)
                            + (1.0 - fi.ok.astype(jnp.float32)))
                add(f"{nm}->s.findex", chain_bench(f"{nm}->s.findex",
                                                   idx_step, iters))
                sidx = jax.jit(
                    lambda c, st=st, tbl=tbl: sp.build_subm_index_fused(
                        st._replace(coords=c), tbl))(st.coords)
            else:
                def idx_step(tok, st=st, tbl=tbl):
                    (ix, ok) = cov(sp.build_subm_index)(
                        st._replace(coords=st.coords + _itok(tok)), table=tbl,
                        use_pallas=use_pallas)
                    return (_fold_i(tok, ix.gather)
                            + (1.0 - ok.astype(jnp.float32)))
                add(f"{nm}->s.index", chain_bench(f"{nm}->s.index", idx_step,
                                                  iters))
                sidx = jax.jit(lambda c, st=st, tbl=tbl: cov(sp.build_subm_index)(
                    st._replace(coords=c), table=tbl,
                    use_pallas=use_pallas)[0])(st.coords)
            ws = jax.device_put(
                rng.normal(size=(27, Co, Co)).astype(np.float32))

            def sconv_step(tok, st=st, sidx=sidx, w=ws):
                (out, ok) = cov(sp.subm_conv_apply)(
                    st._replace(feats=st.feats + tok), sidx, w,
                    compute_dtype=dt, use_pallas=use_pallas)
                return _fold_f(tok, out.feats) + (1.0 - ok.astype(jnp.float32))
            add(f"{nm}->s.conv", chain_bench(f"{nm}->s.conv", sconv_step,
                                             iters), mult=nconv)
            flops += nconv * nval * 27 * Co * Co * 2

    print("\n---- weighted trunk total ----", flush=True)
    for name, ms, mult in rows:
        tag = f" x{mult}" if mult > 1 else ""
        print(f"{name + tag:24s} {ms * mult:8.2f} ms", flush=True)
    print(f"{'SUM of pieces':24s} {total:8.2f} ms", flush=True)
    gf = flops / 1e9
    peak = 197e12 if dt == jnp.bfloat16 else 49e12  # v5e MXU peak
    print(f"useful conv FLOPs: {gf:.1f} GF -> {gf / total:.2f} TFLOP/s "
          f"= {100 * gf * 1e9 / (total / 1e3) / peak:.2f}% MFU "
          f"({'bf16' if dt == jnp.bfloat16 else 'f32'} peak)", flush=True)


if __name__ == "__main__":
    main()
