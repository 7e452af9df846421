"""CPU repro for the round-4 bench failure: `pallas coverage flag tripped`
with the fused lookup-conv path (bench.py:231, /tmp/bench_fused.log).

The coverage scalar is computed entirely in XLA (build_fused_index /
build_strided_plan), and every index/plan build depends only on coords +
valid — never on feature values — so the whole trunk index chain replays
exactly on CPU with the bench's synthetic frame. For each fused index this
prints the flag plus a numpy decomposition: physical-sort check, covered
query fraction, and the worst per-(tile, group) key-rank spread vs the
knob window (the quantity that must be <= W for value-window coverage).

Usage: JAX_PLATFORMS=cpu python tools/repro_fused_cov.py
"""
from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

V = 120000
N_DETS = 60


def diagnose(name, st, qk, tile, W, nwin):
    """Numpy re-derivation of build_fused_index's coverage math."""
    from shasta_tpu.ops import sparse as sp
    from shasta_tpu.ops.pallas.window_conv import TILE

    phys = np.asarray(sp.encode_keys(st.coords, st.valid, st.shape,
                                     st.batch_size))
    qk = np.asarray(qk)
    M, K = qk.shape
    D = 3
    G = K // D
    sorted_ok = bool(np.all(phys[1:] >= phys[:-1]))

    Vn = phys.shape[0]
    Mp = ((M + tile - 1) // tile) * tile
    T = Mp // tile
    R = (Vn + TILE - 1) // TILE + 1
    FL = (R - 1) * TILE + W
    SENT = sp.SENTINEL
    qpad = np.full((Mp, K), SENT, np.int64)
    qpad[:M] = qk
    keys_flat = np.full((FL,), SENT, np.int64)
    keys_flat[:Vn] = phys
    guards = np.concatenate([[np.iinfo(np.int32).min],
                             keys_flat[TILE - 1:(R - 1) * TILE:TILE]])
    ends = keys_flat[W - 1:FL:TILE]

    qt = qpad.reshape(T, tile, G, D)
    real = qt != SENT
    qlo = np.min(np.where(real, qt, SENT), axis=(1, 3))
    qhi = np.max(np.where(real, qt, np.iinfo(np.int32).min), axis=(1, 3))
    anchors = (np.stack([qlo, qhi], -1).reshape(T, 2 * G) if nwin == 2
               else qlo)
    rows = np.searchsorted(guards, anchors.reshape(-1), side="left") - 1
    bases = np.clip(rows, 0, R - 1).reshape(T, nwin * G)

    b1 = bases.reshape(T, G, nwin)[:, :, 0]
    cov = (qt > guards[b1][:, None, :, None]) & (qt <= ends[b1][:, None, :, None])
    if nwin == 2:
        b2 = bases.reshape(T, G, nwin)[:, :, 1]
        cov = cov | ((qt > guards[b2][:, None, :, None])
                     & (qt <= ends[b2][:, None, :, None]))
    miss = real & ~cov
    n_real = int(real.sum())
    n_miss = int(miss.sum())

    # key-rank spread per (tile, group): rank of the highest real query
    # minus rank of the lowest — must be < W for a single window
    ranks_lo = np.searchsorted(phys[:Vn], np.where(qlo == SENT, 0, qlo))
    ranks_hi = np.searchsorted(phys[:Vn],
                               np.where(qhi < 0, 0, qhi), side="right")
    spread = np.where(qlo == SENT, 0, ranks_hi - ranks_lo)
    print(f"{name}: ok_sorted={sorted_ok} miss={n_miss}/{n_real} "
          f"max_spread={int(spread.max())} (W={W}, nwin={nwin}, tile={tile}, "
          f"T={T}, G={G})")
    if n_miss:
        ti, ri, gi, di = np.nonzero(miss)
        t0 = ti[0]
        order = np.argsort(spread.reshape(-1))[::-1]
        worst = [(int(i // G), int(i % G), int(spread.reshape(-1)[i]))
                 for i in order[:6]]
        print(f"   worst (tile, group, spread): {worst}")
        g0 = gi[0]
        print(f"   first miss tile={t0} g={g0}: base={bases[t0, g0 * nwin]} "
              f"guard={guards[bases[t0, g0 * nwin]]} "
              f"end={ends[bases[t0, g0 * nwin]]} "
              f"q={qt[t0, ri[0], g0, di[0]]}")
    return n_miss == 0 and sorted_ok


def main():
    from shasta_tpu.data.synthetic import make_batch
    from shasta_tpu.models import ShastaConfig
    from shasta_tpu.ops import sparse as sp
    from shasta_tpu.ops.pallas import window_conv as wc
    from shasta_tpu.ops.pallas.window_conv import (FUSED_SUBM_KNOBS,
                                                   collect_coverage_flags)

    # The plan build's compaction calls the Pallas windowed_lookup, which
    # on CPU runs in interpret mode (hours at VC=960k). Its result is
    # exactly searchsorted(cumsum, q, 'left') for identity_perm monotone
    # queries — substitute that; we only care about the fused flags here.
    def _fast_lookup(sorted_keys, perm, query, interpret=None, lanes=1,
                     identity_perm=False):
        V = sorted_keys.shape[0]
        p = jnp.searchsorted(sorted_keys, query.reshape(-1), side="left")
        p = jnp.clip(p, 0, V - 1)
        qf = query.reshape(-1)
        found = (sorted_keys[p] == qf) & (qf != sp.SENTINEL)
        src = jnp.arange(V, dtype=jnp.int32) if identity_perm else perm
        return (jnp.where(found, src[p], V).astype(jnp.int32)
                .reshape(query.shape))

    wc.windowed_lookup = _fast_lookup

    cfg = ShastaConfig(max_obj=90, cap_conv2=50000, cap_conv3=25000,
                       cap_conv4=12000, cap_extra=12000,
                       use_pallas_gather=True, assume_sorted_voxels=True)
    batch = make_batch(cfg, batch_size=1, num_voxels_cap=V, n_dets=N_DETS,
                       seed=0)
    coords = np.concatenate([np.zeros((V, 1), np.int32),
                             np.asarray(batch["coordinates"][0])], axis=1)
    st = sp.SparseTensor(
        feats=jnp.zeros((V, 16), jnp.float32),
        coords=jnp.asarray(coords, jnp.int32),
        valid=jnp.asarray(batch["voxels_valid"][0]),
        shape=tuple(int(v) for v in cfg.grid_shape), batch_size=1)

    stages = [
        ("d1", (3, 3, 3), (2, 2, 2), (1, 1, 1), cfg.cap_conv2, (256, 192, 2), 32),
        ("d2", (3, 3, 3), (2, 2, 2), (1, 1, 1), cfg.cap_conv3, (256, 288, 1), 64),
        ("d3", (3, 3, 3), (2, 2, 2), (0, 1, 1), cfg.cap_conv4, (128, 320, 1), 128),
        ("ex", (3, 1, 1), (2, 1, 1), (0, 0, 0), cfg.cap_extra, (128, 224, 1), 128),
    ]

    t = sp.key_table_checked(st)
    fi = sp.build_subm_index_fused(st, t)
    print(f"s0.findex ok={bool(fi.ok)}")
    if not bool(fi.ok):
        tile, W = FUSED_SUBM_KNOBS.get(16, (128, 288))
        # rebuild qk as build_subm_index_fused does
        diagnose("s0", st, _subm_qk(st), tile, W, 1)

    for (nm, ker, strd, pad, cap, knobs, Co) in stages:
        with collect_coverage_flags() as cf:
            plan = sp.build_strided_plan(st, ker, strd, pad, cap, table=t,
                                         use_pallas=True, fused=True,
                                         knobs=knobs)
        print(f"{nm}.plan flags ok={bool(cf.all_ok())} "
              f"findex.ok={bool(plan.gather.ok)}")
        if not bool(plan.gather.ok):
            qk = _strided_qk(st, plan, ker, strd, pad)
            diagnose(nm, st, qk, knobs[0], knobs[1], knobs[2])
        st = sp.SparseTensor(feats=jnp.zeros((cap, Co), jnp.float32),
                             coords=plan.coords, valid=plan.valid,
                             shape=plan.out_shape, batch_size=1)
        t = sp.key_table_presorted(st)
        if nm != "ex":
            fi = sp.build_subm_index_fused(st, t)
            print(f"{nm}->s.findex ok={bool(fi.ok)}")
            if not bool(fi.ok):
                tile, W = FUSED_SUBM_KNOBS.get(Co, (128, 288))
                diagnose(f"{nm}->s", st, _subm_qk(st), tile, W, 1)


def _subm_qk(st):
    from shasta_tpu.ops import sparse as sp
    kz = ky = kx = 3
    Z, Y, X = st.shape
    offsets = np.stack(np.meshgrid(np.arange(kz) - 1, np.arange(ky) - 1,
                                   np.arange(kx) - 1, indexing="ij"),
                       -1).reshape(-1, 3)
    b = st.coords[:, 0]
    zyx = st.coords[:, 1:4]
    n = zyx[:, None, :] + jnp.asarray(offsets, jnp.int32)
    dims = jnp.asarray([Z, Y, X], jnp.int32)
    in_range = jnp.all((n >= 0) & (n < dims), axis=-1) & st.valid[:, None]
    cell = (n[..., 0] * Y + n[..., 1]) * X + n[..., 2]
    key = b[:, None] * (Z * Y * X + 1) + cell
    return jnp.where(in_range, key, sp.SENTINEL)


def _strided_qk(st, plan, ker, strd, pad):
    from shasta_tpu.ops import sparse as sp
    kz, ky, kx = ker
    Z, Y, X = st.shape
    offsets = np.stack(np.meshgrid(np.arange(kz), np.arange(ky),
                                   np.arange(kx), indexing="ij"),
                       -1).reshape(-1, 3)
    ic = (plan.coords[:, None, 1:4] * jnp.asarray(strd, jnp.int32)
          + jnp.asarray(offsets, jnp.int32) - jnp.asarray(pad, jnp.int32))
    dims = jnp.asarray([Z, Y, X], jnp.int32)
    in_range = jnp.all((ic >= 0) & (ic < dims), axis=-1) & plan.valid[:, None]
    cell = (ic[..., 0] * Y + ic[..., 1]) * X + ic[..., 2]
    qk = plan.coords[:, :1] * (Z * Y * X + 1) + cell
    return jnp.where(in_range, qk, sp.SENTINEL)


if __name__ == "__main__":
    main()
