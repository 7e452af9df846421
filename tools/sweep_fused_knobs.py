"""Pick minimal fused-conv windows: per-stage max key-rank spread at
tile in {128, 256} over several synthetic seeds.

The fused kernel's VPU cost scales with tile*W*K compares per tile and
its MXU extraction with tile*W*C — both linear in W at fixed V (T*tile =
V). The coverage requirement is W >= max per-(tile,group) rank spread +
FGRAN - 1. This prints that spread so FUSED_SUBM_KNOBS / backbone knobs can be
set to the smallest multiple of FGRAN that covers with margin.

Usage: JAX_PLATFORMS=cpu python -u tools/sweep_fused_knobs.py [seeds...]
"""
from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

V = 120000
TILES = (128, 256)


def spread(phys, qk, tile, D=3, nwin=2):
    """Max per-(tile, group) rank spread. nwin=2 splits rank clusters at
    gap>512 (the adaptive-second-window kernels cover the far cluster
    separately); ADVICE r4 low: a stage whose kernel runs nwin=1 must be
    sized from the UNSPLIT span — pass nwin=1 there, and treat any
    n_2win>0 in the printed summary as a red flag for that stage."""
    from shasta_tpu.ops import sparse as sp

    SENT = sp.SENTINEL
    qk = np.asarray(qk)
    M, K = qk.shape
    G = K // D
    Mp = ((M + tile - 1) // tile) * tile
    T = Mp // tile
    qpad = np.full((Mp, K), SENT, np.int64)
    qpad[:M] = qk
    qt = qpad.reshape(T, tile, G, D)
    keys = phys[phys != SENT]
    best = 0
    nw2 = 0  # tiles needing a second window (cluster gap > 512)
    for t in range(T):
        for g in range(G):
            q = qt[t, :, g, :].reshape(-1)
            q = q[q != SENT]
            if q.size == 0:
                continue
            r = np.searchsorted(keys, np.sort(q))
            gaps = np.diff(r)
            splits = np.nonzero(gaps > 512)[0] if nwin == 2 else []
            if len(splits):
                nw2 += 1
                segs = np.split(r, splits + 1)
                best = max(best, max(int(s[-1] - s[0]) for s in segs))
            else:
                best = max(best, int(r[-1] - r[0]) if r.size else 0)
    return best, nw2


def main():
    from shasta_tpu.data.synthetic import make_batch
    from shasta_tpu.models import ShastaConfig
    from shasta_tpu.ops import sparse as sp
    from shasta_tpu.ops.pallas import window_conv as wc

    def _fast_lookup(sorted_keys, perm, query, interpret=None, lanes=1,
                     identity_perm=False):
        Vn = sorted_keys.shape[0]
        p = jnp.searchsorted(sorted_keys, query.reshape(-1), side="left")
        p = jnp.clip(p, 0, Vn - 1)
        qf = query.reshape(-1)
        found = (sorted_keys[p] == qf) & (qf != sp.SENTINEL)
        src = jnp.arange(Vn, dtype=jnp.int32) if identity_perm else perm
        return (jnp.where(found, src[p], Vn).astype(jnp.int32)
                .reshape(query.shape))

    wc.windowed_lookup = _fast_lookup
    from tools.repro_fused_cov import _strided_qk, _subm_qk

    seeds = [int(a) for a in sys.argv[1:]] or [0, 1, 2]
    cfg = ShastaConfig(max_obj=90, cap_conv2=50000, cap_conv3=25000,
                       cap_conv4=12000, cap_extra=12000,
                       use_pallas_gather=True, assume_sorted_voxels=True)
    agg = {}
    for seed in seeds:
        batch = make_batch(cfg, batch_size=1, num_voxels_cap=V, n_dets=60,
                           seed=seed)
        coords = np.concatenate([np.zeros((V, 1), np.int32),
                                 np.asarray(batch["coordinates"][0])], axis=1)
        st = sp.SparseTensor(
            feats=jnp.zeros((V, 16), jnp.float32),
            coords=jnp.asarray(coords, jnp.int32),
            valid=jnp.asarray(batch["voxels_valid"][0]),
            shape=tuple(int(v) for v in cfg.grid_shape), batch_size=1)
        t = sp.key_table_checked(st)
        phys = np.asarray(sp.encode_keys(st.coords, st.valid, st.shape, 1))
        for tile in TILES:
            # subm fused indices run nwin=1 (sparse.py) — size from the
            # UNSPLIT span (ADVICE r4 low)
            s, n2 = spread(phys, _subm_qk(st), tile, nwin=1)
            agg.setdefault(("s0", tile), []).append((s, n2))
        stages = [
            ("d1", (3, 3, 3), (2, 2, 2), (1, 1, 1), cfg.cap_conv2, (256, 512, 2), 32),
            ("d2", (3, 3, 3), (2, 2, 2), (1, 1, 1), cfg.cap_conv3, (256, 384, 1), 64),
            ("d3", (3, 3, 3), (2, 2, 2), (0, 1, 1), cfg.cap_conv4, (256, 512, 1), 128),
            ("ex", (3, 1, 1), (2, 1, 1), (0, 0, 0), cfg.cap_extra, (256, 384, 1), 128),
        ]
        for (nm, ker, strd, pad, cap, knobs, Co) in stages:
            plan = sp.build_strided_plan(st, ker, strd, pad, cap, table=t,
                                         use_pallas=True, fused=True,
                                         knobs=knobs)
            qk = _strided_qk(st, plan, ker, strd, pad)
            D = 3 if ker[2] == 3 else 1
            for tile in TILES:
                s, n2 = spread(phys, qk, tile, D=D, nwin=knobs[2])
                agg.setdefault((nm, tile), []).append((s, n2))
            st = sp.SparseTensor(feats=jnp.zeros((cap, Co), jnp.float32),
                                 coords=plan.coords, valid=plan.valid,
                                 shape=plan.out_shape, batch_size=1)
            t = sp.key_table_presorted(st)
            phys = np.asarray(sp.encode_keys(st.coords, st.valid,
                                             st.shape, 1))
            if nm != "ex":
                for tile in TILES:
                    s, n2 = spread(phys, _subm_qk(st), tile, nwin=1)
                    agg.setdefault((f"{nm}->s", tile), []).append((s, n2))
        print(f"-- seed {seed} done", flush=True)

    print(f"{'stage':8s} {'tile':>5s} {'max_spread':>10s} {'n_2win':>7s}  "
          f"(over seeds {seeds})")
    for (nm, tile), vals in agg.items():
        s = max(v[0] for v in vals)
        n2 = max(v[1] for v in vals)
        w_min = ((s + wc.FGRAN - 1) // wc.FGRAN + 1) * wc.FGRAN
        print(f"{nm:8s} {tile:5d} {s:10d} {n2:7d}  -> W_min {w_min}")


if __name__ == "__main__":
    main()
