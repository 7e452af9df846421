"""Cluster analysis of the fused-index coverage misses (round-4 bench bug).

For each failing (tile, group) at bench scale, computes the sorted query
RANKS (positions in the physical key table) and clusters them with a gap
threshold; reports cluster counts and spans. Decides between: finer base
granularity (sub-128 window anchors), larger W, or more windows (nwin).

Usage: JAX_PLATFORMS=cpu python tools/analyze_fused_miss.py
"""
from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

V = 120000


def cluster_stats(name, phys, qk, tile, W, nwin, D=3):
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

    Vn = phys.shape[0]
    valid_keys = phys[phys != SENT]

    worst = []  # (n_clusters, total_span, max_cluster_span, tile, group)
    hist = {}
    for t in range(T):
        for g in range(G):
            q = qt[t, :, g, :].reshape(-1)
            q = q[q != SENT]
            if q.size == 0:
                continue
            r = np.searchsorted(valid_keys, np.sort(q))
            gaps = np.diff(r)
            # a new window is needed when ranks jump farther than W-128
            # (the wasted-base worst case); cluster at gap > 256
            splits = np.nonzero(gaps > 256)[0]
            n_cl = len(splits) + 1
            spans = []
            start = 0
            for sp_i in list(splits) + [len(r) - 1]:
                spans.append(int(r[sp_i] - r[start]))
                start = sp_i + 1
            hist[n_cl] = hist.get(n_cl, 0) + 1
            worst.append((n_cl, int(r[-1] - r[0]), max(spans), t, g))
    worst.sort(reverse=True)
    print(f"{name}: cluster-count histogram {dict(sorted(hist.items()))}")
    print(f"   worst by n_clusters: {worst[:5]}")
    by_span = sorted(worst, key=lambda x: -x[2])
    print(f"   worst by max_cluster_span: {by_span[:5]}")


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

    cfg = ShastaConfig(max_obj=90, cap_conv2=50000, cap_conv3=25000,
                       cap_conv4=12000, cap_extra=12000,
                       use_pallas_gather=True, assume_sorted_voxels=True)
    batch = make_batch(cfg, batch_size=1, num_voxels_cap=V, n_dets=60, seed=0)
    coords = np.concatenate([np.zeros((V, 1), np.int32),
                             np.asarray(batch["coordinates"][0])], axis=1)
    st = sp.SparseTensor(
        feats=jnp.zeros((V, 16), jnp.float32),
        coords=jnp.asarray(coords, jnp.int32),
        valid=jnp.asarray(batch["voxels_valid"][0]),
        shape=tuple(int(v) for v in cfg.grid_shape), batch_size=1)

    t = sp.key_table_checked(st)
    phys = np.asarray(sp.encode_keys(st.coords, st.valid, st.shape, 1))
    cluster_stats("s0", phys, _subm_qk(st), 256, 384, 1)

    stages = [
        ("d1", (3, 3, 3), (2, 2, 2), (1, 1, 1), cfg.cap_conv2, (256, 512, 2), 32),
        ("d2", (3, 3, 3), (2, 2, 2), (1, 1, 1), cfg.cap_conv3, (256, 384, 1), 64),
        ("d3", (3, 3, 3), (2, 2, 2), (0, 1, 1), cfg.cap_conv4, (256, 512, 1), 128),
    ]
    for (nm, ker, strd, pad, cap, knobs, Co) in stages:
        plan = sp.build_strided_plan(st, ker, strd, pad, cap, table=t,
                                     use_pallas=True, fused=True, knobs=knobs)
        qk = _strided_qk(st, plan, ker, strd, pad)
        D = 3 if ker[2] == 3 else 1
        cluster_stats(f"{nm}.strided", phys, qk, knobs[0], knobs[1],
                      knobs[2], D=D)
        st = sp.SparseTensor(feats=jnp.zeros((cap, Co), jnp.float32),
                             coords=plan.coords, valid=plan.valid,
                             shape=plan.out_shape, batch_size=1)
        t = sp.key_table_presorted(st)
        phys = np.asarray(sp.encode_keys(st.coords, st.valid, st.shape, 1))
        cluster_stats(f"{nm}->s", phys, _subm_qk(st), 256, 384, 1)


if __name__ == "__main__":
    main()
