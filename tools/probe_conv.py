"""On-chip A/B probe for the windowed conv kernel's shape knobs.

Relay-safe timing: block_until_ready over the axon tunnel can return
before remote execution finishes, so each measurement chains N
data-dependent kernel calls inside ONE jitted program (lax.fori_loop)
and fetches a scalar at the end; per-call time = (t_N - t_1) / (N - 1).

    python tools/probe_conv.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def make_case(V, C, K=27, miss=0.1, span=64, seed=0):
    rng = np.random.default_rng(seed)
    feats = rng.normal(size=(V, C)).astype(np.float32) * 0.01
    base = np.arange(V)[:, None]
    jit = rng.integers(-span // 2, span // 2, size=(V, K))
    g = np.clip(base + jit, 0, V - 1)
    g[rng.random(size=(V, K)) < miss] = V
    weight = rng.normal(size=(K, C, C)).astype(np.float32) * 0.01
    return feats, g.astype(np.int32), weight


def timed_chain(step, x0, iters):
    """One jitted program running `step` iters times serially; returns
    wall seconds including ONE final scalar fetch."""

    @jax.jit
    def run(x):
        def body(_, x):
            return step(x)

        return jax.lax.fori_loop(0, iters, body, x)[0, 0]

    r = run(x0)
    float(r)  # compile + warmup incl. fetch
    t0 = time.perf_counter()
    float(run(x0))
    return time.perf_counter() - t0


def main_round2():
    """Round-2 grid: coverage-honoring large-tile variants (see
    tools/measure_spans.py for the span data that picked these), plus the
    strided-conv2 shape (M != V, Co != C, nwin=2)."""
    from shasta_tpu.ops.pallas.window_conv import _conv_call

    print("platform:", jax.devices()[0].platform, flush=True)
    N = 20
    # (name, M, V, C, Co, [(W, nwin, tile), ...])
    grid = [
        ("subm s0 M=V=120k C=16", 119808, 119808, 16, 16,
         [(256, 1, 128), (384, 1, 256), (640, 1, 512), (768, 1, 512)]),
        ("subm s1 M=V=50k C=32", 49920, 49920, 32, 32,
         [(384, 1, 128), (512, 1, 256), (896, 1, 512)]),
        ("subm s3 M=V=12k C=128", 11904, 11904, 128, 128,
         [(384, 1, 128), (384, 1, 256), (640, 1, 512)]),
        ("strided c2 M=50k V=120k C=16 Co=32", 49920, 119808, 16, 32,
         [(256, 2, 128), (384, 2, 256), (512, 2, 256), (512, 2, 512)]),
    ]
    for name, M, V, C, Co, variants in grid:
        rng = np.random.default_rng(0)
        feats = rng.normal(size=(V, C)).astype(np.float32) * 0.01
        K = 27
        base = (np.arange(M)[:, None] * (V // M)).astype(np.int64)
        g = np.clip(base + rng.integers(-32, 32, size=(M, K)), 0, V - 1)
        g[rng.random(size=(M, K)) < 0.1] = V
        weight = rng.normal(size=(K, C, Co)).astype(np.float32) * 0.01
        print(f"--- {name}", flush=True)
        for W, nwin, tile in variants:
            Mp = ((M + tile - 1) // tile) * tile
            gp = np.concatenate(
                [g, np.full((Mp - M, K), V, np.int64)]) if Mp > M else g
            gp_j = jnp.asarray(gp.astype(np.int32))
            w_j = jnp.asarray(weight)
            tab0 = jnp.zeros((V + W, C), jnp.float32).at[:V].set(feats)

            def step(tab, W=W, nwin=nwin, tile=tile, Mp=Mp):
                out = _conv_call(gp_j, tab, w_j, V=V, W=W, NWIN=nwin,
                                 ALIGN=8, interpret=False, tile=tile)
                return tab.at[:Mp].add(out[:, :C] * 1e-6)

            try:
                t1 = timed_chain(step, tab0, 1)
                tN = timed_chain(step, tab0, N)
                print(f"  kernel W={W} nwin={nwin} tile={tile}: "
                      f"{(tN - t1) / (N - 1) * 1e3:7.2f} ms/call", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  kernel W={W} nwin={nwin} tile={tile}: FAIL "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)


def main():
    from shasta_tpu.ops.pallas.window_conv import _conv_call, TILE

    print("platform:", jax.devices()[0].platform, flush=True)
    cases = [("stage0 V=120k C=16", 119808, 16),
             ("stage1 V=50k C=32", 49920, 32),
             ("stage3 V=12k C=128", 11904, 128)]
    if "--round2" in sys.argv:
        return main_round2()
    N = 20
    for name, V, C in cases:
        feats, g, w = make_case(V, C)
        Mp = ((V + TILE - 1) // TILE) * TILE
        gp = np.concatenate([g, np.full((Mp - V, g.shape[1]), V, np.int32)]) \
            if Mp > V else g
        gp_j = jnp.asarray(gp)
        w_j = jnp.asarray(w)
        print(f"--- {name}", flush=True)
        for W, nwin, tile in ((256, 1, 128), (256, 2, 128), (192, 1, 128),
                              (160, 1, 128), (128, 2, 128), (384, 1, 128),
                              (128, 1, 64), (96, 1, 64), (160, 1, 64),
                              (256, 1, 256), (384, 1, 256)):
            tab0 = jnp.zeros((V + W, C), jnp.float32).at[:V].set(feats)

            def step(tab, W=W, nwin=nwin, tile=tile):
                out = _conv_call(gp_j, tab, w_j, V=V, W=W, NWIN=nwin,
                                 ALIGN=8, interpret=False, tile=tile)
                # data dependency: fold the output back into the table
                return tab.at[:Mp].add(out[:, :C] * 1e-6)

            try:
                t1 = timed_chain(step, tab0, 1)
                tN = timed_chain(step, tab0, N)
                print(f"  kernel W={W} nwin={nwin} tile={tile}: "
                      f"{(tN - t1) / (N - 1) * 1e3:7.2f} ms/call "
                      f"(t1={t1 * 1e3:.1f} tN={tN * 1e3:.1f})", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  kernel W={W} nwin={nwin} tile={tile}: FAIL "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)

        # wrapper-overhead reference: XLA coverage check + pad only
        def cov_step(tab):
            ft = gp_j < V
            lo = jnp.min(jnp.where(ft, gp_j, 2**31 - 1)
                         .reshape(-1, TILE, gp_j.shape[1]), axis=1) & ~7
            in1 = ft.reshape(-1, TILE, gp_j.shape[1]) & (
                gp_j.reshape(-1, TILE, gp_j.shape[1]) - lo[:, None, :] < 256)
            ok = jnp.all(in1 == ft.reshape(-1, TILE, gp_j.shape[1]))
            pad = jnp.zeros((V + 256, C), jnp.float32).at[:V].set(tab[:V + 0])
            return tab.at[0, 0].add(
                ok.astype(jnp.float32) * 1e-9 + pad[0, 0] * 1e-9)

        t1 = timed_chain(cov_step, jnp.asarray(feats), 1)
        tN = timed_chain(cov_step, jnp.asarray(feats), N)
        print(f"  coverage-check+pad (XLA): {(tN - t1) / (N - 1) * 1e3:7.2f} "
              f"ms/call", flush=True)


if __name__ == "__main__":
    main()
