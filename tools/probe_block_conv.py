"""On-chip variant probe for the block-extraction conv kernel.

The round-5 first cut measured 31 ms/conv at s0 (10x SLOWER than the
one-hot kernel it replaces) despite ~4x fewer MXU passes — some Mosaic
lowering cost dominates. This probe times stripped-down kernel variants
at the s0 shape to attribute the cost:

  full        the shipped kernel (guard compares + extraction + quarter
              key check + per-block selects + weight matmul)
  noselect    quarter check kept, but rows_d = first C lanes of afeat
              (removes the 2H-per-tap narrow (tile, C) where/add chain)
  nokeys      selects kept, eq = constant mask (removes akey extraction
              + 4 narrow quarter compares per tap)
  extract     acc += (oh @ f2w) @ wrep only (block find + extraction +
              one full-width weight matmul per group; no key check, no
              selects) — the structural floor of the design
  ohonly      block find + one fold of oh (no table reads)

Timing: chained data-dependent iterations inside one jitted fori_loop
(per-call = (t_N - t_1)/(N - 1)) — the relay-safe method of
tools/probe_conv.py.

    python tools/probe_block_conv.py [--iters N]
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from shasta_tpu.ops.pallas.block_conv import GB


def _variant_kernel(q_ref, base_ref, sg1_ref, sg2_ref, k2q_ref, f2_ref,
                    w_ref, out_ref, *, H: int, C: int, variant: str):
    tile, K = q_ref.shape
    G = K // 3
    NBWL = sg1_ref.shape[1]
    dt = f2_ref.dtype
    H2 = 2 * H
    t = pl.program_id(0)
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    Co = out_ref.shape[1]
    for g in range(G):  # noqa: PLR1702
        a = q_ref[:, 3 * g + 1] - 1
        r = base_ref[t, g]
        sg1 = sg1_ref[pl.ds(r, 1), :]
        sg2 = sg2_ref[pl.ds(r, 1), :]
        oh = (a[:, None] > sg1) & ~(a[:, None] > sg2)
        ohf = oh.astype(dt)
        if variant == "ohonly":
            acc = acc + jnp.sum(ohf, axis=1, keepdims=True)[:, :1]
            continue
        blk0 = pl.multiple_of(r * GB, GB)
        f2w = f2_ref[pl.ds(blk0, NBWL), :]
        afeat = jax.lax.dot_general(
            ohf, f2w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if variant == "extract":
            acc = acc + jax.lax.dot_general(
                afeat.astype(dt), w_ref[g, 0],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)[:, :Co]
            continue
        if variant != "nokeys":
            k2w = k2q_ref[pl.ds(blk0, NBWL), :]
            akey = jax.lax.dot_general(
                ohf, k2w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.int32)
        rows3 = []
        for d in range(3):
            q = q_ref[:, 3 * g + d]
            if variant == "nokeys":
                eq = None
            else:
                eq = None
                for c in range(4):
                    qc = (q >> (8 * c)) & 255
                    ec = akey[:, c * H2:(c + 1) * H2] == qc[:, None]
                    eq = ec if eq is None else (eq & ec)
            if variant == "noselect":
                rows3.append(afeat[:, :C] * (eq[:, :1].astype(jnp.float32)
                                             if eq is not None else 1.0))
                continue
            rd = jnp.zeros((tile, C), jnp.float32)
            for j in range(H2):
                m = (eq[:, j:j + 1] if eq is not None
                     else (q > 0)[:, None])
                rd = rd + jnp.where(m, afeat[:, j * C:(j + 1) * C], 0.0)
            rows3.append(rd)
        im = jnp.concatenate(rows3, axis=1).astype(dt)
        acc = acc + jax.lax.dot_general(
            im, w_ref[g, 2, :3 * C, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[:, :Co]
    out_ref[:] = acc[:, :Co]


@functools.partial(jax.jit, static_argnames=("H", "C", "variant", "tile"))
def _call(q, bases, sg1, sg2, k2q, f2, w, H, C, variant, tile):
    Mp, K = q.shape
    Co = C
    T = Mp // tile
    return pl.pallas_call(
        functools.partial(_variant_kernel, H=H, C=C, variant=variant),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((tile, K), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, Co), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Co), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(q, bases, sg1, sg2, k2q, f2, w)


def timed_chain(step, x0, iters):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, iters, lambda _, x: step(x), x)[0, 0]

    float(run(x0))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(run(x0))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    iters = int(sys.argv[sys.argv.index("--iters") + 1]) if "--iters" in sys.argv else 10
    rng = np.random.default_rng(0)
    # s0-like shape
    for (name, V, C, H, NBWL, tile) in [
        ("s0 C=16", 119808, 16, 4, 128, 128),
        ("s1 C=32", 49920, 32, 2, 256, 128),
    ]:
        M = V
        K = 27
        G = K // 3
        NB_real = -(-V // H)
        NBr = max(1, -(-NB_real // GB))
        NBP = (NBr - 1) * GB + NBWL
        Mp = ((M + tile - 1) // tile) * tile
        T = Mp // tile
        # synthetic monotone queries/bases: base ramps across the table
        q = np.zeros((Mp, K), np.int32)
        keys = np.sort(rng.choice(2**26, size=V, replace=False)).astype(np.int32)
        ramp = (np.arange(Mp) * (V / Mp)).astype(np.int64)
        for g in range(G):
            c = keys[np.minimum(ramp + g, V - 1)]
            q[:, 3 * g + 1] = c
            q[:, 3 * g + 0] = c - 1
            q[:, 3 * g + 2] = c + 1
        bases = np.zeros((T, G), np.int32)
        blk = (ramp[::tile] // (H * GB)).astype(np.int32)
        for g in range(G):
            bases[:, g] = np.clip(blk - 1, 0, NBr - 1)
        sg1 = rng.integers(0, 2**26, size=(NBr, NBWL)).astype(np.int32)
        sg1.sort(axis=1)
        sg2 = sg1 + 1
        k2q = rng.integers(0, 255, size=(NBP, 8 * H)).astype(np.float32)
        f2 = (rng.normal(size=(NBP, 128)) * 0.01).astype(np.float32)
        w = (rng.normal(size=(G, 3, 128, max(C, 3 * C))) * 0.01).astype(np.float32)

        qj, bj = jnp.asarray(q), jnp.asarray(bases)
        s1j, s2j = jnp.asarray(sg1), jnp.asarray(sg2)
        kj, wj = jnp.asarray(k2q), jnp.asarray(w)
        print(f"--- {name}: V={V} T={T} NBP={NBP}", flush=True)
        for variant in ("ohonly", "extract", "nokeys", "noselect", "full"):
            f2j = jnp.asarray(f2)

            def step(f2t, variant=variant):
                out = _call(qj, bj, s1j, s2j, kj, f2t, wj, H, C, variant,
                            tile)
                return f2t.at[0, 0].add(jnp.sum(out) * 1e-12)

            try:
                t1 = timed_chain(step, f2j, 1)
                tN = timed_chain(step, f2j, 1 + iters)
                print(f"  {variant:10s}: {(tN - t1) / iters * 1e3:7.2f} ms",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  {variant:10s}: FAIL {type(e).__name__}: "
                      f"{str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
