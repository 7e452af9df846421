"""Measure the windowed-conv gather spans on the bench workload (CPU).

Records every `_gathered_matmul` gather index array during one eager
frame_features pass (bench shapes, XLA path), then reports — per conv call
and candidate (tile, align) — the window W needed for full first-window
coverage and the residual after an adaptive second window (nwin=2). Picks
the smallest safe W per tile so kernel knobs can be set without burning
chip time on coverage-assert crashes.

    JAX_PLATFORMS=cpu python tools/measure_spans.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

INT_MAX = np.iinfo(np.int32).max


def span_stats(g: np.ndarray, V: int, tile: int, align: int):
    """Per-tile first-window span and the nwin=2 residual span."""
    M, K = g.shape
    Mp = (M + tile - 1) // tile * tile
    gp = np.full((Mp, K), V, np.int32)
    gp[:M] = g
    gt = gp.reshape(-1, tile, K)
    ft = gt < V
    lo = np.where(ft, gt, INT_MAX).min(axis=1) & ~(align - 1)  # (T, K)
    rel = np.where(ft, gt - lo[:, None, :], -1)
    w1 = rel.max()  # W > w1 covers everything with one window
    # adaptive second window over positions beyond a candidate W = w99
    spans = np.sort(rel.reshape(-1))
    spans = spans[spans >= 0]
    w999 = spans[int(len(spans) * 0.999)] if len(spans) else 0
    far = ft & (rel >= ((w999 + 127) // 128 * 128))
    lo2 = np.where(far, gt, INT_MAX).min(axis=1) & ~(align - 1)
    rel2 = np.where(far, gt - lo2[:, None, :], -1)
    return int(w1), int(w999), int(rel2.max())


def covers(g: np.ndarray, V: int, tile: int, align: int, W: int,
           nwin: int) -> bool:
    """EXACT mirror of windowed_gather_matmul's coverage check."""
    M, K = g.shape
    Mp = (M + tile - 1) // tile * tile
    gp = np.full((Mp, K), V, np.int32)
    gp[:M] = g
    gt = gp.reshape(-1, tile, K)
    ft = gt < V
    lo = np.where(ft, gt, INT_MAX).min(axis=1) & ~(align - 1)
    in1 = ft & (gt - lo[:, None, :] < W)
    if nwin == 2:
        far = ft & ~in1
        lo2 = np.where(far, gt, INT_MAX).min(axis=1) & ~(align - 1)
        covered = in1 | (far & (gt - lo2[:, None, :] < W))
    else:
        covered = in1
    return bool(np.all(covered == ft))


def main():
    jax.config.update("jax_platforms", "cpu")
    from bench import N_DETS, V_PER_FRAME, _frames, _make_cfg, _random_variables  # noqa: F401
    from shasta_tpu.models import ShastaModel
    from shasta_tpu.ops import sparse as sp

    recorded = []
    orig = sp._gathered_matmul

    def spy(feats, gather, weight, *a, **k):
        if not isinstance(gather, jax.core.Tracer):  # concrete (eager) only
            recorded.append((
                np.asarray(gather), feats.shape[0], feats.shape[1],
                weight.shape[2], k.get("window"), k.get("nwin", 1),
            ))
        return orig(feats, gather, weight, *a, **k)

    cfg = _make_cfg(1, force_no_pallas=True)
    model = ShastaModel(cfg)
    batch, frame = _frames(cfg, 1)
    variables = _random_variables(model, batch)
    sp._gathered_matmul = spy
    with jax.disable_jit():
        out = model.apply(variables, frame, train=False,
                          method=ShastaModel.frame_features)
    del out
    sp._gathered_matmul = orig

    print(f"{len(recorded)} conv calls recorded", flush=True)
    np.savez("/tmp/gathers.npz", **{
        f"g{i}": g for i, (g, *_rest) in enumerate(recorded)
    }, meta=np.array([[V, C, Co, win or 0, nwin]
                      for (_, V, C, Co, win, nwin) in recorded]))
    for i, (g, V, C, Co, win, nwin) in enumerate(recorded):
        print(f"call {i}: gather {g.shape} V={V} C={C} Co={Co} "
              f"window={win} nwin={nwin}")
        for tile in (64, 128):
            for align in (8, 16):
                w1, w999, w2 = span_stats(g, V, tile, align)
                print(f"  tile={tile} align={align}: full-cover W>{w1}; "
                      f"p99.9 span {w999}, 2nd-window residual {w2}")
        # exact coverage for candidate kernel knobs
        for tile, align, W, nw in (
            (64, 8, 96, 1), (64, 8, 128, 1), (64, 8, 128, 2), (64, 8, 160, 1),
            (64, 16, 112, 1), (64, 16, 176, 1),
            (128, 8, 160, 1), (128, 8, 192, 1), (128, 8, 256, 2),
            (128, 8, 288, 1), (128, 16, 176, 1), (128, 16, 256, 2),
        ):
            if covers(g, V, tile, align, W, nw):
                print(f"  OK tile={tile} align={align} W={W} nwin={nw}")


if __name__ == "__main__":
    main()
