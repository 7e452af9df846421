"""Greedy assignment: row-order argmin with column invalidation.

Behavioral reference: tools/nusc_shasta/track_utils.py:3-14. Two versions:
- numpy host version (drop-in for the host tracker)
- fixed-shape jax version as a lax.scan over rows (for the on-device
  scene tracker) returning a per-row match index or -1.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

INVALID = 1e18
THRESH = 1e16


def greedy_assign_np(dist: np.ndarray) -> np.ndarray:
    """dist (N, M) -> (K, 2) matched [row, col] pairs, row order."""
    if dist.shape[0] == 0 or dist.shape[1] == 0:
        return np.zeros((0, 2), np.int32)
    d = dist.copy()
    out = []
    for i in range(d.shape[0]):
        j = int(d[i].argmin())
        if d[i, j] < THRESH:
            d[:, j] = INVALID
            out.append([i, j])
    return np.array(out, np.int32).reshape(-1, 2)


def greedy_assign_jax(dist: jnp.ndarray) -> jnp.ndarray:
    """dist (N, M) -> (N,) col index per row, -1 if unmatched. Same greedy
    semantics (row order, first-free argmin) with static shapes."""
    N, M = dist.shape

    def body(col_taken, row):
        d = jnp.where(col_taken, INVALID, row)
        j = jnp.argmin(d)
        ok = d[j] < THRESH
        col_taken = col_taken | (jnp.arange(M) == j) & ok
        return col_taken, jnp.where(ok, j, -1)

    _, matches = jax.lax.scan(body, jnp.zeros((M,), bool), dist)
    return matches
