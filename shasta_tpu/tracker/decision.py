"""Vectorized ShaSTA decision rules (dead / FN / FP-elim / newborn / scores).

Behavioral reference: tools/nusc_shasta/eval.py:126-181 (identical rules in
validate.py:62-122). The reference loops over rows/cols in Python with
dynamic list indexing; here the same rules are fixed-shape masked argmaxes
so a whole batch (or scene, under lax.scan) evaluates on-device.

Rule summary (thresholds hard-coded in the reference):
  rows (prev dets, from matched1 restricted to real curr cols + [dead, FN]):
    argmax==dead  & val>0.5 -> prev det flagged dead (for its own frame)
    argmax==FN    & val>0.5 -> propagate prev box by v*dt into curr frame,
                               ref score = 1 - P(dead)
    otherwise               -> row participates in matched2 column decisions
  cols (curr dets, from matched2 restricted to kept prev rows + [newborn, FP]):
    argmax==FP      & val>0.7 -> detection eliminated
    argmax==newborn & val>0.5 -> flagged newborn
    every kept det: ref_detection_score = 1 - matched2[FP_row, k]
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

NEG = -jnp.inf


class DecisionOutput(NamedTuple):
    dead: jnp.ndarray  # (N,) bool — prev det is a dead track
    fn: jnp.ndarray  # (N,) bool — prev det propagated as FN into curr frame
    fn_ref_score: jnp.ndarray  # (N,) float — 1 - P(dead) for FN rows
    keep_prev: jnp.ndarray  # (N,) bool — prev rows used in column decisions
    keep: jnp.ndarray  # (N,) bool — curr det survives FP elimination
    newborn: jnp.ndarray  # (N,) bool — curr det flagged newborn
    ref_score: jnp.ndarray  # (N,) float — 1 - P(FP) per curr det


def apply_decision_rules(
    matched1: jnp.ndarray,  # (T-2, D) row-softmax output, T = D = max_obj + 2
    matched2: jnp.ndarray,  # (T, D-2) col-softmax output
    n_prev: jnp.ndarray,  # scalar int — number of real prev dets
    n_curr: jnp.ndarray,  # scalar int — number of real curr dets
    fp_thresh: float = 0.7,
    decision_thresh: float = 0.5,
) -> DecisionOutput:
    N, D = matched1.shape  # N = max_obj, D = max_obj + 2
    cols = jnp.arange(D)
    rows_t = jnp.arange(N + 2)
    prev_valid = jnp.arange(N) < n_prev
    curr_valid = jnp.arange(N) < n_curr

    # --- row decisions over [real curr cols | dead | FN] (eval.py:132-150) ---
    col_ok = (cols < n_curr) | (cols >= D - 2)
    m1 = jnp.where(col_ok[None, :], matched1, NEG)
    row_val = jnp.max(m1, axis=1)
    row_arg = jnp.argmax(m1, axis=1)
    dead = prev_valid & (row_val > decision_thresh) & (row_arg == D - 2)
    fn = prev_valid & (row_val > decision_thresh) & (row_arg == D - 1)
    fn_ref_score = 1.0 - matched1[:, D - 2]
    keep_prev = prev_valid & ~dead & ~fn

    # --- column decisions over [kept prev rows | newborn | FP] (eval.py:152-168) ---
    row_ok = jnp.concatenate([keep_prev, jnp.array([True, True])]) & (
        (rows_t < n_prev) | (rows_t >= N)
    )
    m2 = jnp.where(row_ok[:, None], matched2, NEG)
    col_val = jnp.max(m2, axis=0)
    col_arg = jnp.argmax(m2, axis=0)
    fp_elim = curr_valid & (col_val > fp_thresh) & (col_arg == N + 1)
    newborn = curr_valid & (col_val > decision_thresh) & (col_arg == N)
    keep = curr_valid & ~fp_elim
    ref_score = 1.0 - matched2[N + 1, :]

    return DecisionOutput(
        dead=dead,
        fn=fn,
        fn_ref_score=fn_ref_score,
        keep_prev=keep_prev,
        keep=keep,
        newborn=newborn & keep,
        ref_score=ref_score,
    )
