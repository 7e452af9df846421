"""GT affinity-matrix generation (the `gt_shasta` artifacts).

Behavioral reference: preprocessing/make_gt_shasta.py:88-157. For each
frame pair (prev, curr):
- associate dets<->GT in each frame independently (2 m center L2 greedy)
- a prev-TP and curr-TP sharing a GT instance id -> matched[prev, curr]=1
- an unmatched prev-TP whose GT id is a curr-frame FN GT -> FN col (-1)
- remaining prev dets (FPs + TPs whose id vanished) -> dead col (-2),
  computed as 1 - rowsum
- curr TPs with no prev match -> newborn[curr]=1
Scene starts produce matched=None and newborn from curr TPs alone.
"""
from __future__ import annotations

import numpy as np

from .associate import associate_l2


def frame_gt_matrices(
    prev_dets: np.ndarray | None,
    prev_types: list[str] | None,
    prev_gt: np.ndarray | None,
    prev_gt_types: list[str] | None,
    prev_gt_ids: list | None,
    curr_dets: np.ndarray,
    curr_types: list[str],
    curr_gt: np.ndarray,
    curr_gt_types: list[str],
    curr_gt_ids: list,
    threshold: float = 2.0,
):
    """Returns (matched (N, K+2) or None, newborn (K,))."""
    K = len(curr_dets)
    tp_pairs, _, fn_inds = associate_l2(
        curr_gt, curr_gt_types, curr_dets, curr_types, threshold
    )

    if prev_dets is None:
        newborn = np.zeros((K,))
        for k in tp_pairs:
            newborn[k] = 1
        return None, newborn

    N = len(prev_dets)
    prev_tp_pairs, _, _ = associate_l2(
        prev_gt, prev_gt_types, prev_dets, prev_types, threshold
    )

    matched = np.zeros((N, K + 2))
    newborn = np.zeros((K,))

    prev_tp_idx = list(prev_tp_pairs.keys())
    prev_tp_ids = [prev_gt_ids[g] for g in prev_tp_pairs.values()]

    matched_prev_ids = []
    for curr_idx, gt_idx in tp_pairs.items():
        gid = curr_gt_ids[gt_idx]
        if gid in prev_tp_ids:
            matched_prev_ids.append(gid)
            prev_idx = prev_tp_idx[prev_tp_ids.index(gid)]
            matched[prev_idx, curr_idx] = 1
        else:
            newborn[curr_idx] = 1

    curr_gt_ids_list = list(curr_gt_ids)
    for pos, gid in enumerate(prev_tp_ids):
        if gid in matched_prev_ids:
            continue
        prev_idx = prev_tp_idx[pos]
        if gid in curr_gt_ids_list:
            gt_id_idx = curr_gt_ids_list.index(gid)
            if gt_id_idx in fn_inds:
                matched[prev_idx, -1] = 1  # FN track

    # dead: everything else (prev FPs + vanished TPs)
    matched[:, -2] = 1 - matched.sum(axis=1)
    return matched, newborn
