"""NMS suite: SimpleTrack weighted BEV NMS, circle NMS, rotated NMS.

Replaces three reference components:
- preprocessing/py_nms/nms.py:13-80 (score-ordered suppression with
  score-weighted box voting + yaw-median filtering) — host numpy, with the
  pairwise IoU3D matrix computed ONCE via the vectorized clipper instead of
  per-pair shapely polygons (the coarse grid hash becomes unnecessary).
- det3d/core/utils/circle_nms_jit.py:4 (numba center-distance NMS) — both a
  host numpy version and a fixed-shape on-device jax version.
- det3d/ops/iou3d_nms CUDA rotated NMS (iou3d_nms_kernel.cu) — a
  fixed-shape jax version (mask matrix + lax.scan suppression) usable
  inside jit, plus host numpy.

Boxes here are mot arrays [x, y, z, o(yaw), l, w, h, s].
"""
from __future__ import annotations

import numpy as np

from ..core import geometry
from ..mot.bbox import MotBBox


def _iou3d_matrix(dets: np.ndarray) -> np.ndarray:
    import jax.numpy as jnp

    g = MotBBox.to_geometry_rows(dets)
    return np.asarray(geometry.iou_3d(jnp.asarray(g), jnp.asarray(g)))


def weighted_nms(
    dets: np.ndarray,
    inst_types: list,
    threshold_low: float = 0.1,
    threshold_high: float = 0.5,
    threshold_yaw: float = 0.3,
):
    """SimpleTrack BEV weighted-mean NMS (py_nms/nms.py:13-80 semantics).

    Survivors above threshold_high vote a score-weighted average box whose
    yaw outliers (vs the median yaw) are excluded; boxes above
    threshold_low are suppressed. Returns (result_boxes (K, 8), types)."""
    dets = np.atleast_2d(np.asarray(dets, np.float64))
    n = len(dets)
    if n == 0:
        return np.zeros((0, 8)), []
    scores = dets[:, 7]
    yaws = dets[:, 3]
    iou = _iou3d_matrix(dets)
    order = list(np.argsort(-scores, kind="stable"))

    result, result_types = [], []
    alive = np.ones(n, bool)
    for index in np.argsort(-scores, kind="stable"):
        if not alive[index]:
            continue
        # degenerate boxes are dropped outright (nms.py weird_bbox)
        if dets[index, 4] <= 0 or dets[index, 5] <= 0 or dets[index, 6] <= 0:
            alive[index] = False
            continue
        same_type = np.array([inst_types[i] == inst_types[index] for i in range(n)])
        related = alive & same_type
        ious = np.where(related, iou[index], 0.0)
        vote_idx = np.nonzero(ious > threshold_high)[0]

        if len(vote_idx) >= 2:
            if len(vote_idx) <= 2:
                median_yaw = yaws[vote_idx][np.argmax(scores[vote_idx])]
            elif len(vote_idx) % 2 == 0:
                median_yaw = np.median(np.append(yaws[vote_idx], yaws[vote_idx][0]))
            else:
                median_yaw = np.median(yaws[vote_idx])
            keep_yaw = np.abs(yaws[vote_idx] - median_yaw) % (2 * np.pi) < threshold_yaw
            vote_idx = vote_idx[keep_yaw]
            w = scores[vote_idx][:, None]
            avg = np.sum(w * dets[vote_idx, :7], axis=0) / np.sum(w)
            out = np.append(avg, scores[index])
            result.append(out)
        else:
            result.append(dets[index].copy())
        result_types.append(inst_types[index])
        alive &= ~(ious > threshold_low)

    return np.stack(result) if result else np.zeros((0, 8)), result_types


def circle_nms_np(dets_xys: np.ndarray, thresh: float, post_max_size: int | None = None):
    """Center-distance NMS; dets_xys rows [x, y, score]
    (circle_nms_jit.py:4-30 semantics). Returns kept indices."""
    order = np.argsort(-dets_xys[:, 2], kind="stable")
    suppressed = np.zeros(len(dets_xys), bool)
    keep = []
    for i in order:
        if suppressed[i]:
            continue
        keep.append(int(i))
        d2 = (dets_xys[:, 0] - dets_xys[i, 0]) ** 2 + (dets_xys[:, 1] - dets_xys[i, 1]) ** 2
        suppressed |= d2 <= thresh
        suppressed[i] = True
    if post_max_size is not None:
        keep = keep[:post_max_size]
    return np.asarray(keep, np.int64)


def rotate_nms_np(boxes7: np.ndarray, scores: np.ndarray, iou_threshold: float,
                  pre_max_size: int | None = None, post_max_size: int | None = None):
    """Rotated-BEV NMS (box_torch_ops.rotate_nms_pcdet / iou3d_nms.cpp
    semantics). boxes7: geometry rows [x,y,z,w,l,h,yaw]. Returns indices."""
    import jax.numpy as jnp

    order = np.argsort(-scores, kind="stable")
    if pre_max_size is not None:
        order = order[:pre_max_size]
    b = np.asarray(boxes7)[order]
    iou = np.asarray(geometry.iou_bev(jnp.asarray(b), jnp.asarray(b)))
    n = len(order)
    suppressed = np.zeros(n, bool)
    keep = []
    for i in range(n):
        if suppressed[i]:
            continue
        keep.append(int(order[i]))
        suppressed |= iou[i] > iou_threshold
        suppressed[i] = True
    if post_max_size is not None:
        keep = keep[:post_max_size]
    return np.asarray(keep, np.int64)


def rotate_nms_jax(boxes7, scores, iou_threshold: float):
    """Fixed-shape on-device rotated NMS: returns a keep mask (N,).

    Score-ordered greedy suppression expressed as a lax.scan over the
    pre-sorted IoU mask matrix — the XLA equivalent of the reference's
    64-bit suppression-mask CUDA kernel (iou3d_nms.cpp:90-117)."""
    import jax
    import jax.numpy as jnp

    n = boxes7.shape[0]
    order = jnp.argsort(-scores, stable=True)
    b = boxes7[order]
    iou = geometry.iou_bev(b, b)
    over = iou > iou_threshold

    def body(suppressed, i):
        alive = ~suppressed[i]
        row = over[i] & (jnp.arange(n) > i) & alive
        return suppressed | row, alive

    suppressed, alive = jax.lax.scan(body, jnp.zeros(n, bool), jnp.arange(n))
    keep_sorted = alive
    keep = jnp.zeros(n, bool).at[order].set(keep_sorted)
    return keep
