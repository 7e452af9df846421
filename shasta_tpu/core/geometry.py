"""Vectorized rotated-box geometry: IoU / GIoU / point-in-box / distances.

Replaces three native components of the reference with fixed-shape XLA code:
- shapely/GEOS polygon intersection (mot_3d/utils/geometry.py:150-229)
- the CUDA Sutherland-Hodgman kernel (det3d/ops/iou3d_nms/src/iou3d_nms_kernel.cu)
- numba pc_in_box kernels (mot_3d/utils/geometry.py:98-138)

Everything operates on batched corner arrays with static shapes so it can be
jit/vmap'd and fused by XLA on TPU. Polygon intersection uses masked
Sutherland-Hodgman clipping with a fixed vertex capacity (a convex quad
clipped by a convex quad has at most 8 vertices).

Box array convention here is the 7-feature BEV row [x, y, z, w, l, h, yaw]
(w along box-local y after rotation, l along x — matching corners from
:mod:`shasta_tpu.core.boxes`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .boxes import corners_bev

_EPS = 1e-8
# Max vertices of quad ∩ quad. 8 is the true bound; we use 8 + padding slack.
_CAP = 8


def polygon_area(verts: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Absolute shoelace area of a masked polygon.

    verts: (..., V, 2); mask: (..., V) booleans marking valid vertices, which
    must be contiguous from index 0. Invalid vertices are replaced by the
    first vertex (degenerate edges contribute zero area).
    """
    n = jnp.sum(mask, axis=-1)
    first = verts[..., :1, :]
    v = jnp.where(mask[..., None], verts, first)
    x, y = v[..., 0], v[..., 1]
    xn = jnp.roll(x, -1, axis=-1)
    yn = jnp.roll(y, -1, axis=-1)
    # roll wraps the last valid vertex to the first via the masked fill.
    area2 = jnp.sum(x * yn - xn * y, axis=-1)
    return jnp.where(n >= 3, jnp.abs(area2) * 0.5, 0.0)


def _clip_one_edge(verts, mask, p1, p2):
    """Clip masked polygon by half-plane right of directed edge p1->p2.

    Assumes clockwise polygons (inside == cross(e, p) <= 0). verts: (V, 2),
    mask: (V,), p1/p2: (2,). Returns clipped (2V, 2) verts + mask, compacted.
    """
    V = verts.shape[0]
    e = p2 - p1
    d = verts - p1
    cross = e[0] * d[:, 1] - e[1] * d[:, 0]
    inside = cross <= _EPS

    nxt = jnp.roll(jnp.arange(V), -1)
    n = jnp.sum(mask)
    # The successor of the last valid vertex is vertex 0.
    nxt = jnp.where(jnp.arange(V) == n - 1, 0, nxt)

    s_in = inside
    e_in = inside[nxt]
    vs = verts
    ve = verts[nxt]
    cs = cross
    ce = cross[nxt]

    # Intersection of segment (vs, ve) with the clip line.
    t = cs / jnp.where(jnp.abs(cs - ce) < _EPS, _EPS, cs - ce)
    inter = vs + t[:, None] * (ve - vs)

    # Each input edge emits up to 2 vertices: [crossing point?, endpoint?].
    emit_inter = mask & (s_in != e_in)
    emit_end = mask & e_in
    out_verts = jnp.stack([inter, ve], axis=1).reshape(2 * V, 2)
    out_mask = jnp.stack([emit_inter, emit_end], axis=1).reshape(2 * V)

    # Compact valid vertices to the front (stable), keeping fixed shape.
    order = jnp.argsort(~out_mask, stable=True)
    return out_verts[order], out_mask[order]


def _quad_clip(sub: jnp.ndarray, clip: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Intersection polygon of two clockwise quads. Returns (verts, mask)."""
    V = 2 * _CAP
    verts = jnp.zeros((V, 2), sub.dtype).at[:4].set(sub)
    mask = jnp.zeros((V,), bool).at[:4].set(True)
    for k in range(4):
        verts, mask = _clip_one_edge(verts, mask, clip[k], clip[(k + 1) % 4])
        # Keep capacity bounded: a convex clip never exceeds _CAP+4 live verts.
        verts, mask = verts[: 2 * _CAP], mask[: 2 * _CAP]
        V = verts.shape[0]
        verts = jnp.pad(verts, ((0, 2 * _CAP - V), (0, 0)))
        mask = jnp.pad(mask, (0, 2 * _CAP - V))
    return verts, mask


def rect_intersection_area(c1: jnp.ndarray, c2: jnp.ndarray) -> jnp.ndarray:
    """Overlap area of two clockwise BEV quads c1, c2: (..., 4, 2)."""

    def _one(a, b):
        v, m = _quad_clip(a, b)
        return polygon_area(v, m)

    flat1 = c1.reshape(-1, 4, 2)
    flat2 = c2.reshape(-1, 4, 2)
    out = jax.vmap(_one)(flat1, flat2)
    return out.reshape(c1.shape[:-2])


def iou_bev(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise rotated BEV IoU. boxes: (N, 7) and (M, 7) -> (N, M)."""
    c1 = corners_bev(boxes1)  # (N, 4, 2)
    c2 = corners_bev(boxes2)  # (M, 4, 2)
    N, M = boxes1.shape[0], boxes2.shape[0]
    cc1 = jnp.broadcast_to(c1[:, None], (N, M, 4, 2))
    cc2 = jnp.broadcast_to(c2[None, :], (N, M, 4, 2))
    inter = rect_intersection_area(cc1, cc2)
    a1 = (boxes1[:, 3] * boxes1[:, 4])[:, None]
    a2 = (boxes2[:, 3] * boxes2[:, 4])[None, :]
    return inter / jnp.maximum(a1 + a2 - inter, _EPS)


def iou_3d(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise 3D IoU with axis-aligned z overlap (geometry.py:171-183)."""
    c1 = corners_bev(boxes1)
    c2 = corners_bev(boxes2)
    N, M = boxes1.shape[0], boxes2.shape[0]
    cc1 = jnp.broadcast_to(c1[:, None], (N, M, 4, 2))
    cc2 = jnp.broadcast_to(c2[None, :], (N, M, 4, 2))
    inter_bev = rect_intersection_area(cc1, cc2)

    zmax1 = boxes1[:, 2] + boxes1[:, 5] / 2
    zmin1 = boxes1[:, 2] - boxes1[:, 5] / 2
    zmax2 = boxes2[:, 2] + boxes2[:, 5] / 2
    zmin2 = boxes2[:, 2] - boxes2[:, 5] / 2
    z_overlap = jnp.maximum(
        0.0,
        jnp.minimum(zmax1[:, None], zmax2[None, :])
        - jnp.maximum(zmin1[:, None], zmin2[None, :]),
    )
    inter_vol = inter_bev * z_overlap
    v1 = (boxes1[:, 3] * boxes1[:, 4] * boxes1[:, 5])[:, None]
    v2 = (boxes2[:, 3] * boxes2[:, 4] * boxes2[:, 5])[None, :]
    return inter_vol / jnp.maximum(v1 + v2 - inter_vol, _EPS)


def _convex_hull_area(points: jnp.ndarray) -> jnp.ndarray:
    """Area of the convex hull of (P, 2) points (fixed-size monotone chain)."""
    P = points.shape[0]
    order = jnp.lexsort((points[:, 1], points[:, 0]))
    pts = points[order]

    def half(pts_ordered):
        # Build one hull chain with a fixed-size stack.
        stack = jnp.zeros((P, 2), pts_ordered.dtype)
        size = 0

        def body(i, carry):
            stack, size = carry
            p = pts_ordered[i]

            def pop_cond(carry2):
                stack, size = carry2
                a = stack[jnp.maximum(size - 2, 0)]
                b = stack[jnp.maximum(size - 1, 0)]
                cr = (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])
                return (size >= 2) & (cr <= 0)

            def pop_body(carry2):
                stack, size = carry2
                return stack, size - 1

            stack, size = jax.lax.while_loop(pop_cond, pop_body, (stack, size))
            stack = stack.at[size].set(p)
            return stack, size + 1

        stack, size = jax.lax.fori_loop(0, P, body, (stack, size))
        return stack, size

    lower, nl = half(pts)
    upper, nu = half(pts[::-1])

    # Concatenate lower[:nl-1] + upper[:nu-1] into a hull polygon.
    V = 2 * P
    verts = jnp.zeros((V, 2), points.dtype)
    mask = jnp.zeros((V,), bool)
    idx = jnp.arange(V)
    low_valid = idx < (nl - 1)
    verts = jnp.where(low_valid[:, None], lower[jnp.clip(idx, 0, P - 1)], verts)
    up_idx = idx - (nl - 1)
    up_valid = (up_idx >= 0) & (up_idx < (nu - 1))
    verts = jnp.where(up_valid[:, None], upper[jnp.clip(up_idx, 0, P - 1)], verts)
    mask = low_valid | up_valid
    return polygon_area(verts, mask)


def giou_bev(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise BEV GIoU (mot_3d/utils/geometry.py giou2d semantics)."""
    c1 = corners_bev(boxes1)
    c2 = corners_bev(boxes2)
    N, M = boxes1.shape[0], boxes2.shape[0]
    cc1 = jnp.broadcast_to(c1[:, None], (N, M, 4, 2)).reshape(-1, 4, 2)
    cc2 = jnp.broadcast_to(c2[None, :], (N, M, 4, 2)).reshape(-1, 4, 2)
    inter = jax.vmap(lambda a, b: polygon_area(*_quad_clip(a, b)))(cc1, cc2)
    hull = jax.vmap(lambda a, b: _convex_hull_area(jnp.concatenate([a, b], 0)))(cc1, cc2)
    a1 = (boxes1[:, 3] * boxes1[:, 4])[:, None]
    a2 = (boxes2[:, 3] * boxes2[:, 4])[None, :]
    inter = inter.reshape(N, M)
    hull = hull.reshape(N, M)
    union = a1 + a2 - inter
    return inter / jnp.maximum(union, _EPS) - (hull - union) / jnp.maximum(hull, _EPS)


def giou_3d(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise 3D GIoU (mot_3d/utils/geometry.py:195-229 semantics)."""
    c1 = corners_bev(boxes1)
    c2 = corners_bev(boxes2)
    N, M = boxes1.shape[0], boxes2.shape[0]
    cc1 = jnp.broadcast_to(c1[:, None], (N, M, 4, 2)).reshape(-1, 4, 2)
    cc2 = jnp.broadcast_to(c2[None, :], (N, M, 4, 2)).reshape(-1, 4, 2)
    inter = jax.vmap(lambda a, b: polygon_area(*_quad_clip(a, b)))(cc1, cc2).reshape(N, M)
    hull = jax.vmap(lambda a, b: _convex_hull_area(jnp.concatenate([a, b], 0)))(
        cc1, cc2
    ).reshape(N, M)

    zmax1 = boxes1[:, 2] + boxes1[:, 5] / 2
    zmin1 = boxes1[:, 2] - boxes1[:, 5] / 2
    zmax2 = boxes2[:, 2] + boxes2[:, 5] / 2
    zmin2 = boxes2[:, 2] - boxes2[:, 5] / 2
    z_overlap = jnp.maximum(
        0.0,
        jnp.minimum(zmax1[:, None], zmax2[None, :])
        - jnp.maximum(zmin1[:, None], zmin2[None, :]),
    )
    z_union = jnp.maximum(zmax1[:, None], zmax2[None, :]) - jnp.minimum(
        zmin1[:, None], zmin2[None, :]
    )
    inter_vol = inter * z_overlap
    hull_vol = hull * z_union
    v1 = (boxes1[:, 3] * boxes1[:, 4] * boxes1[:, 5])[:, None]
    v2 = (boxes2[:, 3] * boxes2[:, 4] * boxes2[:, 5])[None, :]
    union_vol = v1 + v2 - inter_vol
    return inter_vol / jnp.maximum(union_vol, _EPS) - (hull_vol - union_vol) / jnp.maximum(
        hull_vol, _EPS
    )


def pc_in_box(box7: jnp.ndarray, pc: jnp.ndarray, scale: float = 1.5) -> jnp.ndarray:
    """Boolean mask of points inside a (scaled) rotated 3D box.

    box7: (7,) [x,y,z,w,l,h,yaw]; pc: (P, >=3). Matches the numba kernel
    mot_3d/utils/geometry.py:98-119 (scaled w/l/h, yaw-aligned test).
    """
    cx, cy, cz = box7[0], box7[1], box7[2]
    w, l, h = box7[3] * scale, box7[4] * scale, box7[5] * scale
    yaw = box7[6]
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    dx = pc[:, 0] - cx
    dy = pc[:, 1] - cy
    rx = dx * c + dy * s
    ry = -dx * s + dy * c
    in_x = jnp.abs(rx) <= l / 2
    in_y = jnp.abs(ry) <= w / 2
    in_z = jnp.abs(pc[:, 2] - cz) <= h / 2
    return in_x & in_y & in_z


def center_distance(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise BEV center L2 distance (gt_association/associate.py:107-113)."""
    d = boxes1[:, None, :2] - boxes2[None, :, :2]
    return jnp.sqrt(jnp.sum(d * d, axis=-1))


def m_distance(
    det: jnp.ndarray, trk: jnp.ndarray, inv_cov: jnp.ndarray
) -> jnp.ndarray:
    """Mahalanobis distance between state vectors (geometry.py m_distance)."""
    diff = det - trk
    return jnp.sqrt(diff @ inv_cov @ diff)


def score_rectification(dets_mot, gts_mot):
    """Oracle score rectification (mot_3d/utils/geometry.py:274-304): set
    each detection's score to its best 3D IoU with an unclaimed GT
    (claimed in descending-best-IoU order; duplicates 0.2, misses 0.05).

    Host utility over mot-layout rows [x, y, z, yaw, l, w, h, (s)];
    returns the rectified score vector (the reference mutates BBox.s).
    """
    import numpy as np

    dets_mot = np.asarray(dets_mot, np.float64).reshape(-1, dets_mot.shape[-1] if len(dets_mot) else 8)
    n, m = len(dets_mot), len(gts_mot)
    if m == 0 or n == 0:
        return np.zeros((n,), np.float64)

    def to_geom(b):
        # mot [x,y,z,yaw,l,w,h] -> geometry [x,y,z,w,l,h,yaw]
        b = np.asarray(b, np.float64)
        return np.stack([b[:, 0], b[:, 1], b[:, 2], b[:, 5], b[:, 4], b[:, 6], b[:, 3]], 1)

    from .. import runtime

    iou = runtime.iou_3d(to_geom(dets_mot), to_geom(np.asarray(gts_mot)))
    max_idx = np.argmax(iou, axis=1)
    max_iou = np.max(iou, axis=1)
    order = list(reversed(sorted(range(n), key=lambda k: max_iou[k])))
    out = np.empty((n,), np.float64)
    claimed: set[int] = set()
    for i in order:
        if max_iou[i] >= 0.1 and max_idx[i] not in claimed:
            out[i] = max_iou[i]
            claimed.add(int(max_idx[i]))
        elif max_iou[i] >= 0.1:
            out[i] = 0.2
        else:
            out[i] = 0.05
    return out
