"""Bilinear sampling of BEV feature maps (batched gather, XLA-fusable).

Behavioral reference: det3d/core/utils/center_utils.py:92-121
(bilinear_interpolate_torch) and det3d/models/second_stage/bird_eye_view.py
(absl_to_relative + per-batch loop). Here the per-batch-item Python loop is
replaced by a single vmapped gather so the whole (B, N, P) sampling runs as
one fused XLA computation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_interpolate(im: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Sample im (H, W, C) at float positions x, y (each (...,)) -> (..., C).

    Out-of-range coordinates clamp to the border, matching the reference's
    torch.clamp behavior (center_utils.py:106-109).
    """
    H, W = im.shape[0], im.shape[1]
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    x0c = jnp.clip(x0, 0, W - 1)
    x1c = jnp.clip(x1, 0, W - 1)
    y0c = jnp.clip(y0, 0, H - 1)
    y1c = jnp.clip(y1, 0, H - 1)

    Ia = im[y0c, x0c]
    Ib = im[y1c, x0c]
    Ic = im[y0c, x1c]
    Id = im[y1c, x1c]

    # Weights use the *unclamped* integer neighbors, exactly like the
    # reference (center_utils.py:116-119).
    wa = (x1 - x) * (y1 - y)
    wb = (x1 - x) * (y - y0)
    wc = (x - x0) * (y1 - y)
    wd = (x - x0) * (y - y0)
    return (
        Ia * wa[..., None]
        + Ib * wb[..., None]
        + Ic * wc[..., None]
        + Id * wd[..., None]
    )


def absl_to_relative(
    xy: jnp.ndarray, pc_start, voxel_size, out_stride: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """World xy -> fractional BEV pixel coords (bird_eye_view.py:18-22)."""
    a1 = (xy[..., 0] - pc_start[0]) / voxel_size[0] / out_stride
    a2 = (xy[..., 1] - pc_start[1]) / voxel_size[1] / out_stride
    return a1, a2


def sample_bev_features(
    bev: jnp.ndarray,
    points: jnp.ndarray,
    pc_start,
    voxel_size,
    out_stride: int,
) -> jnp.ndarray:
    """Batched 5-point BEV descriptor extraction.

    bev: (B, H, W, C) feature maps (channels-last).
    points: (B, N, P, 3) world-frame sample points.
    Returns (B, N, P*C): per-box descriptor with per-point features
    concatenated channel-wise in point order, matching the reference's
    section re-concat (bird_eye_view.py:35-37).
    """
    xs, ys = absl_to_relative(points[..., :2], pc_start, voxel_size, out_stride)

    def _one(im, xs_b, ys_b):
        feats = bilinear_interpolate(im, xs_b, ys_b)  # (N, P, C)
        return feats.reshape(feats.shape[0], -1)  # (N, P*C)

    return jax.vmap(_one)(bev, xs, ys)
