"""Deformable convolution v1/v2 (XLA-native, CenterPoint-heritage op).

Behavioral reference: det3d/ops/dcn/ (CUDA deform conv kernels + python
wrapper deform_conv.py). Not on the ShaSTA model path in the reference
either (SURVEY §2.7) — provided for model-zoo parity. Implemented as
bilinear sampling at offset tap positions + one grouped matmul; this is
exactly the im2col formulation the CUDA kernel computes, expressed so XLA
fuses the sampling arithmetic.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _bilinear_hw(x: jnp.ndarray, py: jnp.ndarray, px: jnp.ndarray) -> jnp.ndarray:
    """x: (H, W, C); py/px: (...,) float positions. Zero outside."""
    H, W = x.shape[:2]
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    wy = py - y0
    wx = px - x0
    out = 0.0
    for dy, sy in ((0, 1 - wy), (1, wy)):
        for dx, sx in ((0, 1 - wx), (1, wx)):
            yy = (y0 + dy).astype(jnp.int32)
            xx = (x0 + dx).astype(jnp.int32)
            ok = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
            v = x[jnp.clip(yy, 0, H - 1), jnp.clip(xx, 0, W - 1)]
            out = out + v * (sy * sx * ok)[..., None]
    return out


class DeformConv2d(nn.Module):
    """3x3 deformable conv; offsets (and v2 modulation) from a plain conv."""

    features: int
    kernel: int = 3
    modulated: bool = True  # v2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        k = self.kernel
        K = k * k
        n_off = 3 * K if self.modulated else 2 * K
        off = nn.Conv(
            n_off, (k, k), padding="SAME",
            kernel_init=nn.initializers.zeros, name="offset_conv",
        )(x)
        offsets = off[..., : 2 * K].reshape(B, H, W, K, 2)
        if self.modulated:
            mod = nn.sigmoid(off[..., 2 * K :]).reshape(B, H, W, K)
        else:
            mod = jnp.ones((B, H, W, K), x.dtype)

        taps = np.stack(
            np.meshgrid(np.arange(k) - k // 2, np.arange(k) - k // 2, indexing="ij"),
            axis=-1,
        ).reshape(K, 2)
        gy = jnp.arange(H)[:, None, None] + jnp.asarray(taps[:, 0])[None, None, :]
        gx = jnp.arange(W)[None, :, None] + jnp.asarray(taps[:, 1])[None, None, :]
        py = gy[None] + offsets[..., 0]
        px = gx[None] + offsets[..., 1]

        import jax

        sampled = jax.vmap(_bilinear_hw)(x, py, px)  # (B, H, W, K, C)
        sampled = sampled * mod[..., None]
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (K * C, self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return sampled.reshape(B, H, W, K * C) @ w + b


def deform_psroi_pooling(
    data: jnp.ndarray,
    rois: jnp.ndarray,
    trans: jnp.ndarray | None,
    *,
    spatial_scale: float,
    output_dim: int,
    group_size: int,
    pooled_size: int,
    part_size: int | None = None,
    sample_per_part: int = 4,
    trans_std: float = 0.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Deformable position-sensitive RoI pooling (forward).

    Behavioral reference: det3d/ops/dcn/src/deform_pool_cuda_kernel.cu
    DeformablePSROIPoolForwardKernel (:53-140) — the half of the DCN
    extension the reference ships as raw CUDA with no python wrapper.
    The hand-written CUDA backward (:143-) is unnecessary here: this is
    pure jnp, so jax.grad differentiates it (including through the trans
    offsets).

    Args (shapes follow the CUDA binding, NHWC for the feature map):
      data: (B, H, W, C) with C == output_dim * group_size**2
        (position-sensitive channel groups).
      rois: (N, 5) rows [batch_idx, x1, y1, x2, y2] in input-image coords.
      trans: (N, num_classes*2, part_size, part_size) normalized bin
        offsets, or None for the no_trans path.
    Returns (pooled (N, pooled_size, pooled_size, output_dim),
    counts (N, pooled_size, pooled_size, output_dim)) — counts is the
    number of in-bounds samples per bin (the CUDA top_count output, which
    its backward consumes; surfaced for parity and debugging).
    """
    B, H, W, C = data.shape
    assert C == output_dim * group_size * group_size, (C, output_dim, group_size)
    N = rois.shape[0]
    P, S, G = pooled_size, sample_per_part, group_size
    part = part_size if part_size is not None else pooled_size
    num_classes = 1 if trans is None else trans.shape[1] // 2
    ch_each = output_dim // num_classes

    b_idx = rois[:, 0].astype(jnp.int32)  # (N,)
    start_w = jnp.round(rois[:, 1]) * spatial_scale - 0.5
    start_h = jnp.round(rois[:, 2]) * spatial_scale - 0.5
    end_w = (jnp.round(rois[:, 3]) + 1.0) * spatial_scale - 0.5
    end_h = (jnp.round(rois[:, 4]) + 1.0) * spatial_scale - 0.5
    roi_w = jnp.maximum(end_w - start_w, 0.1)  # (N,)
    roi_h = jnp.maximum(end_h - start_h, 0.1)
    bin_w = roi_w / P
    bin_h = roi_h / P
    sub_w = bin_w / S
    sub_h = bin_h / S

    ph = jnp.arange(P)
    pw = jnp.arange(P)
    part_h = jnp.floor(ph.astype(jnp.float32) / P * part).astype(jnp.int32)
    part_w = jnp.floor(pw.astype(jnp.float32) / P * part).astype(jnp.int32)
    cls_id = (jnp.arange(output_dim) // ch_each).astype(jnp.int32)  # (D,)

    if trans is None:
        tx = jnp.zeros((N, output_dim, P, P))
        ty = jnp.zeros((N, output_dim, P, P))
    else:
        # trans[(n, class_id*2 + {0,1}, part_h, part_w)] * trans_std
        tx = trans[:, cls_id * 2][:, :, part_h][:, :, :, part_w] * trans_std
        ty = trans[:, cls_id * 2 + 1][:, :, part_h][:, :, :, part_w] * trans_std

    # sample positions: (N, D, P, P, S, S)
    wstart = (
        pw[None, None, None, :] * bin_w[:, None, None, None]
        + start_w[:, None, None, None]
    )[:, :, :, :, None, None] + (tx * roi_w[:, None, None, None])[..., None, None]
    hstart = (
        ph[None, None, :, None] * bin_h[:, None, None, None]
        + start_h[:, None, None, None]
    )[:, :, :, :, None, None] + (ty * roi_h[:, None, None, None])[..., None, None]
    sw = wstart + jnp.arange(S)[None, None, None, None, None, :] * sub_w[:, None, None, None, None, None]
    sh = hstart + jnp.arange(S)[None, None, None, None, :, None] * sub_h[:, None, None, None, None, None]

    inb = (sw >= -0.5) & (sw <= W - 0.5) & (sh >= -0.5) & (sh <= H - 0.5)
    x = jnp.clip(sw, 0.0, W - 1.0)
    y = jnp.clip(sh, 0.0, H - 1.0)

    # position-sensitive channel per (d, ph, pw): (ctop*G + gh)*G + gw
    gh = jnp.clip((ph * G) // P, 0, G - 1)
    gw = jnp.clip((pw * G) // P, 0, G - 1)
    chan = (
        (jnp.arange(output_dim)[:, None, None] * G + gh[None, :, None]) * G
        + gw[None, None, :]
    )  # (D, P, P)

    # bilinear via floor/ceil corners (kernel bilinear_interp, :31-51)
    x1 = jnp.floor(x)
    y1 = jnp.floor(y)
    x2 = jnp.ceil(x)
    y2 = jnp.ceil(y)
    dx = x - x1
    dy = y - y1

    bb = b_idx[:, None, None, None, None, None]
    cc = chan[None, :, :, :, None, None]

    def _at(yi, xi):
        return data[
            bb,
            yi.astype(jnp.int32),
            xi.astype(jnp.int32),
            jnp.broadcast_to(cc, yi.shape),
        ]

    val = (
        (1 - dx) * (1 - dy) * _at(y1, x1)
        + (1 - dx) * dy * _at(y2, x1)
        + dx * (1 - dy) * _at(y1, x2)
        + dx * dy * _at(y2, x2)
    )
    val = jnp.where(inb, val, 0.0)
    cnt = jnp.sum(inb, axis=(-1, -2))  # (N, D, P, P)
    pooled = jnp.sum(val, axis=(-1, -2)) / jnp.maximum(cnt, 1)
    pooled = jnp.where(cnt > 0, pooled, 0.0)
    # (N, D, P, P) -> (N, P, P, D) NHWC-style output
    return pooled.transpose(0, 2, 3, 1), cnt.transpose(0, 2, 3, 1)
