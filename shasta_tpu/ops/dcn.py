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
