"""RPN neck + shared conv, NHWC/flax (TPU-native layout).

Behavioral reference: det3d/models/necks/rpn.py:24-163 (2-block conv FPN with
deconv branches concatenated to a 512-channel BEV map) and
det3d/models/tracker/shasta.py:42-47 (3x3 shared conv 512->64 + BN + ReLU).

Differences from the reference implementation (not from its math):
- NHWC everywhere (XLA's preferred TPU layout) instead of NCHW.
- Neck/backbone BatchNorm eps=1e-3, flax momentum 0.99 == torch momentum
  0.01 (det3d norm_cfg, necks/rpn.py:47); SharedConv BN uses plain torch
  BatchNorm2d defaults eps=1e-5 (shasta.py:45).
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


class ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    use_bias: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.99,
            epsilon=1e-3,
            dtype=jnp.float32,
            name="bn",
        )(x)
        return nn.relu(x)


class RPNBlock(nn.Module):
    """One downsample stage: strided conv + `num_blocks` convs (rpn.py:125-143)."""

    planes: int
    num_blocks: int
    stride: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNReLU(
            self.planes, stride=self.stride, dtype=self.dtype, name="down"
        )(x, train)
        for j in range(self.num_blocks):
            x = ConvBNReLU(self.planes, dtype=self.dtype, name=f"conv_{j}")(x, train)
        return x


class Deblock(nn.Module):
    """Upsample branch: ConvTranspose (stride>1) or 1x1 conv (rpn.py:80-111)."""

    planes: int
    stride: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.stride > 1:
            x = nn.ConvTranspose(
                self.planes,
                (self.stride, self.stride),
                strides=(self.stride, self.stride),
                padding="VALID",
                use_bias=False,
                dtype=self.dtype,
                name="deconv",
            )(x)
        else:
            x = nn.Conv(
                self.planes,
                (1, 1),
                strides=(1, 1),
                padding="VALID",
                use_bias=False,
                dtype=self.dtype,
                name="conv",
            )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.99,
            epsilon=1e-3,
            dtype=jnp.float32,
            name="bn",
        )(x)
        return nn.relu(x)


class RPN(nn.Module):
    """CenterPoint RPN: config neck dims from configs/nusc/car.py:52-61."""

    layer_nums: Sequence[int] = (5, 5)
    ds_layer_strides: Sequence[int] = (1, 2)
    ds_num_filters: Sequence[int] = (128, 256)
    us_layer_strides: Sequence[int] = (1, 2)
    us_num_filters: Sequence[int] = (256, 256)
    num_input_features: int = 256
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ups = []
        for i, n in enumerate(self.layer_nums):
            x = RPNBlock(
                self.ds_num_filters[i],
                n,
                self.ds_layer_strides[i],
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, train)
            ups.append(
                Deblock(
                    self.us_num_filters[i],
                    self.us_layer_strides[i],
                    dtype=self.dtype,
                    name=f"deblock_{i}",
                )(x, train)
            )
        return jnp.concatenate(ups, axis=-1)  # (B, H, W, 512)


class SharedConv(nn.Module):
    """3x3 conv in->share_conv_channel + BN + ReLU (shasta.py:42-47)."""

    features: int = 64
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            (3, 3),
            padding=[(1, 1), (1, 1)],
            use_bias=True,
            dtype=self.dtype,
            name="conv",
        )(x)
        # Plain torch BatchNorm2d defaults (shasta.py:45): eps=1e-5 /
        # momentum 0.1 — UNLIKE the neck/backbone BNs, which use the det3d
        # norm_cfg eps=1e-3 (necks/rpn.py:47). Pinned by the vendored
        # reference-source parity test (tests/test_reference_literal.py).
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
            name="bn",
        )(x)
        return nn.relu(x)
