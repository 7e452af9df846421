"""PointPillars-style readers (CenterPoint-heritage model-zoo components).

Behavioral reference: det3d/models/readers/pillar_encoder.py:59
(PillarFeatureNet: per-pillar point features augmented with cluster-mean
and pillar-center offsets -> Linear+BN+ReLU -> max pool) and :166
(PointPillarsScatter: per-pillar features scattered into a dense BEV
canvas). Fixed-shape/masked for TPU; not on the ShaSTA main path (the
flagship trunk is the sparse 3D ResNet) but part of the model zoo.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


class PillarFeatureNet(nn.Module):
    num_filters: Sequence[int] = (64,)
    num_input_features: int = 5
    voxel_size: Sequence[float] = (0.2, 0.2)
    pc_range: Sequence[float] = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)

    @nn.compact
    def __call__(self, voxels, num_points, coords, train: bool = False):
        """voxels (V, P, C); num_points (V,); coords (V, 3) zyx.
        Returns (V, num_filters[-1])."""
        V, P, C = voxels.shape
        mask = (
            jnp.arange(P)[None, :] < num_points[:, None]
        )[..., None]  # (V, P, 1)

        # cluster-mean offset (pillar_encoder.py:100-104)
        denom = jnp.maximum(num_points, 1).astype(voxels.dtype)[:, None, None]
        mean = jnp.sum(voxels[:, :, :3] * mask, axis=1, keepdims=True) / denom
        f_cluster = voxels[:, :, :3] - mean

        # pillar-center offset (pillar_encoder.py:106-110); coords are zyx
        vx, vy = self.voxel_size[0], self.voxel_size[1]
        x0, y0 = self.pc_range[0], self.pc_range[1]
        cx = (coords[:, 2].astype(voxels.dtype) * vx + vx / 2 + x0)[:, None]
        cy = (coords[:, 1].astype(voxels.dtype) * vy + vy / 2 + y0)[:, None]
        f_center = jnp.stack(
            [voxels[:, :, 0] - cx, voxels[:, :, 1] - cy], axis=-1
        )

        x = jnp.concatenate([voxels, f_cluster, f_center], axis=-1)
        x = jnp.where(mask, x, 0.0)
        for i, f in enumerate(self.num_filters):
            x = nn.Dense(f, use_bias=False, name=f"pfn_{i}")(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.99, epsilon=1e-3,
                name=f"bn_{i}",
            )(x)
            x = nn.relu(x)
            x = jnp.where(mask, x, -jnp.inf)
            pooled = jnp.max(x, axis=1)  # (V, f)
            if i + 1 < len(self.num_filters):
                x = jnp.concatenate(
                    [x, jnp.broadcast_to(pooled[:, None, :], x.shape)], axis=-1
                )
        return jnp.where(jnp.isfinite(pooled), pooled, 0.0)


def point_pillars_scatter(
    pillar_feats: jnp.ndarray,  # (V, C)
    coords: jnp.ndarray,  # (V, 4) [b, z, y, x] (z unused)
    valid: jnp.ndarray,  # (V,)
    batch_size: int,
    ny: int,
    nx: int,
) -> jnp.ndarray:
    """Scatter pillars into a dense (B, ny, nx, C) canvas
    (pillar_encoder.py:166-210)."""
    C = pillar_feats.shape[1]
    canvas = jnp.zeros((batch_size, ny, nx, C), pillar_feats.dtype)
    b = jnp.where(valid, coords[:, 0], batch_size)
    return canvas.at[b, coords[:, 2], coords[:, 3]].set(pillar_feats, mode="drop")
