"""Voxel feature encoders (pure functions).

Behavioral reference: det3d/models/readers/voxel_encoder.py:10-28
(VoxelFeatureExtractorV3): per-voxel mean of the first `num_input_features`
point features. Stateless, so implemented as a function rather than a module.
"""
from __future__ import annotations

import jax.numpy as jnp


def voxel_mean_vfe(
    features: jnp.ndarray, num_points: jnp.ndarray, num_input_features: int = 5
) -> jnp.ndarray:
    """features: (V, P, C) padded points per voxel; num_points: (V,).

    Returns (V, num_input_features) per-voxel point means. Padded voxels
    (num_points == 0) yield zeros (the reference never sees them because it
    passes exact-size arrays; we pad to a static V and rely on zero features
    + the valid mask downstream).
    """
    s = jnp.sum(features[:, :, :num_input_features], axis=1)
    denom = jnp.maximum(num_points, 1).astype(s.dtype)[:, None]
    return s / denom
