"""Box geometry primitives (pure JAX, fixed shapes, vmap-friendly).

Behavioral reference: det3d/core/bbox/box_torch_ops.py (corners_nd:25-60,
rotation_2d:145-158, center_to_corner_box2d:184-204) and
det3d/models/tracker/shasta.py:121-161 (5-point box sampling), re-derived
for batched fixed-shape TPU execution rather than per-box host loops.

Box row convention (11 features, det3d/datasets/nuscenes/nuscenes.py:230-232):
    [x, y, z, w, l, h, yaw, vx, vy, dt, score]
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Clockwise unit-square corner layout used by the reference
# (box_torch_ops.corners_nd: x0y0, x0y1, x1y1, x1y0 minus 0.5 origin).
_CORNERS_NORM_2D = np.array(
    [[-0.5, -0.5], [-0.5, 0.5], [0.5, 0.5], [0.5, -0.5]], dtype=np.float32
)


def rotation_2d(points: jnp.ndarray, angles: jnp.ndarray) -> jnp.ndarray:
    """Rotate 2D points clockwise for positive angles.

    points: (..., P, 2); angles: (...,). Matches box_torch_ops.rotation_2d:
    out_x = x*cos + y*sin, out_y = -x*sin + y*cos.
    """
    c = jnp.cos(angles)[..., None]
    s = jnp.sin(angles)[..., None]
    x, y = points[..., 0], points[..., 1]
    return jnp.stack([x * c + y * s, -x * s + y * c], axis=-1)


def center_to_corner_box2d(
    centers: jnp.ndarray, dims: jnp.ndarray, angles: jnp.ndarray
) -> jnp.ndarray:
    """BEV corners of rotated rectangles.

    centers: (..., N, 2), dims: (..., N, 2), angles: (..., N).
    Returns (..., N, 4, 2) with the reference's clockwise corner order.
    """
    corners = dims[..., None, :] * jnp.asarray(_CORNERS_NORM_2D)
    corners = rotation_2d(corners, angles)
    return corners + centers[..., None, :]


def box_points_5(boxes7: jnp.ndarray) -> jnp.ndarray:
    """Sample 5 descriptor points per box: center + 4 face midpoints.

    boxes7: (..., N, 7) rows [x, y, z, w, l, h, yaw].
    Returns (..., N, 5, 3), point order [center, front, back, left, right]
    matching shasta.py:143-159 (which stacks the 5 groups along dim 0 and
    later re-concats per-point features channel-wise; here we keep the
    (N, 5) layout and flatten channels in the same order downstream).
    """
    center2d = boxes7[..., :2]
    height = boxes7[..., 2:3]
    dim2d = boxes7[..., 3:5]
    yaw = boxes7[..., 6]
    c = center_to_corner_box2d(center2d, dim2d, yaw)  # (..., N, 4, 2)
    front = (c[..., 0, :] + c[..., 1, :]) / 2
    back = (c[..., 2, :] + c[..., 3, :]) / 2
    left = (c[..., 0, :] + c[..., 3, :]) / 2
    right = (c[..., 1, :] + c[..., 2, :]) / 2
    mids = jnp.stack([front, back, left, right], axis=-2)  # (..., N, 4, 2)
    mids3d = jnp.concatenate(
        [mids, jnp.broadcast_to(height[..., None, :], mids.shape[:-1] + (1,))],
        axis=-1,
    )
    center3d = boxes7[..., None, :3]  # (..., N, 1, 3)
    return jnp.concatenate([center3d, mids3d], axis=-2)


def quaternion_yaw(q: np.ndarray) -> float:
    """Yaw from a [w, x, y, z] quaternion (lidar/global frame boxes).

    Matches det3d/datasets/nuscenes/nuscenes.py:35-50 (rotates [1,0,0] by the
    quaternion and takes atan2 of the xy projection) without pyquaternion.
    """
    q = np.asarray(q, np.float64)
    n = np.linalg.norm(q)
    w, x, y, z = q / (n if n > 0 else 1.0)  # pyquaternion normalizes
    # First column of the rotation matrix = R @ [1,0,0].
    vx = 1.0 - 2.0 * (y * y + z * z)
    vy = 2.0 * (x * y + z * w)
    return float(np.arctan2(vy, vx))


def yaw_to_quaternion(yaw: float) -> np.ndarray:
    """Inverse of :func:`quaternion_yaw` for z-axis rotations -> [w,x,y,z]."""
    return np.array([np.cos(yaw / 2.0), 0.0, 0.0, np.sin(yaw / 2.0)])


def corners_bev(boxes: jnp.ndarray) -> jnp.ndarray:
    """BEV corners for boxes (..., N, >=7) with [x,y,_,w,l,_,yaw] layout."""
    return center_to_corner_box2d(boxes[..., :2], boxes[..., 3:5], boxes[..., 6])
