"""Native host runtime: C++ geometry/NMS/voxelizer via ctypes.

These are the native-code counterparts of the reference's C++/CUDA/numba
components (det3d/ops/iou3d_nms, point_cloud_ops.py, mot_3d pc_in_box):
the TPU compute path stays JAX/XLA; the host data path gets C++ speed
without pybind11 (plain C ABI + ctypes).

The library is compiled on first use (g++ -O3, cached under _build/). Every
entry point has a numpy fallback, so the package works without a compiler.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "src", "host_ops.cpp")
_BUILD_DIR = os.path.join(os.path.dirname(__file__), "_build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libshasta_host.so")
_lock = threading.Lock()
_lib = None
_lib_failed = False


def _load() -> ctypes.CDLL | None:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            if not os.path.exists(_LIB_PATH) or (
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
            ):
                os.makedirs(_BUILD_DIR, exist_ok=True)
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     "-pthread", _SRC, "-o", _LIB_PATH],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(_LIB_PATH)
            f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
            i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
            i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
            u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
            lib.boxes_iou_bev.argtypes = [f32p, ctypes.c_int, f32p, ctypes.c_int, f32p]
            lib.boxes_iou_3d.argtypes = [f32p, ctypes.c_int, f32p, ctypes.c_int, f32p]
            lib.boxes_overlap_bev.argtypes = [f32p, ctypes.c_int, f32p, ctypes.c_int, f32p]
            lib.rotate_nms.argtypes = [f32p, f32p, ctypes.c_int, ctypes.c_float, i64p]
            lib.rotate_nms.restype = ctypes.c_int
            lib.pc_in_box.argtypes = [f32p, f32p, ctypes.c_int, ctypes.c_float, u8p]
            lib.points_to_voxel.argtypes = [
                f32p, ctypes.c_int, ctypes.c_int, f32p, f32p,
                ctypes.c_int, ctypes.c_int, f32p, i32p, i32p,
            ]
            lib.points_to_voxel.restype = ctypes.c_int
            lib.crc32c.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_uint32,
            ]
            lib.crc32c.restype = ctypes.c_uint32
            i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
            u16p = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
            lib.plan_group.argtypes = [
                i64p, ctypes.c_int, i64p, u8p, u8p, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, u16p, i32p,
            ]
            lib.plan_group.restype = ctypes.c_int
            lib.strided_out_keys.argtypes = [
                i32p, u8p, ctypes.c_int, i32p, i32p, i32p, i32p,
                ctypes.c_int, i64p, ctypes.c_int64,
            ]
            lib.strided_out_keys.restype = ctypes.c_int
            _lib = lib
        except Exception:
            _lib_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def iou_bev(boxes1: np.ndarray, boxes2: np.ndarray) -> np.ndarray:
    """Pairwise rotated BEV IoU; geometry rows [x,y,z,w,l,h,yaw]."""
    lib = _load()
    b1 = np.ascontiguousarray(boxes1, np.float32)
    b2 = np.ascontiguousarray(boxes2, np.float32)
    if lib is None:
        import jax.numpy as jnp

        from ..core.geometry import iou_bev as jiou

        return np.asarray(jiou(jnp.asarray(b1), jnp.asarray(b2)))
    out = np.empty((len(b1), len(b2)), np.float32)
    lib.boxes_iou_bev(b1, len(b1), b2, len(b2), out)
    return out


def iou_3d(boxes1: np.ndarray, boxes2: np.ndarray) -> np.ndarray:
    lib = _load()
    b1 = np.ascontiguousarray(boxes1, np.float32)
    b2 = np.ascontiguousarray(boxes2, np.float32)
    if lib is None:
        import jax.numpy as jnp

        from ..core.geometry import iou_3d as jiou

        return np.asarray(jiou(jnp.asarray(b1), jnp.asarray(b2)))
    out = np.empty((len(b1), len(b2)), np.float32)
    lib.boxes_iou_3d(b1, len(b1), b2, len(b2), out)
    return out


def rotate_nms(boxes7: np.ndarray, scores: np.ndarray, iou_threshold: float) -> np.ndarray:
    lib = _load()
    b = np.ascontiguousarray(boxes7, np.float32)
    s = np.ascontiguousarray(scores, np.float32)
    if lib is None:
        from ..ops.nms import rotate_nms_np

        return rotate_nms_np(b, s, iou_threshold)
    keep = np.empty(len(b), np.int64)
    k = lib.rotate_nms(b, s, len(b), iou_threshold, keep)
    return keep[:k]


def pc_in_box(box_mot: np.ndarray, pc: np.ndarray, scale: float = 1.5) -> np.ndarray:
    """mot-layout box [x,y,z,o,l,w,h]; pc (P, >=3). Returns bool mask."""
    lib = _load()
    b = np.ascontiguousarray(box_mot[:7], np.float32)
    p = np.ascontiguousarray(pc[:, :3], np.float32)
    if lib is None:
        # replicate the C++ kernel (host_ops.cpp pc_in_box) directly
        dx, dy = p[:, 0] - b[0], p[:, 1] - b[1]
        cs, sn = np.cos(b[3]), np.sin(b[3])
        rx = dx * cs + dy * sn
        ry = -dx * sn + dy * cs
        rz = p[:, 2] - b[2]
        return (
            (np.abs(rx) < b[4] * scale / 2)
            & (np.abs(ry) < b[5] * scale / 2)
            & (np.abs(rz) < b[6] * scale / 2)
        )
    mask = np.empty(len(p), np.uint8)
    lib.pc_in_box(b, p, len(p), scale, mask)
    return mask.astype(bool)


def crc32c(data: bytes, crc: int = 0) -> int:
    """Castagnoli CRC (TFRecord framing); python fallback in data/tfrecord."""
    lib = _load()
    if lib is None:
        from ..data.tfrecord import _crc32c_py

        return _crc32c_py(data, crc)
    return int(lib.crc32c(data, len(data), crc))


def points_to_voxel(points: np.ndarray, voxel_size, coors_range,
                    max_points: int = 10, max_voxels: int = 120000):
    """Exact-parity native voxelizer; falls back to the numpy version."""
    lib = _load()
    if lib is None:
        from ..ops.voxelize import points_to_voxel_np

        return points_to_voxel_np(points, voxel_size, coors_range, max_points, max_voxels)
    p = np.ascontiguousarray(points, np.float32)
    n, c = p.shape
    vs = np.asarray(voxel_size, np.float32)
    cr = np.asarray(coors_range, np.float32)
    voxels = np.zeros((max_voxels, max_points, c), np.float32)
    coors = np.zeros((max_voxels, 3), np.int32)
    nump = np.zeros((max_voxels,), np.int32)
    m = lib.points_to_voxel(p, n, c, vs, cr, max_points, max_voxels, voxels, coors, nump)
    return voxels[:m], coors[:m], nump[:m]


def plan_group(keys: np.ndarray, qc: np.ndarray, rm: np.ndarray,
               rp: np.ndarray, *, H: int, NBWL: int, GB: int, tile: int,
               nwin: int, NBr: int):
    """Native sparse-conv PosWord planner (threaded over tiles); returns
    (pos (Mp, G) uint16, bases (T, nwin*G) int32, ok) or None when the
    library is unavailable (caller uses the numpy reference,
    shasta_tpu/plans.py)."""
    lib = _load()
    if lib is None or not hasattr(lib, "plan_group"):
        return None
    keys = np.ascontiguousarray(keys, np.int64)
    qc = np.ascontiguousarray(qc, np.int64)
    M, G = qc.shape
    T = (M + tile - 1) // tile
    pos = np.zeros((T * tile, G), np.uint16)
    bases = np.zeros((T, nwin * G), np.int32)
    rm1 = np.ascontiguousarray(np.asarray(rm).reshape(M, -1)[:, 0], np.uint8)
    rp1 = np.ascontiguousarray(np.asarray(rp).reshape(M, -1)[:, 0], np.uint8)
    ok = lib.plan_group(keys, len(keys), qc, rm1, rp1,
                        M, G, H, NBWL, GB, tile, nwin, NBr, pos, bases)
    return pos, bases, bool(ok)


def strided_out_keys(coords: np.ndarray, valid: np.ndarray, kernel, stride,
                     padding, shape, max_out: int, sentinel: int):
    """Native spconv output-set builder (sort-free k-way merge); returns
    (max_out,) int64 ascending keys with sentinel pads, or None when the
    library is unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "strided_out_keys"):
        return None
    out = np.empty((max_out,), np.int64)
    lib.strided_out_keys(
        np.ascontiguousarray(coords, np.int32),
        np.ascontiguousarray(valid, np.uint8), len(coords),
        np.asarray(kernel, np.int32), np.asarray(stride, np.int32),
        np.asarray(padding, np.int32), np.asarray(shape, np.int32),
        max_out, out, sentinel)
    return out
