"""C++ host ops vs the JAX/numpy reference implementations."""
import numpy as np
import pytest

from shasta_tpu import runtime


pytestmark = pytest.mark.skipif(not runtime.available(), reason="no C++ toolchain")


def _rand_boxes(rng, n, span=8.0):
    b = np.zeros((n, 7), np.float32)
    b[:, :2] = rng.uniform(-span, span, (n, 2))
    b[:, 2] = rng.uniform(-1, 1, n)
    b[:, 3:6] = rng.uniform(1, 4, (n, 3))
    b[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return b


def test_iou_bev_matches_jax(rng):
    import jax.numpy as jnp

    from shasta_tpu.core.geometry import iou_bev

    b1, b2 = _rand_boxes(rng, 12), _rand_boxes(rng, 9)
    got = runtime.iou_bev(b1, b2)
    want = np.asarray(iou_bev(jnp.asarray(b1), jnp.asarray(b2)))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_iou_3d_matches_jax(rng):
    import jax.numpy as jnp

    from shasta_tpu.core.geometry import iou_3d

    b1, b2 = _rand_boxes(rng, 10), _rand_boxes(rng, 10)
    got = runtime.iou_3d(b1, b2)
    want = np.asarray(iou_3d(jnp.asarray(b1), jnp.asarray(b2)))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_rotate_nms_matches_python(rng):
    from shasta_tpu.ops.nms import rotate_nms_np

    b = _rand_boxes(rng, 30)
    s = rng.uniform(0, 1, 30).astype(np.float32)
    got = runtime.rotate_nms(b, s, 0.3)
    want = rotate_nms_np(b, s, 0.3)
    np.testing.assert_array_equal(np.sort(got), np.sort(want))


def test_voxelizer_matches_numpy(rng):
    from shasta_tpu.ops.voxelize import points_to_voxel_np

    pts = rng.uniform(-3, 3, size=(5000, 5)).astype(np.float32)
    args = ([0.25, 0.25, 0.5], [-2, -2, -2, 2, 2, 2], 6, 300)
    v1, c1, n1 = runtime.points_to_voxel(pts, *args[:2], max_points=args[2], max_voxels=args[3])
    v2, c2, n2 = points_to_voxel_np(pts, *args[:2], max_points=args[2], max_voxels=args[3])
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(n1, n2)
    np.testing.assert_allclose(v1, v2)


def test_pc_in_box_matches_numpy(rng):
    box = np.array([1.0, 2.0, 0.0, np.pi / 3, 4.0, 2.0, 2.0], np.float32)
    pc = rng.uniform(-4, 6, (500, 3)).astype(np.float32)
    got = runtime.pc_in_box(box, pc, 1.5)
    # independent check: rotate into box frame
    d = pc[:, :2] - box[:2]
    cs, sn = np.cos(box[3]), np.sin(box[3])
    rx = d[:, 0] * cs + d[:, 1] * sn
    ry = -d[:, 0] * sn + d[:, 1] * cs
    want = (
        (np.abs(rx) < box[4] * 1.5 / 2)
        & (np.abs(ry) < box[5] * 1.5 / 2)
        & (np.abs(pc[:, 2] - box[2]) < box[6] * 1.5 / 2)
    )
    np.testing.assert_array_equal(got, want)


@pytest.fixture
def no_lib(monkeypatch):
    """Force every runtime entry point onto its numpy/JAX fallback."""
    monkeypatch.setattr(runtime, "_lib", None)
    monkeypatch.setattr(runtime, "_lib_failed", True)


def test_fallback_iou_bev(rng, no_lib):
    b1, b2 = _rand_boxes(rng, 8), _rand_boxes(rng, 6)
    got = runtime.iou_bev(b1, b2)
    assert got.shape == (8, 6) and np.all(got >= 0) and np.all(got <= 1 + 1e-5)


def test_fallback_iou_3d(rng, no_lib):
    b1, b2 = _rand_boxes(rng, 7), _rand_boxes(rng, 5)
    got = runtime.iou_3d(b1, b2)
    assert got.shape == (7, 5) and np.all(got >= 0) and np.all(got <= 1 + 1e-5)


def test_fallback_rotate_nms(rng, no_lib):
    from shasta_tpu.ops.nms import rotate_nms_np

    b = _rand_boxes(rng, 20)
    s = rng.uniform(0, 1, 20).astype(np.float32)
    np.testing.assert_array_equal(
        np.sort(runtime.rotate_nms(b, s, 0.3)), np.sort(rotate_nms_np(b, s, 0.3))
    )


def test_fallback_pc_in_box_matches_cpp(rng):
    """The numpy fallback must agree with the compiled kernel bit-for-bit
    (regression: the fallback used to crash on a (P,3)-(1,2) broadcast)."""
    box = np.array([1.0, -2.0, 0.5, 0.7, 4.0, 2.0, 1.8], np.float32)
    pc = rng.uniform(-5, 6, (400, 3)).astype(np.float32)
    want = runtime.pc_in_box(box, pc, 1.5)  # compiled path
    saved = (runtime._lib, runtime._lib_failed)
    try:
        runtime._lib, runtime._lib_failed = None, True
        got = runtime.pc_in_box(box, pc, 1.5)
    finally:
        runtime._lib, runtime._lib_failed = saved
    np.testing.assert_array_equal(got, want)


def test_fallback_voxelizer(rng, no_lib):
    pts = rng.uniform(-2, 2, size=(800, 5)).astype(np.float32)
    v, c, n = runtime.points_to_voxel(pts, [0.5, 0.5, 0.5], [-2, -2, -2, 2, 2, 2],
                                      max_points=5, max_voxels=100)
    assert len(v) == len(c) == len(n) and len(v) <= 100


def test_voxelizer_speed(rng):
    import time

    pts = rng.uniform(-50, 50, size=(300000, 5)).astype(np.float32)
    args = ([0.075, 0.075, 0.2], [-54, -54, -5, 54, 54, 3], 10, 120000)
    t0 = time.perf_counter()
    runtime.points_to_voxel(pts, *args[:2], max_points=args[2], max_voxels=args[3])
    t_cpp = time.perf_counter() - t0
    assert t_cpp < 1.0, f"native voxelizer too slow: {t_cpp:.2f}s"


def test_native_crc32c_matches_python():
    import os

    from shasta_tpu.data.tfrecord import _crc32c_py, crc32c

    assert crc32c(b"123456789") == 0xE3069283  # RFC 3720 vector
    blob = os.urandom(4096)
    assert crc32c(blob) == _crc32c_py(blob)
    # chained CRCs agree too
    assert crc32c(blob[2048:], crc32c(blob[:2048])) == _crc32c_py(blob)
