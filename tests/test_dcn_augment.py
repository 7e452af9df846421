import numpy as np
import jax
import jax.numpy as jnp

from shasta_tpu.ops.dcn import DeformConv2d
from shasta_tpu.data import augment


def test_dcn_zero_offsets_equals_plain_conv(rng):
    # offset conv initialized to zero -> sampling at integer taps ->
    # identical to a plain 3x3 conv with the same (K*C, Co) kernel
    B, H, W, C, Co = 1, 8, 8, 4, 6
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    m = DeformConv2d(Co, modulated=False)
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == (B, H, W, Co)

    w = np.asarray(v["params"]["kernel"]).reshape(3, 3, C, Co)
    ref = jax.lax.conv_general_dilated(
        x, jnp.asarray(w), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + jnp.asarray(v["params"]["bias"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_dcn_modulated_runs(rng):
    x = jnp.asarray(rng.normal(size=(1, 6, 6, 3)).astype(np.float32))
    m = DeformConv2d(5, modulated=True)
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == (1, 6, 6, 5)
    assert np.all(np.isfinite(np.asarray(out)))


def test_flip_x_consistency(rng):
    pts = rng.normal(size=(50, 5))
    boxes = np.zeros((3, 9))
    boxes[:, :3] = rng.normal(size=(3, 3))
    boxes[:, 3:6] = 1.0
    boxes[:, 6] = rng.uniform(-1, 1, 3)
    boxes[:, 7:9] = rng.normal(size=(3, 2))
    p2, b2 = augment.random_flip_x(pts, boxes, rng=np.random.default_rng(0), prob=1.1)
    np.testing.assert_allclose(p2[:, 1], -pts[:, 1])
    np.testing.assert_allclose(b2[:, 1], -boxes[:, 1])
    np.testing.assert_allclose(b2[:, 6], -boxes[:, 6])
    np.testing.assert_allclose(b2[:, 8], -boxes[:, 8])


def test_global_rotation_preserves_relative_geometry(rng):
    pts = rng.normal(size=(20, 4))
    boxes = np.zeros((2, 9))
    boxes[:, :2] = pts[:2, :2]
    r = np.random.default_rng(1)
    p2, b2 = augment.global_rotation(pts, boxes, rng=r)
    # distances from origin preserved
    np.testing.assert_allclose(
        np.linalg.norm(p2[:, :2], axis=1), np.linalg.norm(pts[:, :2], axis=1),
        atol=1e-9,
    )
    # box centers rotated identically with points
    np.testing.assert_allclose(b2[:, :2], p2[:2, :2], atol=1e-9)


def test_backbone_bf16_close_to_f32(rng):
    from shasta_tpu.models import ShastaModel, ShastaConfig
    from shasta_tpu.data.synthetic import make_batch

    cfg32 = ShastaConfig(max_obj=6, grid_shape=(41, 48, 48), cap_conv2=512,
                         cap_conv3=256, cap_conv4=128, cap_extra=128)
    cfg16 = ShastaConfig(**{**cfg32.__dict__, "dtype": jnp.bfloat16})
    b = make_batch(cfg32, 1, 512, n_dets=4)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    m32, m16 = ShastaModel(cfg32), ShastaModel(cfg16)
    v = m32.init(jax.random.PRNGKey(0), batch, train=False)
    o32 = m32.apply(v, batch, train=False)
    o16 = m16.apply(v, batch, train=False)
    # same params, bf16 trunk: outputs are probabilities, close but not equal
    d = float(jnp.max(jnp.abs(o32[0] - o16[0])))
    assert d < 0.1, d
    assert d > 0.0  # bf16 actually engaged
