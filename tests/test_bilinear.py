import numpy as np
import jax.numpy as jnp

from shasta_tpu.core.bilinear import bilinear_interpolate, sample_bev_features


def _ref_bilinear(im, x, y):
    """Loop re-derivation of center_utils.py:92-121 (unclamped weights,
    clamped indices)."""
    H, W, C = im.shape
    out = np.zeros((len(x), C))
    for i in range(len(x)):
        x0, y0 = int(np.floor(x[i])), int(np.floor(y[i]))
        x1, y1 = x0 + 1, y0 + 1
        x0c, x1c = np.clip([x0, x1], 0, W - 1)
        y0c, y1c = np.clip([y0, y1], 0, H - 1)
        wa = (x1 - x[i]) * (y1 - y[i])
        wb = (x1 - x[i]) * (y[i] - y0)
        wc = (x[i] - x0) * (y1 - y[i])
        wd = (x[i] - x0) * (y[i] - y0)
        out[i] = (im[y0c, x0c] * wa + im[y1c, x0c] * wb
                  + im[y0c, x1c] * wc + im[y1c, x1c] * wd)
    return out


def test_bilinear_matches_reference_formula(rng):
    im = rng.normal(size=(12, 10, 3)).astype(np.float32)
    x = rng.uniform(-1, 11, 40).astype(np.float32)  # incl. out-of-range
    y = rng.uniform(-1, 13, 40).astype(np.float32)
    got = np.asarray(bilinear_interpolate(jnp.asarray(im), jnp.asarray(x), jnp.asarray(y)))
    want = _ref_bilinear(im, x, y)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_sample_bev_features_layout(rng):
    # channel order is [p0 C | p1 C | ...] per box (bird_eye_view.py:35-37)
    B, N, P, C = 2, 3, 5, 4
    bev = rng.normal(size=(B, 16, 16, C)).astype(np.float32)
    pts = np.zeros((B, N, P, 3), np.float32)
    pts[..., 0] = rng.uniform(-50, 50, (B, N, P))
    pts[..., 1] = rng.uniform(-50, 50, (B, N, P))
    out = np.asarray(sample_bev_features(
        jnp.asarray(bev), jnp.asarray(pts), (-54, -54), (0.075, 0.075), 8
    ))
    assert out.shape == (B, N, P * C)
    # per-point block p equals the direct interpolation of that point
    for b in range(B):
        xs = (pts[b, :, :, 0].reshape(-1) + 54) / 0.075 / 8
        ys = (pts[b, :, :, 1].reshape(-1) + 54) / 0.075 / 8
        direct = _ref_bilinear(bev[b], xs, ys).reshape(N, P, C)
        np.testing.assert_allclose(out[b].reshape(N, P, C), direct, atol=1e-4)
