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


def _psroi_oracle(data_nchw, rois, trans, spatial_scale, output_dim,
                  group_size, pooled_size, part_size, sample_per_part,
                  trans_std):
    """Scalar transliteration of DeformablePSROIPoolForwardKernel
    (det3d/ops/dcn/src/deform_pool_cuda_kernel.cu:53-140)."""
    import math

    B, C, H, W = data_nchw.shape
    N = len(rois)
    P, S, G = pooled_size, sample_per_part, group_size
    num_classes = 1 if trans is None else trans.shape[1] // 2
    ch_each = output_dim // num_classes
    top = np.zeros((N, output_dim, P, P))
    topc = np.zeros((N, output_dim, P, P))
    for n in range(N):
        b = int(rois[n, 0])
        rsw = round(rois[n, 1]) * spatial_scale - 0.5
        rsh = round(rois[n, 2]) * spatial_scale - 0.5
        rew = (round(rois[n, 3]) + 1.0) * spatial_scale - 0.5
        reh = (round(rois[n, 4]) + 1.0) * spatial_scale - 0.5
        rw, rh = max(rew - rsw, 0.1), max(reh - rsh, 0.1)
        bw, bh = rw / P, rh / P
        sw_, sh_ = bw / S, bh / S
        for ctop in range(output_dim):
            cls = ctop // ch_each
            for ph in range(P):
                for pw in range(P):
                    part_h = math.floor(ph / P * part_size)
                    part_w = math.floor(pw / P * part_size)
                    if trans is None:
                        tx = ty = 0.0
                    else:
                        tx = trans[n, cls * 2, part_h, part_w] * trans_std
                        ty = trans[n, cls * 2 + 1, part_h, part_w] * trans_std
                    wstart = pw * bw + rsw + tx * rw
                    hstart = ph * bh + rsh + ty * rh
                    gw = min(max(pw * G // P, 0), G - 1)
                    gh = min(max(ph * G // P, 0), G - 1)
                    c = (ctop * G + gh) * G + gw
                    s = 0.0
                    cnt = 0
                    for ih in range(S):
                        for iw in range(S):
                            w = wstart + iw * sw_
                            h = hstart + ih * sh_
                            if w < -0.5 or w > W - 0.5 or h < -0.5 or h > H - 0.5:
                                continue
                            w = min(max(w, 0.0), W - 1.0)
                            h = min(max(h, 0.0), H - 1.0)
                            x1, x2 = math.floor(w), math.ceil(w)
                            y1, y2 = math.floor(h), math.ceil(h)
                            dx, dy = w - x1, h - y1
                            d = data_nchw[b, c]
                            v = ((1 - dx) * (1 - dy) * d[y1, x1]
                                 + (1 - dx) * dy * d[y2, x1]
                                 + dx * (1 - dy) * d[y1, x2]
                                 + dx * dy * d[y2, x2])
                            s += v
                            cnt += 1
                    top[n, ctop, ph, pw] = 0.0 if cnt == 0 else s / cnt
                    topc[n, ctop, ph, pw] = cnt
    return top, topc


def test_deform_psroi_pooling_matches_cuda_oracle(rng):
    from shasta_tpu.ops.dcn import deform_psroi_pooling

    B, H, W = 2, 12, 14
    output_dim, G, P, S = 4, 2, 3, 2
    C = output_dim * G * G
    num_classes = 2
    data = rng.normal(size=(B, C, H, W))
    rois = np.array([
        [0, 1.2, 2.7, 20.0, 18.0],   # partially out of bounds
        [1, 0.0, 0.0, 8.0, 6.0],
        [0, 5.0, 5.0, 5.4, 5.2],     # tiny roi -> 0.1 clamp
        [1, -40.0, -40.0, -30.0, -30.0],  # fully out of bounds -> count 0
    ])
    trans = rng.normal(size=(len(rois), num_classes * 2, P, P))

    for tr, std in ((None, 0.0), (trans, 0.3)):
        ref, refc = _psroi_oracle(data, rois, tr, 0.5, output_dim, G, P, P, S, std)
        got, gotc = deform_psroi_pooling(
            jnp.asarray(data.transpose(0, 2, 3, 1)), jnp.asarray(rois),
            None if tr is None else jnp.asarray(tr),
            spatial_scale=0.5, output_dim=output_dim, group_size=G,
            pooled_size=P, sample_per_part=S, trans_std=std,
        )
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), ref, atol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(gotc).transpose(0, 3, 1, 2), refc
        )


def test_deform_psroi_pooling_differentiable(rng):
    """The CUDA ext needs a hand-written backward; here jax.grad covers it
    (through both the features and the trans offsets)."""
    from shasta_tpu.ops.dcn import deform_psroi_pooling

    data = jnp.asarray(rng.normal(size=(1, 8, 8, 4)))
    rois = jnp.asarray([[0, 1.0, 1.0, 6.0, 6.0]])
    trans = jnp.asarray(rng.normal(size=(1, 2, 2, 2)) * 0.1)

    def loss(d, t):
        out, _ = deform_psroi_pooling(
            d, rois, t, spatial_scale=1.0, output_dim=1, group_size=2,
            pooled_size=2, sample_per_part=2, trans_std=0.2,
        )
        return jnp.sum(out ** 2)

    gd, gt = jax.grad(loss, argnums=(0, 1))(data, trans)
    assert float(jnp.sum(jnp.abs(gd))) > 0
    assert float(jnp.sum(jnp.abs(gt))) > 0
