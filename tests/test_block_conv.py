"""Position-fed block conv (ops/pallas/block_conv.py) + host planner
(shasta_tpu/plans.py) vs the exact XLA gather path, interpret mode.

The block kernel replaces the one-hot windowed kernel for the C_in <= 32
backbone stages; ALL matching/plan work happens in the host planner
(the TPU analogue of spconv's rulebook build — scn.py:99-211 semantics).
Exactness: positions are exact host searchsorted results; the planner's
`ok` flag is the window-fit check (no device fallback on this path).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from shasta_tpu import plans as hp
from shasta_tpu.ops import sparse as sp
from shasta_tpu.ops.pallas.block_conv import PosIndex, pos_conv_apply

pytestmark = pytest.mark.slow


def _make_sorted(rng, n, V, C, shape=(8, 40, 40)):
    Z, Y, X = shape
    cells = rng.choice(Z * Y * X, size=n, replace=False)
    cells.sort()
    z = cells // (Y * X)
    y = (cells // X) % Y
    x = cells % X
    coords = np.zeros((V, 4), np.int32)
    coords[:n, 1], coords[:n, 2], coords[:n, 3] = z, y, x
    valid = np.zeros((V,), bool)
    valid[:n] = True
    feats = rng.normal(size=(V, C)).astype(np.float32) * valid[:, None]
    st = sp.SparseTensor(jnp.asarray(feats), jnp.asarray(coords),
                         jnp.asarray(valid), shape, 1)
    return st, coords, valid


@pytest.mark.parametrize("C", [5, 16, 32])
def test_pos_subm_conv_matches_xla(rng, C):
    st, coords, valid = _make_sorted(rng, 700, 1024, C)
    keys = hp.encode_keys_np(coords, valid, st.shape, 1)
    qc, rm, rp = hp._subm_centers(coords, valid, st.shape, 1)
    gp = hp._group_plan(keys, qc, rm, rp, C=C, nwin=1)
    assert gp.ok
    pidx = PosIndex(jnp.asarray(gp.pos), jnp.asarray(gp.bases))
    w = jnp.asarray((rng.normal(size=(27, C, 8)) * 0.2).astype(np.float32))
    got = np.asarray(pos_conv_apply(st.feats, pidx, w, m_out=st.capacity))
    ref_idx = sp.build_subm_index(st, table=sp.key_table_presorted(st))
    want = np.asarray(sp.subm_conv_apply(st, ref_idx, w).feats)
    want = want * np.asarray(valid)[:, None]
    got = got * np.asarray(valid)[:, None]
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_planner_output_keys_match_device_plan(rng):
    st, coords, valid = _make_sorted(rng, 600, 1024, 16, shape=(8, 48, 48))
    args = ((3, 3, 3), (2, 2, 2), (1, 1, 1), 512)
    plan_ref = sp.build_strided_plan(st, *args,
                                     table=sp.key_table_presorted(st))
    keys_host, out_shape = hp.strided_output_keys(
        coords, valid, (3, 3, 3), (2, 2, 2), (1, 1, 1), 512, st.shape, 1)
    # device plan emits key-sorted outputs; re-encode its coords to keys
    dev_keys = hp.encode_keys_np(np.asarray(plan_ref.coords),
                                 np.asarray(plan_ref.valid), out_shape, 1)
    nv = int(np.asarray(plan_ref.valid).sum())
    np.testing.assert_array_equal(keys_host[:nv], dev_keys[:nv])
    assert np.all(keys_host[nv:] == hp.SENTINEL)
    assert not np.asarray(plan_ref.valid)[nv:].any()


def test_pos_strided_conv_nwin2_matches_xla(rng):
    st, coords, valid = _make_sorted(rng, 600, 1024, 16, shape=(8, 48, 48))
    args = ((3, 3, 3), (2, 2, 2), (1, 1, 1), 512)
    plan_ref = sp.build_strided_plan(st, *args,
                                     table=sp.key_table_presorted(st))
    w = jnp.asarray((rng.normal(size=(27, 16, 32)) * 0.2).astype(np.float32))
    want = sp.strided_conv_apply(st, plan_ref, w)

    keys = hp.encode_keys_np(coords, valid, st.shape, 1)
    out_keys, out_shape = hp.strided_output_keys(
        coords, valid, (3, 3, 3), (2, 2, 2), (1, 1, 1), 512, st.shape, 1)
    c1, v1 = hp.decode_out_coords(out_keys, out_shape, 1)
    qc, rm, rp = hp._strided_centers(c1, v1, (3, 3, 3), (2, 2, 2),
                                     (1, 1, 1), st.shape, 1)
    gp = hp._group_plan(keys, qc, rm, rp, C=16, nwin=2)
    assert gp.ok
    coords_d, valid_d, oshape = sp.decode_strided_keys(
        jnp.asarray(out_keys.astype(np.int32)), st.shape, *args[:3], 1)
    plan = sp.StridedPlan(coords_d, valid_d,
                          PosIndex(jnp.asarray(gp.pos),
                                   jnp.asarray(gp.bases)), oshape)
    got = sp.strided_conv_apply(st, plan, w)
    np.testing.assert_array_equal(np.asarray(got.coords),
                                  np.asarray(want.coords))
    np.testing.assert_allclose(np.asarray(got.feats),
                               np.asarray(want.feats), atol=1e-4)


def test_frame_plans_full_backbone_matches_xla(rng):
    """SparseBackbone with host plans == the plain XLA path, end to end
    (all five stages incl. the keys-only d3/ex plans)."""
    import jax

    from shasta_tpu.models.backbone import SparseBackbone

    Z, Y, X = 10, 48, 48
    st, coords, valid = _make_sorted(rng, 900, 1024, 5, shape=(Z, Y, X))

    class Cfg:
        grid_shape = (Z, Y, X)
        cap_conv2 = 768
        cap_conv3 = 512
        cap_conv4 = 256
        cap_extra = 256

    fp = hp.frame_plans(coords[:, 1:4], valid, Cfg)
    assert fp.ok
    kw = dict(cap_conv2=Cfg.cap_conv2, cap_conv3=Cfg.cap_conv3,
              cap_conv4=Cfg.cap_conv4, cap_extra=Cfg.cap_extra)
    bb_ref = SparseBackbone(num_input_features=5, **kw)
    vars_ = bb_ref.init(jax.random.PRNGKey(0), st, train=False)
    want = bb_ref.apply(vars_, st, train=False)
    bb_plan = SparseBackbone(num_input_features=5, use_pallas=True,
                             assume_sorted=True, **kw)
    plans_j = {k: jnp.asarray(v) for k, v in fp.arrays.items()}
    got = bb_plan.apply(vars_, st, train=False, plans=plans_j)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-3, rtol=1e-3)


def test_planner_flags_window_overflow():
    """Two dense clusters far apart in key space inside one tile must
    either fit via the second window or trip ok=False — never silently
    misplace rows (the planner's fit check is the exactness contract)."""
    rng_ = np.random.default_rng(3)
    Z, Y, X = (4, 80, 80)
    # plane z=0: 128 voxels spread across the whole plane (every 50th
    # cell); plane z=1: 4000 dense cells. A z=0 tile's dz=+1 queries then
    # span nearly all 4000 z=1 rows — far beyond the 512-row window, and
    # beyond ANY two windows (the spread is per-row monotone, not
    # bimodal), so even nwin=2 must flag.
    ca = np.arange(128) * 50
    cb = np.sort(rng_.choice(Y * X, size=4000, replace=False)) + Y * X
    cells = np.concatenate([ca, cb])
    n = cells.shape[0]
    V = ((n + 127) // 128) * 128
    coords = np.zeros((V, 4), np.int32)
    coords[:n, 1] = cells // (Y * X)
    coords[:n, 2] = (cells // X) % Y
    coords[:n, 3] = cells % X
    valid = np.zeros((V,), bool)
    valid[:n] = True
    keys = hp.encode_keys_np(coords, valid, (Z, Y, X), 1)
    qc, rm, rp = hp._subm_centers(coords, valid, (Z, Y, X), 1)
    gp1 = hp._group_plan(keys, qc, rm, rp, C=16, nwin=1)
    gp2 = hp._group_plan(keys, qc, rm, rp, C=16, nwin=2)
    assert not gp1.ok
    assert not gp2.ok


def test_pos_conv_bf16_close_to_f32(rng):
    st, coords, valid = _make_sorted(rng, 700, 1024, 16)
    keys = hp.encode_keys_np(coords, valid, st.shape, 1)
    qc, rm, rp = hp._subm_centers(coords, valid, st.shape, 1)
    gp = hp._group_plan(keys, qc, rm, rp, C=16, nwin=1)
    pidx = PosIndex(jnp.asarray(gp.pos), jnp.asarray(gp.bases))
    w = jnp.asarray((rng.normal(size=(27, 16, 8)) * 0.2).astype(np.float32))
    f32 = np.asarray(pos_conv_apply(st.feats, pidx, w, m_out=st.capacity))
    b16 = np.asarray(pos_conv_apply(st.feats, pidx, w, m_out=st.capacity,
                                    compute_dtype=jnp.bfloat16))
    np.testing.assert_allclose(b16, f32, atol=0.05, rtol=0.05)
