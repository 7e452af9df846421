"""Pallas sparse-gather kernel vs the XLA reference path (interpret mode)."""
import numpy as np
import jax.numpy as jnp

from shasta_tpu.ops import sparse as sp
from shasta_tpu.ops.pallas.sparse_gather import subm_conv_pallas
from test_sparse import _make_sparse


def test_pallas_subm_matches_xla(rng):
    st, coords, feats = _make_sparse(rng, B=2, shape=(6, 10, 10), n=40, C=4, cap=64)
    Co = 8
    w = rng.normal(size=(27, 4, Co)).astype(np.float32) * 0.2
    idx = sp.build_subm_index(st)

    ref = sp.subm_conv_apply(st, idx, jnp.asarray(w))

    got = subm_conv_pallas(
        st.feats, idx.gather, jnp.asarray(w), tile=16, interpret=True
    )
    got = jnp.where(st.valid[:, None], got, 0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref.feats), atol=1e-4)


def test_pallas_handles_misses(rng):
    # all-miss gather rows produce zeros
    V, C, K, Co = 32, 4, 27, 6
    feats = jnp.asarray(rng.normal(size=(V, C)).astype(np.float32))
    gather = jnp.full((V, K), V, jnp.int32)  # every tap missing
    w = jnp.asarray(rng.normal(size=(K, C, Co)).astype(np.float32))
    out = subm_conv_pallas(feats, gather, w, tile=16, interpret=True)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-7)


def test_pallas_strided_matches_xla(rng):
    """Strided conv through the kernel: gather rows != table rows."""
    from shasta_tpu.ops.pallas.sparse_gather import gathered_conv_pallas

    st, coords, feats = _make_sparse(rng, B=2, shape=(6, 10, 10), n=40, C=4, cap=64)
    Co = 8
    w = rng.normal(size=(27, 4, Co)).astype(np.float32) * 0.2
    plan = sp.build_strided_plan(st, (3, 3, 3), (2, 2, 2), (1, 1, 1), max_out=48)

    ref = sp.strided_conv_apply(st, plan, jnp.asarray(w))
    got = gathered_conv_pallas(st.feats, plan.gather, jnp.asarray(w),
                               tile=16, interpret=True)
    got = jnp.where(plan.valid[:, None], got, 0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref.feats), atol=1e-4)


def test_backbone_pallas_flag_matches_xla(rng):
    """ShastaConfig.use_pallas_gather routes EVERY backbone conv through
    the kernel; the BEV map must match the XLA-gather path."""
    import jax

    from shasta_tpu.data.synthetic import make_batch
    from shasta_tpu.models import ShastaModel, ShastaConfig

    kw = dict(max_obj=6, grid_shape=(41, 32, 32),
              cap_conv2=512, cap_conv3=256, cap_conv4=128, cap_extra=128)
    m_xla = ShastaModel(ShastaConfig(**kw))
    m_pal = ShastaModel(ShastaConfig(use_pallas_gather=True, **kw))

    b = make_batch(m_xla.cfg, 1, 128, n_dets=4, seed=0)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    variables = m_xla.init(jax.random.PRNGKey(0), batch, train=False)

    bev_xla = m_xla.apply(variables, batch, train=False,
                          method=ShastaModel.bev_single)
    bev_pal = m_pal.apply(variables, batch, train=False,
                          method=ShastaModel.bev_single)
    np.testing.assert_allclose(
        np.asarray(bev_pal), np.asarray(bev_xla), atol=2e-4
    )


def test_pallas_sorted_lookup_matches_xla(rng):
    """VMEM binary-search lookup == jnp.searchsorted path, including
    misses, SENTINEL queries, duplicate keys, and edge positions."""
    from shasta_tpu.ops.pallas.sparse_gather import sorted_lookup_pallas

    V = 200
    keys = np.sort(rng.choice(5000, size=V - 20, replace=False)).astype(np.int32)
    keys = np.concatenate([keys, np.full(20, sp.SENTINEL, np.int32)])  # tail
    perm = rng.permutation(V).astype(np.int32)

    q = np.concatenate([
        keys[rng.integers(0, V - 20, 300)],            # hits
        rng.integers(0, 5000, 200).astype(np.int32),   # mixed hits/misses
        np.array([0, 4999, sp.SENTINEL], np.int32),    # edges + sentinel
    ]).reshape(-1, 1)
    want = sp._sorted_lookup(jnp.asarray(keys), jnp.asarray(perm), jnp.asarray(q))
    got = sorted_lookup_pallas(jnp.asarray(keys), jnp.asarray(perm),
                               jnp.asarray(q), tile=64, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # multi-tap shape (M, 27) like the real index build
    q27 = rng.integers(0, 5000, (50, 27)).astype(np.int32)
    want = sp._sorted_lookup(jnp.asarray(keys), jnp.asarray(perm), jnp.asarray(q27))
    got = sorted_lookup_pallas(jnp.asarray(keys), jnp.asarray(perm),
                               jnp.asarray(q27), tile=16, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
