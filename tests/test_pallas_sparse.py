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
