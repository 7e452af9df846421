"""Uniform-width head transform (shasta_tpu/multiclass.py): a padded
max_obj=N_new head with scattered params + n_real masking must equal the
original max_obj=N_old head exactly on real rows/cols and anchors —
the foundation of the fused 7-class program's vmapped affinity."""
import numpy as np
import jax
import jax.numpy as jnp

from shasta_tpu.models.affinity import AffinityNet
from shasta_tpu.multiclass import pad_affinity_params, pad_rows


def _rand_inputs(rng, N, B=1):
    # dims (cols 3:6) must be positive: the residual_dim term takes
    # log(dims) (reference shasta.py:280 — real boxes only)
    def boxes():
        b = rng.normal(size=(B, N, 7)).astype(np.float32)
        b[..., 3:6] = np.abs(b[..., 3:6]) + 0.5
        return b

    pb, cb = boxes(), boxes()
    cv = rng.normal(size=(B, N, 2)).astype(np.float32)
    cd = np.full((B, N, 1), 0.5, np.float32)
    pf = rng.normal(size=(B, N, 320)).astype(np.float32)
    cf = rng.normal(size=(B, N, 320)).astype(np.float32)
    return tuple(jnp.asarray(a) for a in (pb, cb, cv, cd, pf, cf))


def test_padded_head_equals_original(rng):
    N_old, N_new = 5, 9
    m_old = AffinityNet(max_obj=N_old)
    m_new = AffinityNet(max_obj=N_new)
    inp = _rand_inputs(rng, N_old)
    v_old = m_old.init(jax.random.PRNGKey(0), *inp)
    m1, m2 = m_old.apply(v_old, *inp)

    v_new = {"params": pad_affinity_params(v_old["params"], N_old, N_new)}
    inp_new = tuple(pad_rows(a, N_new) for a in inp)
    m1p, m2p = m_new.apply(v_new, *inp_new, n_real=jnp.int32(N_old))

    # matched1 (N, N+2): rows real, cols [0,N_old) + anchors at the end
    np.testing.assert_allclose(np.asarray(m1p[0, :N_old, :N_old]),
                               np.asarray(m1[0, :, :N_old]),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(m1p[0, :N_old, N_new:]),
                               np.asarray(m1[0, :, N_old:]),
                               atol=1e-5, rtol=1e-5)
    # padded cols carry zero mass
    assert float(np.abs(np.asarray(m1p[0, :N_old, N_old:N_new])).max()) == 0.0
    # matched2 (N+2, N): rows [0,N_old) + anchors, cols real
    np.testing.assert_allclose(np.asarray(m2p[0, :N_old, :N_old]),
                               np.asarray(m2[0, :N_old, :]),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(m2p[0, N_new:, :N_old]),
                               np.asarray(m2[0, N_old:, :]),
                               atol=1e-5, rtol=1e-5)
    assert float(np.abs(np.asarray(m2p[0, N_old:N_new, :N_old])).max()) == 0.0


def test_padded_head_noop_when_same_size(rng):
    N = 6
    m = AffinityNet(max_obj=N)
    inp = _rand_inputs(rng, N)
    v = m.init(jax.random.PRNGKey(1), *inp)
    a1, a2 = m.apply(v, *inp)
    b1, b2 = m.apply({"params": pad_affinity_params(v["params"], N, N)},
                     *inp, n_real=jnp.int32(N))
    np.testing.assert_allclose(np.asarray(a1), np.asarray(b1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(b2), atol=1e-6)


def test_vmapped_heads_match_sequential(rng):
    """Three different-width heads run as one vmapped padded head."""
    from shasta_tpu.multiclass import stack_class_heads

    widths = [5, 6, 9]  # (>=5: max_obj*7//32 must stay >0, real classes are >=20)
    N_max = max(widths)
    heads = {}
    inputs = {}
    outs = {}
    for i, n in enumerate(widths):
        m = AffinityNet(max_obj=n)
        inp = _rand_inputs(rng, n)
        v = m.init(jax.random.PRNGKey(i), *inp)
        name = f"c{i}"

        class _Cfg:
            max_obj = n
            num_point, share_conv_channel, num_feats = 5, 64, 3

        class _M:
            cfg = _Cfg()

        heads[name] = (_M(), v)
        inputs[name] = inp
        outs[name] = m.apply(v, *inp)

    names = tuple(heads)
    stacked, n_real = stack_class_heads(heads, names, N_max)
    big = AffinityNet(max_obj=N_max)
    stacked_in = tuple(
        jnp.stack([pad_rows(inputs[n][j], N_max) for n in names])
        for j in range(6))
    m1s, m2s = jax.vmap(
        lambda p, a, b, c, d, e, f, nr: big.apply(
            {"params": p}, a, b, c, d, e, f, n_real=nr)
    )(stacked, *stacked_in, n_real)
    for i, (name, n) in enumerate(zip(names, widths)):
        m1, m2 = outs[name]
        np.testing.assert_allclose(np.asarray(m1s[i, 0, :n, :n]),
                                   np.asarray(m1[0, :, :n]), atol=1e-5,
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(m1s[i, 0, :n, N_max:]),
                                   np.asarray(m1[0, :, n:]), atol=1e-5,
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(m2s[i, 0, N_max:, :n]),
                                   np.asarray(m2[0, n:, :]), atol=1e-5,
                                   rtol=1e-5)
