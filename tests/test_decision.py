import numpy as np
import jax.numpy as jnp

from shasta_tpu.tracker.decision import apply_decision_rules


def _oracle(m1, m2, n_prev, n_curr):
    """Loop-based re-derivation of eval.py:126-181 decision rules."""
    N = m1.shape[0]
    dead, fn, keep_prev = set(), set(), []
    if n_prev > 0:
        md = np.concatenate([m1[:n_prev, :n_curr], m1[:n_prev, -2:]], axis=1)
        for n in range(n_prev):
            k = int(md[n].argmax())
            val = md[n, k]
            if val > 0.5 and k == md.shape[1] - 2:
                dead.add(n)
                continue
            if val > 0.5 and k == md.shape[1] - 1:
                fn.add(n)
                continue
            keep_prev.append(n)
        md2 = np.concatenate([m2[keep_prev, :n_curr], m2[-2:, :n_curr]], axis=0)
    else:
        md2 = m2[-2:, :n_curr]
    keep, newborn = [], set()
    for k in range(n_curr):
        n = int(md2[:, k].argmax())
        val = md2[n, k]
        if val > 0.7 and n == md2.shape[0] - 1:
            continue
        if val > 0.5 and n == md2.shape[0] - 2:
            newborn.add(k)
        keep.append(k)
    return dead, fn, keep_prev, keep, newborn


def test_decision_rules_match_loop_oracle(rng):
    N = 12
    for trial in range(20):
        n_prev = int(rng.integers(0, N + 1))
        n_curr = int(rng.integers(1, N + 1))
        # build softmax-ish random matrices
        m1 = rng.dirichlet(np.ones(N + 2) * 0.3, size=N).astype(np.float32)
        m2 = rng.dirichlet(np.ones(N + 2) * 0.3, size=N).astype(np.float32).T
        dead, fn, keep_prev, keep, newborn = _oracle(m1, m2, n_prev, n_curr)
        out = apply_decision_rules(
            jnp.array(m1), jnp.array(m2), jnp.int32(n_prev), jnp.int32(n_curr)
        )
        got_dead = set(np.nonzero(np.asarray(out.dead))[0].tolist())
        got_fn = set(np.nonzero(np.asarray(out.fn))[0].tolist())
        got_keepp = np.nonzero(np.asarray(out.keep_prev))[0].tolist()
        got_keep = np.nonzero(np.asarray(out.keep))[0].tolist()
        got_newborn = set(np.nonzero(np.asarray(out.newborn))[0].tolist())
        assert got_dead == dead, (trial, got_dead, dead)
        assert got_fn == fn, trial
        assert got_keepp == keep_prev, trial
        assert got_keep == keep, trial
        assert got_newborn == newborn, trial


def test_ref_scores():
    N = 4
    m1 = np.full((N, N + 2), 0.1, np.float32)
    m2 = np.full((N + 2, N), 0.1, np.float32)
    m1[0, N] = 0.9  # dead prob for row 0
    m2[N + 1, 2] = 0.6  # FP prob for det 2
    out = apply_decision_rules(jnp.array(m1), jnp.array(m2), jnp.int32(N), jnp.int32(N))
    np.testing.assert_allclose(float(out.fn_ref_score[0]), 1 - 0.9, atol=1e-6)
    np.testing.assert_allclose(float(out.ref_score[2]), 1 - 0.6, atol=1e-6)
