"""Native (C++) sparse-conv planner vs the numpy reference — bit parity.

runtime/src/host_ops.cpp plan_group / strided_out_keys port the two hot
functions of shasta_tpu/plans.py (threaded galloping-search PosWord
packing; sort-per-stream k-way dedup merge). The numpy implementations
remain the oracle and the no-compiler fallback; this test pins exact
equality of PosWords, window bases, fit flags and output keys on random
frames, including the nwin=2 window assignment and truncation."""
import numpy as np
import pytest

from shasta_tpu import plans as hp
from shasta_tpu import runtime


pytestmark = pytest.mark.skipif(not runtime.available(),
                                reason="native runtime unavailable")


def _frame(rng, V, n, shape):
    Z, Y, X = shape
    cells = rng.choice(Z * Y * X, size=n, replace=False)
    cells.sort()
    coords = np.zeros((V, 4), np.int32)
    coords[:n, 1] = cells // (Y * X)
    coords[:n, 2] = (cells // X) % Y
    coords[:n, 3] = cells % X
    valid = np.zeros((V,), bool)
    valid[:n] = True
    return coords, valid


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_plan_group_native_matches_numpy(rng, seed):
    rng = np.random.default_rng(seed)
    shape = (10, 64, 64)
    coords, valid = _frame(rng, 1024, 700, shape)
    keys = hp.encode_keys_np(coords, valid, shape, 1)
    qc, rm, rp = hp._subm_centers(coords, valid, shape, 1)
    for C, nwin in ((16, 1), (16, 2), (32, 1), (32, 2)):
        a = hp._group_plan(keys, qc, rm, rp, C=C, nwin=nwin, native=True)
        b = hp._group_plan(keys, qc, rm, rp, C=C, nwin=nwin, native=False)
        assert a.ok == b.ok
        np.testing.assert_array_equal(a.pos, b.pos)
        np.testing.assert_array_equal(a.bases, b.bases)


@pytest.mark.parametrize("seed", [0, 1])
def test_strided_out_keys_native_matches_numpy(rng, seed):
    rng = np.random.default_rng(seed)
    shape = (10, 64, 64)
    coords, valid = _frame(rng, 1024, 900, shape)
    for args in (((3, 3, 3), (2, 2, 2), (1, 1, 1), 600),
                 ((3, 3, 3), (2, 2, 2), (0, 1, 1), 400),
                 ((3, 1, 1), (2, 1, 1), (0, 0, 0), 500),
                 # truncation: max_out smaller than the true set
                 ((3, 3, 3), (2, 2, 2), (1, 1, 1), 100)):
        ker, strd, pad, cap = args
        a, sa = hp.strided_output_keys(coords, valid, ker, strd, pad, cap,
                                       shape, 1, native=True)
        b, sb = hp.strided_output_keys(coords, valid, ker, strd, pad, cap,
                                       shape, 1, native=False)
        assert sa == sb
        np.testing.assert_array_equal(a, b)
