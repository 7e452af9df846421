"""Windowed Pallas kernels vs the XLA reference paths (interpret mode).

ops/pallas/window_conv.py replaces the backbone's two slowest XLA ops on
TPU (searchsorted index builds and the im2col row gather). These tests run
the kernels in interpreter mode on CPU; the exactness contract (automatic
XLA fallback on window overflow) is covered by the adversarial cases.
"""
import numpy as np
import jax.numpy as jnp

from shasta_tpu.ops import sparse as sp
from shasta_tpu.ops.pallas.window_conv import (
    SENTINEL,
    windowed_gather_matmul,
    windowed_lookup,
)
from test_sparse import _make_sparse
import pytest

# Pallas interpret-mode kernels: minutes per test on CPU
pytestmark = pytest.mark.slow


def _xla_ref(feats, gather, weight):
    V, C = feats.shape
    M, K = gather.shape
    padded = np.concatenate([feats, np.zeros((1, C), feats.dtype)], axis=0)
    return padded[gather].reshape(M, K * C) @ weight.reshape(K * C, -1)


def _monotone_gather(rng, V, M, K, span=40, miss=0.1):
    g = np.empty((M, K), np.int64)
    T = max(1, M // 128)
    for k in range(K):
        starts = np.sort(rng.integers(0, max(1, V - span - 1), size=T))
        within = np.sort(rng.integers(0, span, size=(T, 128)), axis=1)
        col = (starts[:, None] + within).reshape(-1)[:M]
        g[:, k] = np.minimum(col, V - 1)
    g[rng.random((M, K)) < miss] = V
    return g.astype(np.int32)


def test_windowed_conv_matches_xla(rng):
    V, M, K, C, Co = 2048, 512, 5, 16, 8
    feats = rng.normal(size=(V, C)).astype(np.float32)
    w = (rng.normal(size=(K, C, Co)) * 0.2).astype(np.float32)
    g = _monotone_gather(rng, V, M, K)
    out = np.asarray(
        windowed_gather_matmul(jnp.asarray(feats), jnp.asarray(g), jnp.asarray(w))
    )
    np.testing.assert_allclose(out, _xla_ref(feats, g, w), atol=1e-4)


def test_windowed_conv_tile_variants_match_xla(rng):
    """The kernel's output-tile height is a tunable (64 halves the per-tap
    window span and so the VPU one-hot cost); every tile/window combo must
    stay exact vs the XLA gather."""
    V, M, K, C, Co = 2048, 512, 5, 16, 8
    feats = rng.normal(size=(V, C)).astype(np.float32)
    w = (rng.normal(size=(K, C, Co)) * 0.2).astype(np.float32)
    g = _monotone_gather(rng, V, M, K, span=30)
    ref = _xla_ref(feats, g, w)
    for tile, window in ((64, 96), (64, 256), (256, 384)):
        out = np.asarray(windowed_gather_matmul(
            jnp.asarray(feats), jnp.asarray(g), jnp.asarray(w),
            tile=tile, window=window,
        ))
        np.testing.assert_allclose(out, ref, atol=1e-4,
                                   err_msg=f"tile={tile} window={window}")


def test_windowed_conv_fallback_on_random_indices(rng):
    """Scattered (non-monotone) indices exceed the window span -> the
    wrapper must fall back to the exact XLA path."""
    V, M, K, C, Co = 2048, 512, 5, 16, 8
    feats = rng.normal(size=(V, C)).astype(np.float32)
    w = (rng.normal(size=(K, C, Co)) * 0.2).astype(np.float32)
    g = rng.integers(0, V + 1, size=(M, K)).astype(np.int32)
    out = np.asarray(
        windowed_gather_matmul(jnp.asarray(feats), jnp.asarray(g), jnp.asarray(w))
    )
    np.testing.assert_allclose(out, _xla_ref(feats, g, w), atol=1e-4)


def test_windowed_conv_all_miss(rng):
    V, M, K, C, Co = 256, 128, 27, 16, 6
    feats = rng.normal(size=(V, C)).astype(np.float32)
    w = rng.normal(size=(K, C, Co)).astype(np.float32)
    g = np.full((M, K), V, np.int32)
    out = np.asarray(
        windowed_gather_matmul(jnp.asarray(feats), jnp.asarray(g), jnp.asarray(w))
    )
    np.testing.assert_allclose(out, 0.0, atol=1e-7)


def test_sparse_conv_apply_pallas_flag(rng):
    """subm/strided conv through use_pallas match the XLA results."""
    st, coords, feats = _make_sparse(rng, B=2, shape=(6, 10, 10), n=40, C=4, cap=64)
    w = jnp.asarray(rng.normal(size=(27, 4, 8)).astype(np.float32) * 0.2)
    idx = sp.build_subm_index(st, use_pallas=True)
    idx_ref = sp.build_subm_index(st)
    np.testing.assert_array_equal(np.asarray(idx.gather), np.asarray(idx_ref.gather))

    ref = sp.subm_conv_apply(st, idx_ref, w)
    got = sp.subm_conv_apply(st, idx, w, use_pallas=True)
    np.testing.assert_allclose(np.asarray(got.feats), np.asarray(ref.feats), atol=1e-4)

    # B=2 + use_pallas routes the plan through PER-LANE slot compaction
    # (lane-major row layout) — compare against the global-layout XLA plan
    # in dense space, where the layouts must agree exactly.
    plan = sp.build_strided_plan(st, (3, 3, 3), (2, 2, 2), (1, 1, 1),
                                 max_out=48, use_pallas=True)
    plan_ref = sp.build_strided_plan(st, (3, 3, 3), (2, 2, 2), (1, 1, 1), max_out=48)
    ref = sp.strided_conv_apply(st, plan_ref, w)
    got = sp.strided_conv_apply(st, plan, w, use_pallas=True)
    np.testing.assert_allclose(
        np.asarray(sp.to_dense(got)), np.asarray(sp.to_dense(ref)), atol=1e-4
    )
    # per-lane layout keeps keys globally ascending (fillers interleaved)
    keys = np.asarray(sp.encode_keys(plan.coords, plan.valid,
                                     plan.out_shape, st.batch_size))
    assert np.all(keys[1:] >= keys[:-1])


def test_backbone_pallas_flag_matches_xla(rng):
    """ShastaConfig.use_pallas_gather routes EVERY backbone conv + index
    build through the kernels; the BEV map must match the XLA path."""
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


def _make_frame_major(rng, B=2, shape=(6, 10, 10), per_lane_n=(20, 13),
                      per_lane_cap=32, C=4):
    """Frame-major fixed-capacity sparse tensor: lane b owns rows
    [b*cap, (b+1)*cap), padded tail per lane — the backbone's layout
    contract for per-lane Pallas kernels."""
    Z, Y, X = shape
    coords_l, feats_l, valid_l = [], [], []
    for b in range(B):
        n = per_lane_n[b]
        cs = set()
        while len(cs) < n:
            cs.add((b, int(rng.integers(Z)), int(rng.integers(Y)),
                    int(rng.integers(X))))
        cs = np.array(sorted(cs), np.int32)
        pad = np.zeros((per_lane_cap - n, 4), np.int32)
        pad[:, 0] = b  # padded rows carry their frame id (encode_keys filler)
        coords_l.append(np.concatenate([cs, pad]))
        f = rng.normal(size=(per_lane_cap, C)).astype(np.float32)
        f[n:] = 0
        feats_l.append(f)
        valid_l.append(np.arange(per_lane_cap) < n)
    st = sp.SparseTensor(
        feats=jnp.asarray(np.concatenate(feats_l)),
        coords=jnp.asarray(np.concatenate(coords_l)),
        valid=jnp.asarray(np.concatenate(valid_l)),
        shape=shape,
        batch_size=B,
    )
    return st


def test_per_lane_slots_match_global(rng):
    """lanes>1 on a frame-major tensor: subm index, subm conv, per-lane
    strided-plan slots, and strided conv all equal the global-layout
    results (in dense space for the strided path)."""
    st = _make_frame_major(rng)
    w = jnp.asarray(rng.normal(size=(27, 4, 8)).astype(np.float32) * 0.2)

    idx = sp.build_subm_index(st, use_pallas=True, lanes=2)
    idx_ref = sp.build_subm_index(st)
    np.testing.assert_array_equal(np.asarray(idx.gather),
                                  np.asarray(idx_ref.gather))
    got = sp.subm_conv_apply(st, idx, w, use_pallas=True, lanes=2)
    ref = sp.subm_conv_apply(st, idx_ref, w)
    np.testing.assert_allclose(np.asarray(got.feats), np.asarray(ref.feats),
                               atol=1e-4)

    # caps generous enough that NEITHER layout truncates (per-lane slots
    # change WHICH rows a tight global cap keeps — by design: per-frame
    # budgets — so truncation regimes are not comparable)
    MO = 160
    plan = sp.build_strided_plan(st, (3, 3, 3), (2, 2, 2), (1, 1, 1),
                                 max_out=MO, use_pallas=True, lanes=2)
    plan_ref = sp.build_strided_plan(st, (3, 3, 3), (2, 2, 2), (1, 1, 1),
                                     max_out=MO)
    gots = sp.strided_conv_apply(st, plan, w, use_pallas=True, lanes=2)
    refs = sp.strided_conv_apply(st, plan_ref, w)
    np.testing.assert_allclose(np.asarray(sp.to_dense(gots)),
                               np.asarray(sp.to_dense(refs)), atol=1e-4)
    # lane-major chunks: every valid row of lane b sits in slots
    # [b*MO/2, (b+1)*MO/2) and keys stay globally ascending incl. fillers
    h = MO // 2
    v = np.asarray(plan.valid)
    ob = np.asarray(plan.coords[:, 0])
    assert np.all(ob[:h][v[:h]] == 0) and np.all(ob[h:][v[h:]] == 1)
    keys = np.asarray(sp.encode_keys(plan.coords, plan.valid,
                                     plan.out_shape, st.batch_size))
    assert np.all(keys[1:] >= keys[:-1])
    # next-stage index build over the per-lane layout still works
    t = sp.key_table_presorted(gots)
    idx2 = sp.build_subm_index(gots, table=t, use_pallas=True, lanes=2)
    idx2_ref = sp.build_subm_index(gots)
    np.testing.assert_array_equal(np.asarray(idx2.gather),
                                  np.asarray(idx2_ref.gather))


def test_backbone_pallas_multilane_matches_xla(rng):
    """B>1 + use_pallas runs per-lane kernels over per-lane table chunks
    (the multi-frame VMEM-blocking path): BEV maps must equal the XLA
    path's for every lane."""
    import jax

    from shasta_tpu.data.synthetic import make_batch
    from shasta_tpu.models import ShastaModel, ShastaConfig

    kw = dict(max_obj=6, grid_shape=(41, 32, 32),
              cap_conv2=512, cap_conv3=256, cap_conv4=128, cap_extra=128)
    m_xla = ShastaModel(ShastaConfig(**kw))
    m_pal = ShastaModel(ShastaConfig(use_pallas_gather=True, **kw))

    b = make_batch(m_xla.cfg, 2, 128, n_dets=4, seed=3)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    variables = m_xla.init(jax.random.PRNGKey(0), batch, train=False)

    bev_xla = m_xla.apply(variables, batch, train=False,
                          method=ShastaModel.bev_single)
    bev_pal = m_pal.apply(variables, batch, train=False,
                          method=ShastaModel.bev_single)
    np.testing.assert_allclose(
        np.asarray(bev_pal), np.asarray(bev_xla), atol=2e-4
    )


def test_windowed_lookup_matches_xla(rng):
    """Cursor-walk lookup == searchsorted path: hits, misses, SENTINEL
    queries, duplicate (filler) keys, edge positions, non-identity perm."""
    V = 512
    nval = V - 40
    keys = np.sort(rng.choice(5000, size=nval, replace=False)).astype(np.int32)
    keys = np.concatenate([keys, np.full(40, 4999, np.int32)])  # dup filler tail
    keys = np.sort(keys)
    perm = rng.permutation(V).astype(np.int32)

    # monotone per-tap queries (the contract), incl. sentinels + edges
    qs = []
    for k in range(9):
        q = np.sort(keys[rng.integers(0, nval, 300)].astype(np.int64)
                    + rng.integers(-2, 3, 300)).astype(np.int32)
        q[rng.random(300) < 0.05] = SENTINEL
        qs.append(q)
    q = np.stack(qs, 1)
    q[0, 0] = 0
    want = sp._sorted_lookup(jnp.asarray(keys), jnp.asarray(perm), jnp.asarray(q))
    got = windowed_lookup(jnp.asarray(keys), jnp.asarray(perm), jnp.asarray(q))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_windowed_conv_wide_spans(rng):
    """Tiles whose position span exceeds one window (density shifts)
    trigger the exact XLA fallback; results stay correct."""
    V, M, K, C, Co = 8192, 256, 3, 16, 8
    feats = rng.normal(size=(V, C)).astype(np.float32)
    w = (rng.normal(size=(K, C, Co)) * 0.2).astype(np.float32)
    g = np.empty((M, K), np.int64)
    for k in range(K):
        # monotone but stretched: ~1000 positions per 128-row tile
        g[:, k] = np.sort(rng.integers(0, V, size=M))
    g[rng.random((M, K)) < 0.1] = V
    g = g.astype(np.int32)
    out = np.asarray(
        windowed_gather_matmul(jnp.asarray(feats), jnp.asarray(g), jnp.asarray(w))
    )
    np.testing.assert_allclose(out, _xla_ref(feats, g, w), atol=1e-4)


def test_windowed_conv_adaptive_second_window(rng):
    """Bimodal tiles (z-plane boundary in a strided conv: two position
    clusters ~a plane apart) are covered by the adaptive second window
    (nwin=2) without falling back."""
    V, M, K, C, Co = 8192, 512, 5, 16, 8
    feats = rng.normal(size=(V, C)).astype(np.float32)
    w = (rng.normal(size=(K, C, Co)) * 0.2).astype(np.float32)
    g = np.empty((M, K), np.int64)
    T = M // 128
    for k in range(K):
        starts = np.sort(rng.integers(0, V - 4000, size=T))
        for t in range(T):
            a = starts[t] + np.sort(rng.integers(0, 200, size=64))
            b = starts[t] + 3000 + np.sort(rng.integers(0, 200, size=64))
            g[t * 128: (t + 1) * 128, k] = np.concatenate([a, b])
    g[rng.random((M, K)) < 0.1] = V
    g = g.astype(np.int32)
    out = np.asarray(windowed_gather_matmul(
        jnp.asarray(feats), jnp.asarray(g), jnp.asarray(w),
        window=512, nwin=2,
    ))
    np.testing.assert_allclose(out, _xla_ref(feats, g, w), atol=1e-4)


def test_windowed_lookup_multi_hop_density_shift(rng):
    """A dense query band mapping into a sparse key band (and vice versa)
    forces multi-window hops per tile; results must stay exact without
    the fallback path."""
    V = 4096
    # keys: dense cluster then sparse tail (LiDAR ground plane pattern)
    dense = np.sort(rng.choice(4000, size=3000, replace=False))
    sparse = np.sort(rng.choice(np.arange(10_000, 500_000), size=V - 3000,
                                replace=False))
    keys = np.concatenate([dense, sparse]).astype(np.int32)
    perm = rng.permutation(V).astype(np.int32)
    qs = []
    for k in range(5):
        # queries concentrated in the sparse band -> huge span per tile
        q = np.sort(keys[rng.integers(2900, V, 400)].astype(np.int64)
                    + rng.integers(-1, 2, 400)).astype(np.int32)
        qs.append(q)
    q = np.stack(qs, 1)
    want = sp._sorted_lookup(jnp.asarray(keys), jnp.asarray(perm), jnp.asarray(q))
    got = windowed_lookup(jnp.asarray(keys), jnp.asarray(perm), jnp.asarray(q))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_windowed_lookup_queried_duplicate_keys(rng):
    """Duplicate keys that are ACTUALLY QUERIED (e.g. duplicate voxel
    coords in un-deduped input) must resolve to the first duplicate like
    searchsorted side='left' — the compiled kernel's eq-select once
    summed both lanes (caught on-chip: pallas=2p+1 vs xla=p)."""
    V = 640
    base = np.sort(rng.choice(30000, size=V - 60, replace=False))
    dups = rng.choice(base, size=60, replace=False)  # 60 duplicated keys
    keys = np.sort(np.concatenate([base, dups])).astype(np.int32)
    perm = np.arange(V, dtype=np.int32)
    qs = [np.sort(np.concatenate([
        dups, keys[rng.integers(0, V, 240)],
    ])).astype(np.int32) for _ in range(3)]
    q = np.stack(qs, 1)
    want = sp._sorted_lookup(jnp.asarray(keys), jnp.asarray(perm), jnp.asarray(q))
    got = windowed_lookup(jnp.asarray(keys), jnp.asarray(perm), jnp.asarray(q))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # and through the triple path
    from shasta_tpu.ops.pallas.window_conv import windowed_lookup_triple

    got3 = windowed_lookup_triple(jnp.asarray(keys), jnp.asarray(perm),
                                  jnp.asarray(q))
    real = q != SENTINEL
    q3 = np.stack([np.where(real, q - 1, SENTINEL), q,
                   np.where(real, q + 1, SENTINEL)], axis=-1).reshape(q.shape[0], -1)
    want3 = sp._sorted_lookup(jnp.asarray(keys), jnp.asarray(perm), jnp.asarray(q3))
    np.testing.assert_array_equal(np.asarray(got3), np.asarray(want3))


def test_coverage_flag_sink(rng):
    """Under collect_coverage_flags the wrappers skip the lax.cond
    fallbacks, return sanitized results, and record traced ok scalars —
    False exactly when the guarded path would have fallen back."""
    from shasta_tpu.ops.pallas.window_conv import collect_coverage_flags

    V = 512
    keys = np.sort(rng.choice(50000, size=V, replace=False)).astype(np.int32)
    perm = np.arange(V, dtype=np.int32)
    good_q = np.sort(keys[rng.integers(0, V, (300, 3))], axis=0).astype(np.int32)
    bad_q = rng.integers(0, 50000, size=(300, 3)).astype(np.int32)  # unsorted

    with collect_coverage_flags() as fl:
        out_good = windowed_lookup(jnp.asarray(keys), jnp.asarray(perm),
                                   jnp.asarray(good_q))
        out_bad = windowed_lookup(jnp.asarray(keys), jnp.asarray(perm),
                                  jnp.asarray(bad_q))
    assert len(fl.flags) == 2
    assert bool(fl.flags[0]) is True
    assert bool(fl.flags[1]) is False
    assert not bool(fl.all_ok())
    # sanitized: no -1 markers leak to consumers
    assert np.asarray(out_bad).min() >= 0
    ref = sp._sorted_lookup(jnp.asarray(keys), jnp.asarray(perm),
                            jnp.asarray(good_q))
    np.testing.assert_array_equal(np.asarray(out_good), np.asarray(ref))

    # conv wrapper: flag False on scattered indices, True on monotone
    feats = rng.normal(size=(V, 8)).astype(np.float32)
    w = rng.normal(size=(3, 8, 8)).astype(np.float32)
    with collect_coverage_flags() as fl2:
        windowed_gather_matmul(jnp.asarray(feats),
                               jnp.asarray(_monotone_gather(rng, V, 256, 3)),
                               jnp.asarray(w))
        windowed_gather_matmul(
            jnp.asarray(feats),
            jnp.asarray(rng.integers(0, V, (256, 3)).astype(np.int32)),
            jnp.asarray(w))
    assert bool(fl2.flags[0]) is True
    assert bool(fl2.flags[1]) is False


def test_binding_lane_cap_is_soft_flag(rng):
    """A BINDING per-lane slot budget (lane uniques > max_out//B) is a
    documented-divergence signal, not a kernel-correctness failure: it must
    land in soft_flags (strict trips) and leave the hard flags ok — B=1
    truncates the same way silently, and benchmarks gate on hard flags only.
    Regression for the round-3 lanes-4 bench fallback (ops/sparse.py)."""
    from shasta_tpu.ops.pallas.window_conv import collect_coverage_flags

    st = _make_frame_major(rng, per_lane_n=(30, 30), per_lane_cap=32)
    # stride-2 of ~30 voxels in a 6x10x10 grid -> far more than 8 uniques
    # per lane; max_out=16 gives cap_lane=8, so both lanes bind
    with collect_coverage_flags() as fl:
        plan = sp.build_strided_plan(st, (3, 3, 3), (2, 2, 2), (1, 1, 1),
                                     max_out=16, use_pallas=True, lanes=2)
    assert bool(fl.all_ok()), "binding lane cap must not trip a hard flag"
    assert not bool(fl.all_ok_strict()), "binding lane cap must trip strict"
    # and a NON-binding cap trips neither
    with collect_coverage_flags() as fl2:
        sp.build_strided_plan(st, (3, 3, 3), (2, 2, 2), (1, 1, 1),
                              max_out=160, use_pallas=True, lanes=2)
    assert bool(fl2.all_ok()) and bool(fl2.all_ok_strict())
    assert np.asarray(plan.valid).sum() == 16  # every slot filled per lane


def test_windowed_lookup_fallback_on_unsorted(rng):
    """Unsorted query columns overflow the cursor window -> exact XLA
    fallback."""
    V = 512
    keys = np.sort(rng.choice(50000, size=V, replace=False)).astype(np.int32)
    perm = np.arange(V, dtype=np.int32)
    q = rng.integers(0, 50000, size=(300, 9)).astype(np.int32)
    want = sp._sorted_lookup(jnp.asarray(keys), jnp.asarray(perm), jnp.asarray(q))
    got = windowed_lookup(jnp.asarray(keys), jnp.asarray(perm), jnp.asarray(q))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_windowed_conv_bf16_matches_xla(rng):
    """compute_dtype=bfloat16 switches the conv kernel to 16-row window
    alignment (Mosaic packed-dtype requirement); results must match the
    XLA bf16 gather+matmul, single-table and per-lane.

    (A full-backbone bf16 interpret test was removed: it compiled a
    trunk-sized interpret program that segfaulted XLA:CPU when run after
    ~90 other tests' compilations — the kernel-level checks below cover
    the bf16-specific logic without the giant program.)"""
    import jax

    V, M, K, C, Co = 2048, 512, 5, 16, 8
    feats = rng.normal(size=(V, C)).astype(np.float32)
    w = (rng.normal(size=(K, C, Co)) * 0.2).astype(np.float32)
    g = _monotone_gather(rng, V, M, K)

    def xla_bf16(feats, g, w):
        padded = np.concatenate([feats, np.zeros((1, C), np.float32)])
        gathered = jnp.asarray(padded)[jnp.asarray(g)]
        return jax.lax.dot_general(
            gathered.reshape(M, K * C).astype(jnp.bfloat16),
            jnp.asarray(w).reshape(K * C, Co).astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    ref = np.asarray(xla_bf16(feats, g, w))
    out = np.asarray(windowed_gather_matmul(
        jnp.asarray(feats), jnp.asarray(g), jnp.asarray(w),
        compute_dtype=jnp.bfloat16,
    ))
    # both paths round inputs to bf16 and accumulate in f32: tight atol
    np.testing.assert_allclose(out, ref, atol=1e-2, rtol=1e-2)

    # per-lane split (frame-major rows): remap misses per lane, bf16 align
    V1, M1 = V // 2, M // 2
    g2 = g.copy()
    g2[:M1] = np.minimum(g2[:M1], V1 - 1)
    g2[M1:] = np.clip(g2[M1:], V1, V - 1)
    g2[rng.random((M, K)) < 0.1] = V
    out2 = np.asarray(windowed_gather_matmul(
        jnp.asarray(feats), jnp.asarray(g2), jnp.asarray(w),
        compute_dtype=jnp.bfloat16, lanes=2,
    ))
    ref2 = np.asarray(xla_bf16(feats, g2, w))
    np.testing.assert_allclose(out2, ref2, atol=1e-2, rtol=1e-2)


def test_subm_conv_bf16_small_backbone_stage(rng):
    """One subm conv + index build at bf16 through the Pallas flag equals
    the XLA bf16 path (covers ALIGN=16 window bases on a real stage)."""
    st = _make_frame_major(rng)
    w = jnp.asarray(rng.normal(size=(27, 4, 8)).astype(np.float32) * 0.2)
    idx = sp.build_subm_index(st, use_pallas=True, lanes=2)
    got = sp.subm_conv_apply(st, idx, w, compute_dtype=jnp.bfloat16,
                             use_pallas=True, lanes=2)
    ref = sp.subm_conv_apply(st, sp.build_subm_index(st), w,
                             compute_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(got.feats), np.asarray(ref.feats),
                               atol=1e-2, rtol=1e-2)


# ---------------------------------------------------------------------------
# fused lookup-conv (no separate index lookup)
# ---------------------------------------------------------------------------


def test_fused_subm_conv_matches_xla_fastpath(rng):
    """B=1 key-sorted tensor: the fused kernel (key-compare one-hot)
    reproduces the XLA gather conv exactly, with no coverage flag."""
    from shasta_tpu.ops.pallas.window_conv import collect_coverage_flags

    st, _, _ = _make_sparse(rng, B=1, shape=(6, 12, 12), n=50, C=4, cap=64)
    tbl = sp.key_table(st)
    idx_ref = sp.build_subm_index(st, table=tbl)
    w = jnp.asarray((rng.normal(size=(27, 4, 5)) * 0.2).astype(np.float32))
    want = sp.subm_conv_apply(st, idx_ref, w).feats

    fidx = sp.build_subm_index_fused(st, tbl)
    with collect_coverage_flags() as cf:
        got = sp.subm_conv_apply(st, fidx, w).feats
    assert bool(cf.all_ok()), "sorted B=1 input must stay on the fast path"
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_fused_subm_conv_fallback_on_unsorted(rng):
    """Physically unsorted rows violate the fused contract: the monotone
    check trips the flag and the lax.cond fallback stays exact."""
    from shasta_tpu.ops.pallas.window_conv import collect_coverage_flags

    st, _, _ = _make_sparse(rng, B=1, shape=(6, 12, 12), n=50, C=4, cap=64)
    perm = rng.permutation(st.capacity)
    st = sp.SparseTensor(feats=st.feats[perm], coords=st.coords[perm],
                         valid=st.valid[perm], shape=st.shape,
                         batch_size=1)
    tbl = sp.key_table(st)
    idx_ref = sp.build_subm_index(st, table=tbl)
    w = jnp.asarray((rng.normal(size=(27, 4, 5)) * 0.2).astype(np.float32))
    want = sp.subm_conv_apply(st, idx_ref, w).feats

    fidx = sp.build_subm_index_fused(st, tbl)
    with collect_coverage_flags() as cf:
        _ = sp.subm_conv_apply(st, fidx, w).feats
    assert not bool(cf.all_ok()), "unsorted rows must trip the hard flag"
    # no sink: lax.cond falls back to the exact XLA path
    got = sp.subm_conv_apply(st, fidx, w).feats
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_fused_strided_conv_matches_xla(rng):
    """Fused strided plan (gather-free) + conv == the XLA plan + conv,
    including the nwin=2 second window and the 27-tap triple grouping."""
    from shasta_tpu.ops.pallas.window_conv import (FusedIndex,
                                                   collect_coverage_flags)

    st, _, _ = _make_sparse(rng, B=1, shape=(7, 14, 14), n=90, C=4, cap=128)
    tbl = sp.key_table(st)
    args = ((3, 3, 3), (2, 2, 2), (1, 1, 1), 96)
    plan_ref = sp.build_strided_plan(st, *args, table=tbl)
    w = jnp.asarray((rng.normal(size=(27, 4, 6)) * 0.2).astype(np.float32))
    want = sp.strided_conv_apply(st, plan_ref, w)

    knobs = (256, 384, 2)
    plan_f = sp.build_strided_plan(st, *args, table=tbl, use_pallas=True,
                                   fused=True, knobs=knobs)
    # (the HOST-plan serving path replaces this index with a PosIndex —
    # ops/pallas/block_conv.py — but the in-graph builder stays on the
    # key-compare FusedIndex for training/batch/multichip)
    assert isinstance(plan_f.gather, FusedIndex)
    np.testing.assert_array_equal(np.asarray(plan_f.coords),
                                  np.asarray(plan_ref.coords))
    np.testing.assert_array_equal(np.asarray(plan_f.valid),
                                  np.asarray(plan_ref.valid))
    with collect_coverage_flags() as cf:
        got = sp.strided_conv_apply(st, plan_f, w, use_pallas=True,
                                    knobs=knobs)
    assert bool(cf.all_ok())
    np.testing.assert_allclose(np.asarray(got.feats), np.asarray(want.feats),
                               atol=1e-4)


def test_fused_strided_conv_nontriple_kernel(rng):
    """The extra stage's (3,1,1) kernel has kx=1 (no unit-spaced dx
    triples): the fused path must group taps individually (D=1)."""
    from shasta_tpu.ops.pallas.window_conv import collect_coverage_flags

    st, _, _ = _make_sparse(rng, B=1, shape=(7, 10, 10), n=60, C=4, cap=96)
    tbl = sp.key_table(st)
    args = ((3, 1, 1), (2, 1, 1), (0, 0, 0), 64)
    plan_ref = sp.build_strided_plan(st, *args, table=tbl)
    w = jnp.asarray((rng.normal(size=(3, 4, 6)) * 0.2).astype(np.float32))
    want = sp.strided_conv_apply(st, plan_ref, w)

    knobs = (256, 384, 1)
    plan_f = sp.build_strided_plan(st, *args, table=tbl, use_pallas=True,
                                   fused=True, knobs=knobs)
    with collect_coverage_flags() as cf:
        got = sp.strided_conv_apply(st, plan_f, w, use_pallas=True,
                                    knobs=knobs)
    assert bool(cf.all_ok())
    np.testing.assert_allclose(np.asarray(got.feats), np.asarray(want.feats),
                               atol=1e-4)
