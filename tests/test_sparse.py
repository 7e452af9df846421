import numpy as np
import jax
import jax.numpy as jnp

from shasta_tpu.ops import sparse as sp


def _make_sparse(rng, B=2, shape=(6, 10, 10), n=40, C=4, cap=64):
    Z, Y, X = shape
    coords = set()
    while len(coords) < n:
        coords.add(
            (
                int(rng.integers(B)),
                int(rng.integers(Z)),
                int(rng.integers(Y)),
                int(rng.integers(X)),
            )
        )
    coords = np.array(sorted(coords), np.int32)
    feats = rng.normal(size=(n, C)).astype(np.float32)
    pad_c = np.zeros((cap - n, 4), np.int32)
    pad_f = np.zeros((cap - n, C), np.float32)
    st = sp.SparseTensor(
        feats=jnp.array(np.concatenate([feats, pad_f])),
        coords=jnp.array(np.concatenate([coords, pad_c])),
        valid=jnp.array(np.arange(cap) < n),
        shape=shape,
        batch_size=B,
    )
    return st, coords, feats


def _densify(st, coords, feats):
    B = st.batch_size
    Z, Y, X = st.shape
    C = feats.shape[1]
    d = np.zeros((B, Z, Y, X, C), np.float32)
    for (b, z, y, x), f in zip(coords, feats):
        d[b, z, y, x] = f
    return d


def _dense_conv3d(x, w, stride, padding):
    # x: (B, Z, Y, X, C); w: (kz, ky, kx, Cin, Cout)
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=[(p, p) for p in padding],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def test_subm_conv_matches_dense(rng):
    st, coords, feats = _make_sparse(rng)
    C, Co = 4, 6
    w = rng.normal(size=(27, C, Co)).astype(np.float32) * 0.2
    b = rng.normal(size=(Co,)).astype(np.float32)
    idx = sp.build_subm_index(st)
    out = sp.subm_conv_apply(st, idx, jnp.array(w), jnp.array(b))

    dense = _densify(st, coords, feats)
    wd = w.reshape(3, 3, 3, C, Co)
    ref = np.asarray(_dense_conv3d(jnp.array(dense), jnp.array(wd), (1, 1, 1), (1, 1, 1)))
    # submanifold: compare at active positions only
    got = np.asarray(out.feats)
    for i, (bb, z, y, x) in enumerate(coords):
        np.testing.assert_allclose(got[i], ref[bb, z, y, x] + b, rtol=1e-4, atol=1e-4)
    # padded rows zero
    assert np.all(got[len(coords):] == 0)


def test_strided_conv_matches_dense(rng):
    st, coords, feats = _make_sparse(rng, shape=(7, 11, 9), n=50, cap=64)
    C, Co = 4, 5
    w = rng.normal(size=(27, C, Co)).astype(np.float32) * 0.2
    plan = sp.build_strided_plan(st, (3, 3, 3), (2, 2, 2), (1, 1, 1), max_out=128)
    out = sp.strided_conv_apply(st, plan, jnp.array(w))

    dense = _densify(st, coords, feats)
    wd = w.reshape(3, 3, 3, C, Co)
    ref = np.asarray(_dense_conv3d(jnp.array(dense), jnp.array(wd), (2, 2, 2), (1, 1, 1)))

    oc = np.asarray(out.coords)
    ov = np.asarray(out.valid)
    got = np.asarray(out.feats)
    # 1. every active output matches the dense conv
    for i in np.nonzero(ov)[0]:
        b, z, y, x = oc[i]
        np.testing.assert_allclose(got[i], ref[b, z, y, x], rtol=1e-4, atol=1e-4)
    # 2. exact spconv active-set semantics: the active set is all outputs
    # whose receptive field touches >=1 input voxel
    expect = set()
    Z, Y, X = st.shape
    OZ, OY, OX = plan.out_shape
    for (b, z, y, x) in coords:
        for kz in range(3):
            for ky in range(3):
                for kx in range(3):
                    num = np.array([z, y, x]) + 1 - np.array([kz, ky, kx])
                    if np.all(num % 2 == 0):
                        o = num // 2
                        if np.all(o >= 0) and o[0] < OZ and o[1] < OY and o[2] < OX:
                            expect.add((b, o[0], o[1], o[2]))
    got_set = {tuple(oc[i]) for i in np.nonzero(ov)[0]}
    assert got_set == expect
    # 3. everywhere else in the dense conv output is exactly zero
    mask = np.zeros(ref.shape[:4], bool)
    for (b, z, y, x) in got_set:
        mask[b, z, y, x] = True
    assert np.allclose(ref[~mask], 0.0)


def test_asymmetric_kernel_conv(rng):
    # the extra_conv geometry: kernel (3,1,1), stride (2,1,1), pad 0
    st, coords, feats = _make_sparse(rng, shape=(5, 6, 6), n=30, cap=40)
    C, Co = 4, 4
    w = rng.normal(size=(3, C, Co)).astype(np.float32) * 0.3
    plan = sp.build_strided_plan(st, (3, 1, 1), (2, 1, 1), (0, 0, 0), max_out=64)
    out = sp.strided_conv_apply(st, plan, jnp.array(w))

    dense = _densify(st, coords, feats)
    wd = w.reshape(3, 1, 1, C, Co)
    ref = np.asarray(_dense_conv3d(jnp.array(dense), jnp.array(wd), (2, 1, 1), (0, 0, 0)))
    oc = np.asarray(out.coords)
    ov = np.asarray(out.valid)
    got = np.asarray(out.feats)
    assert plan.out_shape == (2, 6, 6)
    for i in np.nonzero(ov)[0]:
        b, z, y, x = oc[i]
        np.testing.assert_allclose(got[i], ref[b, z, y, x], rtol=1e-4, atol=1e-4)


def test_to_dense_roundtrip(rng):
    st, coords, feats = _make_sparse(rng)
    d = np.asarray(sp.to_dense(st))
    ref = _densify(st, coords, feats)
    np.testing.assert_allclose(d, ref)


def test_masked_batch_stats(rng):
    feats = rng.normal(size=(32, 8)).astype(np.float32)
    valid = np.arange(32) < 20
    mean, var = sp.masked_batch_stats(jnp.array(feats), jnp.array(valid))
    np.testing.assert_allclose(np.asarray(mean), feats[:20].mean(0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(var), feats[:20].var(0), atol=1e-5)


def test_strided_output_is_key_sorted_and_presorted_table_matches(rng):
    """StridedPlan emits an ascending-key set with SENTINEL tail, so
    key_table_presorted over it equals the argsort key_table — the
    invariant the backbone's sort-skipping relies on."""
    import jax.numpy as jnp

    st, coords, feats = _make_sparse(rng, B=2, shape=(8, 12, 12), n=60, C=4, cap=96)
    plan = sp.build_strided_plan(st, (3, 3, 3), (2, 2, 2), (1, 1, 1), max_out=128)
    out = sp.SparseTensor(
        feats=jnp.zeros((128, 4)), coords=plan.coords, valid=plan.valid,
        shape=plan.out_shape, batch_size=2,
    )
    keys = sp.encode_keys(out.coords, out.valid, out.shape, out.batch_size)
    keys_np = np.asarray(keys)
    assert np.all(np.diff(keys_np.astype(np.int64)) >= 0), "not ascending"
    fast = sp.key_table_presorted(out)
    slow = sp.key_table(out)
    np.testing.assert_array_equal(np.asarray(fast.sorted_keys), np.asarray(slow.sorted_keys))
    # permutations may differ among equal SENTINEL tails; the LOOKUP result
    # must be identical for any query set
    q = sp.encode_keys(out.coords, out.valid, out.shape, out.batch_size)
    a = sp._sorted_lookup(fast.sorted_keys, fast.perm, q)
    b = sp._sorted_lookup(slow.sorted_keys, slow.perm, q)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_subm_index_with_shared_table_matches(rng):
    st, coords, feats = _make_sparse(rng, B=1, shape=(6, 10, 10), n=40, C=4, cap=64)
    t = sp.key_table(st)
    a = sp.build_subm_index(st)
    b = sp.build_subm_index(st, table=t)
    np.testing.assert_array_equal(np.asarray(a.gather), np.asarray(b.gather))
    p1 = sp.build_strided_plan(st, (3, 3, 3), (2, 2, 2), (1, 1, 1), 64)
    p2 = sp.build_strided_plan(st, (3, 3, 3), (2, 2, 2), (1, 1, 1), 64, table=t)
    np.testing.assert_array_equal(np.asarray(p1.gather), np.asarray(p2.gather))
    np.testing.assert_array_equal(np.asarray(p1.coords), np.asarray(p2.coords))


def test_assume_sorted_voxels_matches_argsort_path(rng):
    """bev_single with host-sorted voxels + assume_sorted_voxels=True equals
    the default argsort path on the same data (B=1 serving contract)."""
    import jax
    import jax.numpy as jnp

    from shasta_tpu.models import ShastaModel, ShastaConfig

    kw = dict(max_obj=6, grid_shape=(41, 32, 32),
              cap_conv2=1024, cap_conv3=512, cap_conv4=256, cap_extra=256)
    m_base = ShastaModel(ShastaConfig(**kw))
    m_fast = ShastaModel(ShastaConfig(assume_sorted_voxels=True, **kw))

    # unique coords, host-sorted by linear (z,y,x) key, valid prefix
    Z, Y, X = 40, 32, 32
    n, V = 300, 512
    seen = set()
    while len(seen) < n:
        seen.add((int(rng.integers(Z)), int(rng.integers(Y)), int(rng.integers(X))))
    coords = np.array(sorted(seen), np.int32)  # sorted == key order (z,y,x)
    vox = rng.normal(size=(V, 3, 5)).astype(np.float32)
    nump = np.full((V,), 3, np.int32)
    valid = np.arange(V) < n
    frame = {
        "voxels": jnp.asarray(vox[None]),
        "num_points": jnp.asarray(np.where(valid, nump, 0)[None]),
        "coordinates": jnp.asarray(
            np.concatenate([coords, np.zeros((V - n, 3), np.int32)])[None]
        ),
        "voxels_valid": jnp.asarray(valid[None]),
        "det_boxes": jnp.zeros((1, 6, 11)),
    }
    variables = m_base.init(jax.random.PRNGKey(0), {
        **frame, "prev_det_boxes": frame["det_boxes"],
        **{f"prev_{k}": v for k, v in frame.items() if k != "det_boxes"},
    }, train=False)

    bev_a = m_base.apply(variables, frame, train=False,
                         method=ShastaModel.bev_single)
    bev_b = m_fast.apply(variables, frame, train=False,
                         method=ShastaModel.bev_single)
    np.testing.assert_allclose(np.asarray(bev_b), np.asarray(bev_a), atol=1e-5)


def test_key_table_checked_guards_unsorted_input(rng):
    """The guarded table sorts when input is NOT sorted, so
    assume_sorted_voxels is safe even on wrong inputs."""
    st, coords, feats = _make_sparse(rng, B=1, shape=(6, 10, 10), n=40, C=4, cap=64)
    want = sp.key_table(st)
    got = sp.key_table_checked(st)
    np.testing.assert_array_equal(np.asarray(got.sorted_keys), np.asarray(want.sorted_keys))
    q = sp.encode_keys(st.coords, st.valid, st.shape, st.batch_size)
    np.testing.assert_array_equal(
        np.asarray(sp._sorted_lookup(got.sorted_keys, got.perm, q)),
        np.asarray(sp._sorted_lookup(want.sorted_keys, want.perm, q)),
    )


def test_frame_major_packed_sorted_keys_are_globally_ascending(rng):
    """Per-frame key-sorted voxels packed frame-major (with per-frame padded
    tails) produce a globally ascending key array — the invariant that lets
    assume_sorted_voxels skip the stage-0 argsort at ANY batch size
    (padded rows map to their frame's filler key, encode stride Z*Y*X+1)."""
    import jax.numpy as jnp

    Z, Y, X = 6, 10, 10
    B, V, n = 3, 64, 40
    rows = []
    for b in range(B):
        seen = set()
        while len(seen) < n:
            seen.add((int(rng.integers(Z)), int(rng.integers(Y)), int(rng.integers(X))))
        coords = np.array(sorted(seen), np.int32)
        full = np.zeros((V, 4), np.int32)
        full[:, 0] = b  # correct batch index on padded rows too (bev_maps)
        full[:n, 1:] = coords
        rows.append(full)
    coords = np.concatenate(rows)
    valid = np.concatenate([np.arange(V) < n] * B)
    st = sp.SparseTensor(
        feats=jnp.zeros((B * V, 4)), coords=jnp.asarray(coords),
        valid=jnp.asarray(valid), shape=(Z, Y, X), batch_size=B,
    )
    keys = np.asarray(sp.encode_keys(st.coords, st.valid, st.shape, st.batch_size))
    assert np.all(np.diff(keys.astype(np.int64)) >= 0), "packing not ascending"
    # and the guarded table then equals the argsort table for any lookup
    fast = sp.key_table_checked(st)
    slow = sp.key_table(st)
    q = sp.encode_keys(st.coords, st.valid, st.shape, st.batch_size)
    np.testing.assert_array_equal(
        np.asarray(sp._sorted_lookup(fast.sorted_keys, fast.perm, q)),
        np.asarray(sp._sorted_lookup(slow.sorted_keys, slow.perm, q)),
    )
