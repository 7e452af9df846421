"""BatchedScenePipeline: B scene lanes advance together and match the
single-scene ScenePipeline lane-for-lane."""
import numpy as np
import jax
import jax.numpy as jnp

from shasta_tpu.data.synthetic import make_batch
from shasta_tpu.infer import (
    BatchedScenePipeline,
    ScenePipeline,
    default_tracker_params,
)
from shasta_tpu.models import ShastaModel, ShastaConfig


def test_batched_matches_single(rng):
    cfg = ShastaConfig(
        max_obj=6, grid_shape=(41, 48, 48), pc_start=(-3.0, -3.0),
        cap_conv2=512, cap_conv3=256, cap_conv4=128, cap_extra=128,
    )
    model = ShastaModel(cfg)
    B = 2
    b0 = make_batch(cfg, 1, 512, n_dets=4, seed=0)
    b1 = make_batch(cfg, 1, 512, n_dets=5, seed=1)
    variables = model.init(
        jax.random.PRNGKey(0), {k: jnp.asarray(v) for k, v in b0.items()}, train=False
    )

    params = default_tracker_params(max_age=4)
    batched = BatchedScenePipeline(
        model=model, variables=variables, cls_id=2, params=params, batch=B,
    )
    singles = [
        ScenePipeline(model=model, variables=variables, cls_id=2, params=params)
        for _ in range(B)
    ]

    frames = [
        (b0, [4, 5]),
        (make_batch(cfg, 1, 512, n_dets=4, seed=2), [4, 5]),
    ]
    keys = ("voxels", "num_points", "coordinates", "voxels_valid", "det_boxes")
    for fi, (fb, n_currs) in enumerate(frames):
        # lane 0 uses fb as-is; lane 1 uses the other synthetic batch
        other = b1 if fi == 0 else make_batch(cfg, 1, 512, n_dets=5, seed=3)
        stacked = {
            k: np.concatenate([fb[k], other[k]], axis=0) for k in keys
        }
        reset = np.array([fi == 0, fi == 0])
        lags = np.array([0.5, 0.5])
        out = batched.step_frames(stacked, n_currs, reset, lags)
        for lane, lane_batch in enumerate((fb, other)):
            frame = {k: lane_batch[k] for k in keys}
            s = singles[lane].step_frame(frame, n_currs[lane], 0.5)
            np.testing.assert_array_equal(out.used[lane], s.used, err_msg=f"lane {lane}")
            np.testing.assert_array_equal(out.fn[lane], s.fn, err_msg=f"lane {lane}")
            # ids offset by lane * 1e6 in the batched pipeline
            off = lane * 1_000_000
            got = np.where(out.used[lane], out.tid[lane] - off, 0)
            want = np.where(s.used, s.tid, 0)
            np.testing.assert_array_equal(got, want, err_msg=f"lane {lane} frame {fi}")
            np.testing.assert_allclose(out.ref[lane], s.ref, atol=1e-6)


def test_batched_chunk_matches_step_frames(rng):
    """B lanes x T frames through one lax.scan program == T sequential
    step_frames calls (ids/flags/state identical)."""
    cfg = ShastaConfig(
        max_obj=6, grid_shape=(41, 48, 48), pc_start=(-3.0, -3.0),
        cap_conv2=512, cap_conv3=256, cap_conv4=128, cap_extra=128,
    )
    model = ShastaModel(cfg)
    B, T = 2, 3
    batches = [make_batch(cfg, B, 512, n_dets=4, seed=s) for s in range(T)]
    variables = model.init(
        jax.random.PRNGKey(0),
        {k: jnp.asarray(v[:1]) for k, v in batches[0].items()}, train=False,
    )
    params = default_tracker_params(max_age=4)
    keys = ("voxels", "num_points", "coordinates", "voxels_valid", "det_boxes")

    ref_pipe = BatchedScenePipeline(
        model=model, variables=variables, cls_id=2, params=params, batch=B,
    )
    n_currs = [4] * B
    lags = [0.5] * B
    ref = []
    for t, fb in enumerate(batches):
        frame = {k: fb[k] for k in keys}
        ref.append(ref_pipe.step_frames(frame, n_currs, [t == 0] * B, lags))

    chunk_pipe = BatchedScenePipeline(
        model=model, variables=variables, cls_id=2, params=params, batch=B,
    )
    frames = {k: np.stack([fb[k] for fb in batches]) for k in keys}
    resets = np.zeros((T, B), bool)
    resets[0] = True
    out = chunk_pipe.step_chunk(
        frames, np.full((T, B), 4), resets, np.full((T, B), 0.5)
    )
    assert out.tid.shape[:2] == (T, B)
    for t in range(T):
        np.testing.assert_array_equal(out.tid[t], ref[t].tid)
        np.testing.assert_array_equal(out.used[t], ref[t].used)
        np.testing.assert_array_equal(out.keep[t], ref[t].keep)
        np.testing.assert_array_equal(out.fn[t], ref[t].fn)
        np.testing.assert_allclose(out.ref[t], ref[t].ref, atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(chunk_pipe._tables.used), np.asarray(ref_pipe._tables.used)
    )
