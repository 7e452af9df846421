"""End-to-end on-device scene pipeline over the micro synthetic dataroot."""
import numpy as np
import jax
import pytest

from fixtures_nusc import build_micro_nusc
from shasta_tpu.preprocessing.nuscenes_chain import run_chain
from shasta_tpu.data.nuscenes import NuScenesTrackDataset, PointPipelineConfig
from shasta_tpu.infer import ScenePipeline, default_tracker_params, track_scene_dataset
from shasta_tpu.models import ShastaModel, ShastaConfig
from shasta_tpu.tracker.pub_tracker import NUSCENES_TRACKING_NAMES


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("infer")
    fx = build_micro_nusc(tmp)
    out = tmp / "prep"
    run_chain(
        dataroot=str(fx["root"]), version="v1.0-mini",
        results_json=str(fx["results"]), out_dir=str(out),
        split="val", scene_names=None,
    )
    split = out / "val_2hz"
    ds = NuScenesTrackDataset(
        info_path=str(fx["infos"]),
        det_path=str(split / "detections" / "cp" / "sensor_individual_frames"),
        cls_info_path=str(split / "detections" / "cp" / "cls_individual_frames"),
        frame_info_path=str(out / "val_frame_info.json"),
        det_type=["car"],
        max_objects=6,
        test_mode=True,
        pipeline=PointPipelineConfig(
            voxel_size=(0.075, 0.075, 0.05),
            pc_range=(-3.0, -3.0, -1.0, 3.0, 3.0, 1.0),
            max_voxels=4000, nsweeps=1, shuffle_points=False,
        ),
    )
    cfg = ShastaConfig(
        max_obj=6, grid_shape=(41, 80, 80), pc_start=(-3.0, -3.0),
        cap_conv2=2000, cap_conv3=1000, cap_conv4=500, cap_extra=500,
    )
    model = ShastaModel(cfg)
    from shasta_tpu.data.nuscenes import collate

    batch = collate([ds[0]])
    import jax.numpy as jnp

    one = {k: jnp.asarray(v) for k, v in batch.items() if not isinstance(v, list)}
    variables = model.init(jax.random.PRNGKey(0), one, train=False)
    return dict(ds=ds, model=model, variables=variables)


def test_batched_affinity_eval_matches_host(setup):
    """run_affinity_eval_batched (scene lanes, carried descriptors) produces
    the same cp_{split} annos as the reference-shaped per-pair loop."""
    import jax.numpy as jnp

    from shasta_tpu.tracker.runner import run_affinity_eval, run_affinity_eval_batched

    model, variables, ds = setup["model"], setup["variables"], setup["ds"]

    @jax.jit
    def fwd(variables, batch):
        return model.apply(variables, batch, train=False)

    def forward(batch_np):
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()
                 if not isinstance(v, list)}
        return fwd(variables, batch)

    host = run_affinity_eval(forward, ds)
    fast = run_affinity_eval_batched(model, variables, ds, batch=2)
    # chunked: T=2 steps per lax.scan program call, same schedule
    chunked = run_affinity_eval_batched(model, variables, ds, batch=2, chunk=2)

    assert set(fast["results"]) == set(host["results"])
    assert set(chunked["results"]) == set(host["results"])
    for tok in host["results"]:
        ha, fa = host["results"][tok], fast["results"][tok]
        ca = chunked["results"][tok]
        assert len(ha) == len(fa) == len(ca), tok
        for h, f, c in zip(ha, fa, ca):
            assert h.get("newborn") == f.get("newborn") == c.get("newborn")
            assert h.get("dead") == f.get("dead") == c.get("dead")
            assert h.get("FN") == f.get("FN") == c.get("FN")
            np.testing.assert_allclose(
                h["ref_detection_score"], f["ref_detection_score"], atol=2e-5
            )
            np.testing.assert_allclose(
                c["ref_detection_score"], f["ref_detection_score"], atol=2e-5
            )
            np.testing.assert_allclose(h["translation"], f["translation"], atol=1e-6)
            np.testing.assert_allclose(c["translation"], f["translation"], atol=1e-6)


def test_scene_pipeline_tracks(setup):
    pipe = ScenePipeline(
        model=setup["model"],
        variables=setup["variables"],
        cls_id=NUSCENES_TRACKING_NAMES.index("car"),
        params=default_tracker_params(max_age=4),
    )
    result = track_scene_dataset(pipe, setup["ds"])
    assert len(result["results"]) == 3
    # every output anno carries an id and a refined score
    for token, annos in result["results"].items():
        for a in annos:
            assert int(a["tracking_id"]) >= 1
            assert 0.0 <= a["tracking_score"] <= 1.0
    # with an untrained net, decisions may drop dets, but outputs exist for
    # at least the first frame (everything is newborn-or-kept at start)
    first = sorted(result["results"].items())[0][1]
    assert len(first) >= 1


def test_step_chunk_matches_per_frame(setup):
    """T frames through ONE lax.scan program == T sequential step_frame
    calls: same ids/flags/scores, same carried tracker state."""
    import jax.numpy as jnp

    from shasta_tpu.data.nuscenes import collate

    ds, model, variables = setup["ds"], setup["model"], setup["variables"]
    params = default_tracker_params(max_age=4)
    samples = [ds[i] for i in range(min(3, len(ds)))]
    T = len(samples)
    batches = [collate([s]) for s in samples]
    n_currs = [len(s["cls_det_boxes"]) for s in samples]
    lags = [0.5] * T

    ref_pipe = ScenePipeline(model=model, variables=variables, cls_id=2,
                             params=params)
    ref = [ref_pipe.step_frame(b, n, l)
           for b, n, l in zip(batches, n_currs, lags)]

    chunk_pipe = ScenePipeline(model=model, variables=variables, cls_id=2,
                               params=params)
    frames = {
        k: jnp.stack([jnp.asarray(b[k]) for b in batches])
        for k in batches[0] if not isinstance(batches[0][k], list)
    }
    out = chunk_pipe.step_chunk(frames, n_currs, lags)
    assert out.tid.shape[0] == T
    for t in range(T):
        np.testing.assert_array_equal(out.tid[t], ref[t].tid)
        np.testing.assert_array_equal(out.used[t], ref[t].used)
        np.testing.assert_array_equal(out.keep[t], ref[t].keep)
        np.testing.assert_array_equal(out.fn[t], ref[t].fn)
        np.testing.assert_allclose(out.ref[t], ref[t].ref, atol=1e-5)
    # carried state identical afterwards
    np.testing.assert_allclose(np.asarray(chunk_pipe._prev_feat),
                               np.asarray(ref_pipe._prev_feat), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(chunk_pipe._table.used),
                                  np.asarray(ref_pipe._table.used))
