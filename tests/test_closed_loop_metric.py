"""Closed-loop END-METRIC test: training improves tracking AMOTA.

The reference's only regression signal is AMOTA on real nuScenes data
(SURVEY §4), which this image lacks. This test substitutes a synthetic
world with real structure — moving cars with LiDAR point clusters, noisy
detections, mid-score false positives on empty ground, detection dropouts
— and verifies the WHOLE stack end-to-end: preprocessing chain -> GT
affinity matrices -> cached-descriptor training -> scene-batched affinity
eval -> merged tracking -> AMOTA sweep. The trained model must beat the
untrained one on held-out scenes (FP elimination + FN propagation are the
levers; with the tp-score sweep fixed this is a strict improvement).
"""
import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fixtures_nusc import build_synthetic_world
from shasta_tpu.data.nuscenes import (
    CachedFeatureDataset,
    NuScenesTrackDataset,
    PointPipelineConfig,
    collate,
)
from shasta_tpu.models import ShastaModel, ShastaConfig
from shasta_tpu.models.shasta import ShastaModel as SM
from shasta_tpu.preprocessing.nuscenes_chain import run_chain
from shasta_tpu.tracker.runner import (
    eval_tracking_lite,
    run_affinity_eval_batched,
    save_first_frame,
    track,
)
from shasta_tpu.train.loop import create_train_state, make_optimizer, make_train_step

N = 10  # max_obj: up to 5 objects + 3 FPs per frame


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("loop")
    fx = build_synthetic_world(tmp, n_scenes=4, n_frames=12, n_objects=5,
                               det_noise=0.3, fp_per_frame=3, miss_prob=0.2,
                               seed=0)
    names = fx["scene_names"]
    out = tmp / "prep"
    run_chain(dataroot=str(fx["root"]), version="v1.0-mini",
              results_json=str(fx["results"]), out_dir=str(out),
              split="train", scene_names=names[:3])
    run_chain(dataroot=str(fx["root"]), version="v1.0-mini",
              results_json=str(fx["results"]), out_dir=str(out),
              split="val", scene_names=names[3:])

    # per-split infos (the generator's pkl spans all scenes)
    all_infos = pickle.load(open(fx["infos"], "rb"))

    def scene_of(tok):
        return int(tok[1:tok.index("f")])

    for split, pred in (("train", lambda si: si < 3), ("val", lambda si: si >= 3)):
        sub = [i for i in all_infos if pred(scene_of(i["token"]))]
        with open(tmp / f"infos_{split}.pkl", "wb") as f:
            pickle.dump(sub, f)

    pp = PointPipelineConfig(
        voxel_size=(0.75, 0.75, 0.1), pc_range=(-24.0, -24.0, -3.0, 24.0, 24.0, 1.0),
        max_voxels=3000, nsweeps=1, shuffle_points=False, sort_voxels=True,
        global_rot_noise=None, global_scale_noise=None, global_translate_std=None,
    )

    def split_kw(split):
        d = out / f"{split}_2hz"
        return dict(
            info_path=str(tmp / f"infos_{split}.pkl"),
            det_path=str(d / "detections/cp/sensor_individual_frames"),
            cls_info_path=str(d / "detections/cp/cls_individual_frames"),
            frame_info_path=str(out / f"{split}_frame_info.json"),
        )

    return dict(tmp=tmp, out=out, pp=pp, split_kw=split_kw)


def test_training_improves_amota(world):
    tmp, out, pp, split_kw = (world[k] for k in ("tmp", "out", "pp", "split_kw"))
    cfg = ShastaConfig(
        max_obj=N, grid_shape=(41, 64, 64), pc_start=(-24.0, -24.0),
        voxel_size=(0.75, 0.75), out_stride=8,
        cap_conv2=4096, cap_conv3=2048, cap_conv4=1024, cap_extra=1024,
        assume_sorted_voxels=True,
    )
    model = ShastaModel(cfg)
    train_kw = dict(
        **split_kw("train"),
        labels_path=str(out / "train_2hz/gt_shasta/cp/individual_frames"),
        det_type=["car"], max_objects=N, fp_ratio=1.0, dead_trk_ratio=1.0,
        pipeline=pp, seed=0,
    )
    val_ds = NuScenesTrackDataset(
        **split_kw("val"), det_type=["car"], max_objects=N, test_mode=True,
        pipeline=pp,
    )

    pts_ds = NuScenesTrackDataset(
        **split_kw("train"), det_type=["car"], max_objects=N, test_mode=True,
        pipeline=pp,
    )
    b0 = collate([pts_ds[0]])
    one = {k: jnp.asarray(v) for k, v in b0.items() if not isinstance(v, list)}
    variables0 = model.init(jax.random.PRNGKey(0), one, train=False)

    # cache frozen-trunk descriptors for the train frames
    feat_dir = tmp / "cache"
    os.makedirs(feat_dir, exist_ok=True)
    feats_fn = jax.jit(
        lambda v, f: model.apply(v, f, train=False, method=SM.frame_features)
    )
    keys = ("voxels", "num_points", "coordinates", "voxels_valid", "det_boxes")
    for i in range(len(pts_ds)):
        s = pts_ds[i]
        fr = {k: jnp.asarray(collate([s])[k]) for k in keys}
        np.savez_compressed(
            feat_dir / (s["token"] + ".npz"),
            feat=np.asarray(feats_fn(variables0, fr))[0].astype(np.float32),
        )

    cached_ds = CachedFeatureDataset(
        NuScenesTrackDataset(**train_kw, load_points=False), str(feat_dir)
    )

    tx = make_optimizer(learning_rate=1e-3, freeze_bev=True,
                        params=variables0["params"])
    state = create_train_state(model, variables0, tx)
    step = make_train_step(model, tx, donate=False, cached=True)
    rng = np.random.default_rng(0)
    idx = np.arange(len(cached_ds))
    losses = []
    for _ in range(45):
        rng.shuffle(idx)
        for s0 in range(0, len(idx) - 3, 4):
            batch = collate([cached_ds[int(j)] for j in idx[s0:s0 + 4]])
            jb = {k: jnp.asarray(v) for k, v in batch.items()
                  if not isinstance(v, list)}
            state, m = step(state, jb)
            losses.append(float(m["loss"]))
    assert np.mean(losses[-8:]) < 0.3 * np.mean(losses[:8]), "training failed"

    def metrics_for(params):
        variables = {"params": params, "batch_stats": variables0["batch_stats"]}
        annos = run_affinity_eval_batched(model, variables, val_ds, batch=1)
        frames = save_first_frame(split_kw("val")["frame_info_path"],
                                  str(tmp / "meta"))
        result, _ = track(annos["results"], frames, max_age=4, merged=True)
        return eval_tracking_lite(
            result["results"], str(out / "val_2hz/gt_info/individual_frames")
        )["car"]

    untrained = metrics_for(variables0["params"])
    trained = metrics_for(state.params)
    # (observed: untrained amota ~0.79 / mota 0.30; trained ~0.85 / 0.85)
    assert trained["amota"] > untrained["amota"] + 0.005, (untrained, trained)
    assert trained["mota"] > untrained["mota"] + 0.2, (untrained, trained)
    assert trained["recall"] >= untrained["recall"] - 0.02, (untrained, trained)
