"""End-to-end artifact-chain test: synthetic raw nuScenes tables ->
preprocessing chain -> dataset -> collated fixed-shape batch."""
import json
import os
import pickle

import numpy as np
import pytest

from shasta_tpu.preprocessing.nuscenes_chain import run_chain
from shasta_tpu.data.nuscenes import NuScenesTrackDataset, PointPipelineConfig, collate
from shasta_tpu.core.boxes import yaw_to_quaternion


from fixtures_nusc import build_micro_nusc


@pytest.fixture
def micro_nusc(tmp_path):
    return build_micro_nusc(tmp_path)


def test_chain_and_dataset(micro_nusc, tmp_path):
    out = tmp_path / "nusc_preprocessed"
    run_chain(
        dataroot=str(micro_nusc["root"]), version="v1.0-mini",
        results_json=str(micro_nusc["results"]), out_dir=str(out),
        split="train", scene_names=None,
    )
    # artifacts exist
    split = out / "train_2hz"
    assert (split / "token_info" / "scene-0001.json").exists()
    assert (split / "gt_info" / "scene-0001.npz").exists()
    assert (out / "train_frame_info.json").exists()
    tok1 = micro_nusc["tokens"][1]
    lbl = np.load(split / "gt_shasta" / "cp" / "individual_frames" / f"{tok1}.npz",
                  allow_pickle=True)
    matched = lbl["matched"]
    assert matched.shape == (3, 3 + 2)  # 3 prev dets x (3 curr + dead + fn)
    # the two real cars match themselves; the FP det is dead
    assert matched[0, 0] == 1 and matched[1, 1] == 1
    assert matched[2, -2] == 1
    np.testing.assert_array_equal(lbl["newborn"], [0, 0, 0])
    # frame 0: all TP dets newborn
    tok0 = micro_nusc["tokens"][0]
    lbl0 = np.load(split / "gt_shasta" / "cp" / "individual_frames" / f"{tok0}.npz",
                   allow_pickle=True)
    np.testing.assert_array_equal(lbl0["newborn"], [1, 1, 0])

    # sensor dets: ego at origin with sensor offset 0.9 -> x shifted by -0.9
    sd = json.load(open(split / "detections" / "cp" / "sensor_individual_frames" / f"{tok0}.json"))
    assert abs(sd[0][0] - (10.1 - 0.9)) < 1e-6

    # dataset consumes the tree
    ds = NuScenesTrackDataset(
        info_path=str(micro_nusc["infos"]),
        det_path=str(split / "detections" / "cp" / "sensor_individual_frames"),
        cls_info_path=str(split / "detections" / "cp" / "cls_individual_frames"),
        frame_info_path=str(out / "train_frame_info.json"),
        labels_path=str(split / "gt_shasta" / "cp" / "individual_frames"),
        det_type=["car"],
        max_objects=6,
        fp_ratio=1.0,
        dead_trk_ratio=1.0,
        pipeline=PointPipelineConfig(max_voxels=5000, nsweeps=1),
    )
    s0 = ds[0]
    s1 = ds[1]
    batch = collate([s0, s1])
    assert batch["det_boxes"].shape == (2, 6, 11)
    assert batch["gt"].shape == (2, 8, 8)
    assert batch["voxels"].shape[0] == 2 and batch["voxels"].shape[1] == 5000
    # frame 1 gt: dets 0,1 matched diagonally, FP col kept (ratio 1.0)
    g = batch["gt"][1]
    assert g[0, 0] == 1 and g[1, 1] == 1
    # sample 0 has no prev -> all zeros except newborn/fp rows
    g0 = batch["gt"][0]
    assert g0[:6].sum() == 0
    assert g0[6, :2].sum() == 2  # both cars newborn
