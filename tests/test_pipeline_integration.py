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


@pytest.fixture
def micro_nusc(tmp_path):
    """One scene, 3 key frames, 2 moving cars + 1 FP detection."""
    root = tmp_path / "nuScenes"
    ver = root / "v1.0-mini"
    ver.mkdir(parents=True)
    rng = np.random.default_rng(0)

    n_frames = 3
    sample_tokens = [f"samp{i}" for i in range(n_frames)]
    scene = [{
        "token": "scene0", "name": "scene-0001",
        "first_sample_token": sample_tokens[0],
        "last_sample_token": sample_tokens[-1],
    }]
    samples, sample_data, ego_pose, anns = [], [], [], []
    calibrated = [{
        "token": "cs0",
        "translation": [0.9, 0.0, 1.8],
        "rotation": [1.0, 0, 0, 0],
    }]
    instances = [
        {"token": "inst_a", "category_token": "cat_car"},
        {"token": "inst_b", "category_token": "cat_car"},
    ]
    categories = [{"token": "cat_car", "name": "vehicle.car"}]

    results = {}
    for i, tok in enumerate(sample_tokens):
        t_us = 1_000_000 * (i + 1) // 2  # 2 Hz
        samples.append({
            "token": tok, "timestamp": t_us, "scene_token": "scene0",
            "prev": sample_tokens[i - 1] if i > 0 else "",
            "next": sample_tokens[i + 1] if i < n_frames - 1 else "",
        })
        # lidar bin
        sweeps_dir = root / "sweeps"
        sweeps_dir.mkdir(exist_ok=True)
        bin_path = sweeps_dir / f"LIDAR_TOP_{i}.bin"
        pts = rng.uniform(-1, 1, size=(3000, 5)).astype(np.float32)
        pts[:, :2] *= 50
        pts[:, 2] = rng.uniform(-3, 1, 3000)
        pts.tofile(bin_path)
        sample_data.append({
            "token": f"sd{i}", "sample_token": tok, "is_key_frame": True,
            "filename": f"sweeps/LIDAR_TOP_{i}.bin",
            "ego_pose_token": f"ego{i}", "calibrated_sensor_token": "cs0",
            "next": f"sd{i+1}" if i < n_frames - 1 else "",
        })
        ego_pose.append({
            "token": f"ego{i}",
            "translation": [0.0, 0.0, 0.0],
            "rotation": [1.0, 0, 0, 0],
        })
        # two GT cars moving +x at 4 m/s
        dets = []
        for k, inst in enumerate(("inst_a", "inst_b")):
            x = 10.0 * (k + 1) + 2.0 * i
            y = 5.0 * k
            anns.append({
                "token": f"ann{i}_{k}", "sample_token": tok,
                "instance_token": inst,
                "translation": [x, y, 0.5],
                "size": [2.0, 4.5, 1.6],
                "rotation": list(yaw_to_quaternion(0.1 * k)),
                "num_lidar_pts": 10, "num_radar_pts": 0,
                "prev": f"ann{i-1}_{k}" if i > 0 else "",
                "next": f"ann{i+1}_{k}" if i < n_frames - 1 else "",
            })
            dets.append({
                "sample_token": tok,
                "translation": [x + 0.1, y - 0.05, 0.5],
                "size": [2.0, 4.5, 1.6],
                "rotation": list(yaw_to_quaternion(0.1 * k)),
                "velocity": [4.0, 0.0],
                "detection_name": "car",
                "detection_score": 0.9 - 0.1 * k,
                "attribute_name": "vehicle.moving",
            })
        # one far FP
        dets.append({
            "sample_token": tok,
            "translation": [45.0, -40.0, 0.5],
            "size": [2.0, 4.0, 1.5],
            "rotation": [1.0, 0, 0, 0],
            "velocity": [0.0, 0.0],
            "detection_name": "car",
            "detection_score": 0.3,
            "attribute_name": "vehicle.moving",
        })
        results[tok] = dets

    for name, table in (
        ("scene", scene), ("sample", samples), ("sample_data", sample_data),
        ("ego_pose", ego_pose), ("calibrated_sensor", calibrated),
        ("sample_annotation", anns), ("instance", instances),
        ("category", categories), ("attribute", []),
    ):
        with open(ver / f"{name}.json", "w") as f:
            json.dump(table, f)

    results_path = root / "cp_results.json"
    with open(results_path, "w") as f:
        json.dump({"results": results, "meta": {}}, f)

    # infos pkl (create_data equivalent for the micro set)
    infos = []
    for i, tok in enumerate(sample_tokens):
        infos.append({
            "token": tok,
            "lidar_path": str(root / "sweeps" / f"LIDAR_TOP_{i}.bin"),
            "sweeps": [],
        })
    infos_path = root / "infos.pkl"
    with open(infos_path, "wb") as f:
        pickle.dump(infos, f)

    return dict(root=root, results=results_path, infos=infos_path, tokens=sample_tokens)


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
