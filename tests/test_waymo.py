"""Waymo artifact-contract tracking: build a synthetic segment tree, load
it, and run the classical MOT model over it."""
import json

import numpy as np
import pytest

from shasta_tpu.data.waymo import (
    WaymoScene,
    extract_waymo_segment,
    load_waymo_scene,
    waymo_scene_to_mot_frames,
)
from shasta_tpu.mot import MOTModel
from shasta_tpu.mot.metrics import MOTAccumulator


@pytest.fixture
def waymo_tree(tmp_path):
    rng = np.random.default_rng(0)
    seg = "segment-123"
    n_frames = 6
    dets, det_types, gts, gt_types, gt_ids, ego = [], [], [], [], [], {}
    for f in range(n_frames):
        boxes = []
        gt_boxes = []
        for k in range(2):
            x = 10.0 * (k + 1) + 2.0 * f
            row = [x, 5.0 * k, 0.5, 0.1 * k, 4.5, 2.0, 1.6, 0.9]
            gt_boxes.append(list(row))
            noisy = list(row)
            noisy[0] += rng.normal(0, 0.1)
            boxes.append(noisy)
        dets.append(boxes)
        det_types.append(["vehicle", "vehicle"])
        gts.append(gt_boxes)
        gt_types.append(["vehicle", "vehicle"])
        gt_ids.append(["a", "b"])
        ego[str(f)] = np.eye(4)

    for sub in ("detections/cp/dets", "gt_info", "ego_info", "ts_info"):
        (tmp_path / sub).mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        tmp_path / "detections/cp/dets" / f"{seg}.npz",
        bboxes=np.asarray(dets, dtype=object),
        types=np.asarray(det_types, dtype=object),
        allow_pickle=True,
    )
    np.savez_compressed(
        tmp_path / "gt_info" / f"{seg}.npz",
        bboxes=np.asarray(gts, dtype=object),
        types=np.asarray(gt_types, dtype=object),
        ids=np.asarray(gt_ids, dtype=object),
        allow_pickle=True,
    )
    np.savez_compressed(tmp_path / "ego_info" / f"{seg}.npz", **ego)
    with open(tmp_path / "ts_info" / f"{seg}.json", "w") as f:
        json.dump([0.1 * i for i in range(n_frames)], f)
    return tmp_path, seg


def test_waymo_scene_tracking(waymo_tree):
    root, seg = waymo_tree
    scene = load_waymo_scene(str(root), seg)
    assert isinstance(scene, WaymoScene)
    assert len(scene.dets) == 6 and scene.dets[0].shape == (2, 8)

    model = MOTModel()
    acc = MOTAccumulator()
    for fd in waymo_scene_to_mot_frames(scene):
        out = model.frame_mot(fd)
        acc.update(
            fd.gt_ids, fd.gt_dets[:, :2],
            [tid for _, tid, _, _ in out],
            [s[:2] for s, _, _, _ in out],
        )
    s = acc.summary()
    assert s["mota"] > 0.6, s
    assert s["idsw"] == 0


def test_waymo_extraction_dependency_free(tmp_path):
    # extraction no longer needs waymo-open-dataset (waymo_protos fallback);
    # a missing record file is the only failure mode here
    with pytest.raises(FileNotFoundError):
        extract_waymo_segment(str(tmp_path / "missing.tfrecord"), str(tmp_path))
