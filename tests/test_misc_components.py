import json

import numpy as np

from shasta_tpu.mot.metrics import MOTAccumulator
from shasta_tpu.preprocessing.det_tools import filter_track_types, nms_detections_npz
from shasta_tpu.preprocessing.stats import estimate_covariances
from shasta_tpu.viz.visualizer2d import Visualizer2D, render_scene_tracks


def test_mot_accumulator_perfect():
    acc = MOTAccumulator()
    for f in range(5):
        acc.update(["a", "b"], [[f, 0], [f, 5]], [1, 2], [[f, 0.1], [f, 5.1]])
    s = acc.summary()
    assert s["mota"] == 1.0 and s["idsw"] == 0 and s["fp"] == 0 and s["fn"] == 0
    assert 0.05 < s["motp"] < 0.2


def test_mot_accumulator_id_switch_and_fp():
    acc = MOTAccumulator()
    acc.update(["a"], [[0, 0]], [1], [[0, 0]])
    acc.update(["a"], [[1, 0]], [2], [[1, 0]])  # same GT, new hyp id -> IDSW
    acc.update(["a"], [[2, 0]], [2, 3], [[2, 0], [50, 50]])  # extra FP
    s = acc.summary()
    assert s["idsw"] == 1
    assert s["fp"] == 1
    assert s["fn"] == 0


def test_stats_estimator_recovers_noise():
    rng = np.random.default_rng(0)
    frames = []
    x = np.zeros(2)
    v = np.array([2.0, 0.0])
    for f in range(60):
        x = x + v * 0.5
        gt = np.zeros((1, 8))
        gt[0, :2] = x
        gt[0, 4:7] = [4, 2, 1.5]
        det = gt.copy()
        det[0, :2] += rng.normal(0, 0.3, 2)  # measurement noise std 0.3
        det[0, 7] = 0.9
        frames.append(dict(dets=det, det_types=["car"], gts=gt,
                           gt_types=["car"], gt_ids=["a"]))
    P, Q, R = estimate_covariances([{"frames": frames, "dt": 0.5}])
    assert 0.04 < R["car"][0] < 0.2  # ~0.09 variance
    assert len(P["car"]) == 11 and len(Q["car"]) == 11 and len(R["car"]) == 7


def test_filter_track_types(tmp_path):
    src = tmp_path / "raw.json"
    json.dump({"results": {"t": [
        {"detection_name": "car"}, {"detection_name": "barrier"},
        {"detection_name": "pedestrian"},
    ]}, "meta": {}}, open(src, "w"))
    out = tmp_path / "filtered.json"
    filter_track_types(str(src), str(out))
    d = json.load(open(out))
    names = [a["detection_name"] for a in d["results"]["t"]]
    assert names == ["car", "pedestrian"]


def test_nms_detections_npz(tmp_path):
    det_dir = tmp_path / "dets"
    det_dir.mkdir()
    # two overlapping dets + one far det, nu rows [t(3) s(3) q(4) score]
    rows = [
        [0, 0, 0, 2, 4, 1.5, 1, 0, 0, 0, 0.9],
        [0.1, 0, 0, 2, 4, 1.5, 1, 0, 0, 0, 0.5],
        [30, 0, 0, 2, 4, 1.5, 1, 0, 0, 0, 0.8],
    ]
    np.savez_compressed(det_dir / "scene-1.npz",
                        bboxes=np.asarray([rows], dtype=object),
                        types=np.asarray([["car", "car", "car"]], dtype=object),
                        allow_pickle=True)
    out_dir = tmp_path / "out"
    nms_detections_npz(str(det_dir), str(out_dir))
    d = np.load(out_dir / "scene-1.npz", allow_pickle=True)
    assert len(d["bboxes"][0]) == 2  # overlap suppressed


def test_visualizer_renders(tmp_path):
    viz = Visualizer2D("test")
    viz.handler_pc(np.random.default_rng(0).uniform(-10, 10, (100, 2)))
    viz.handler_box(np.array([0, 0, 0, 0.3, 4, 2, 1.5, 0.9]), "1", "red")
    p = tmp_path / "fig.png"
    viz.save(str(p))
    viz.close()
    assert p.stat().st_size > 1000

    results = {
        "t0": [{"translation": [0, 0, 0], "rotation": [1, 0, 0, 0],
                "size": [2, 4, 1.5], "tracking_id": "1", "tracking_score": 0.9}],
        "t1": [{"translation": [1, 0, 0], "rotation": [1, 0, 0, 0],
                "size": [2, 4, 1.5], "tracking_id": "1", "tracking_score": 0.9}],
    }
    p2 = tmp_path / "tracks.png"
    render_scene_tracks(results, str(p2))
    assert p2.stat().st_size > 1000


def test_dataset_wrappers():
    """ConcatDataset/RepeatDataset (det3d dataset_wrappers equivalents)."""
    from shasta_tpu.data.loader import ConcatDataset, RepeatDataset

    a = [{"v": i} for i in range(3)]
    b = [{"v": 10 + i} for i in range(2)]
    c = ConcatDataset([a, b])
    assert len(c) == 5
    assert [c[i]["v"] for i in range(5)] == [0, 1, 2, 10, 11]
    assert c[-1]["v"] == 11
    r = RepeatDataset(a, times=3)
    assert len(r) == 9
    assert [r[i]["v"] for i in range(9)] == [0, 1, 2] * 3
    # registry-built
    from shasta_tpu.registry_setup import register_all

    regs = register_all()
    assert "ConcatDataset" in regs["datasets"] and "RepeatDataset" in regs["datasets"]
