"""CLI smoke tests: the official_val.sh flow (eval -> merge -> pub_test)
and the create_data infos builder, all on the micro synthetic dataroot."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from fixtures_nusc import build_micro_nusc
from shasta_tpu.preprocessing.nuscenes_chain import run_chain

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# full CLI chains over a synthetic dataroot (~4 min)
pytestmark = pytest.mark.slow

CFG_TEMPLATE = """
import os, sys
sys.path.insert(0, r"{repo}/configs/nusc")
from _base import *  # noqa

det_type = ["car"]
max_objects = 6
model = dict(model, max_obj=6, grid_shape=(41, 80, 80),
             pc_start=(-3.0, -3.0),
             cap_conv2=2000, cap_conv3=1000, cap_conv4=500, cap_extra=500)
point_pipeline = dict(point_pipeline,
    voxel_size=(0.075, 0.075, 0.05),
    pc_range=(-3.0, -3.0, -1.0, 3.0, 3.0, 1.0),
    max_voxels=4000, nsweeps=1)
data = dict(data, val=dict(
    info_path=r"{infos}",
    det_path=r"{split}/detections/cp/sensor_individual_frames",
    cls_info_path=r"{split}/detections/cp/cls_individual_frames",
    frame_info_path=r"{out}/val_frame_info.json",
    test_mode=True,
), train=dict(
    info_path=r"{infos}",
    det_path=r"{split}/detections/cp/sensor_individual_frames",
    cls_info_path=r"{split}/detections/cp/cls_individual_frames",
    frame_info_path=r"{out}/val_frame_info.json",
    labels_path=r"{split}/gt_shasta/cp/individual_frames",
))
"""


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("tools")
    fx = build_micro_nusc(tmp)
    out = tmp / "prep"
    run_chain(
        dataroot=str(fx["root"]), version="v1.0-mini",
        results_json=str(fx["results"]), out_dir=str(out),
        split="val", scene_names=None,
    )
    cfg_path = tmp / "micro_car.py"
    cfg_path.write_text(
        CFG_TEMPLATE.format(
            repo=REPO, infos=fx["infos"], split=out / "val_2hz", out=out
        )
    )
    return dict(fx=fx, out=out, cfg=cfg_path, tmp=tmp)


def _run(args, timeout=600, env_extra=None):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    if env_extra:
        env.update(env_extra)
    r = subprocess.run(
        [sys.executable] + args, cwd=REPO, env=env,
        capture_output=True, text=True, timeout=timeout,
    )
    assert r.returncode == 0, r.stdout[-3000:] + "\n" + r.stderr[-3000:]
    return r


def test_eval_merge_pubtest_flow(tree):
    tmp = tree["tmp"]
    work = tmp / "eval_car"
    # train 1 synthetic step to produce a checkpoint the eval can load
    _run([
        "tools/train.py", "--config", str(tree["cfg"]), "--smoke", "--cpu",
        "--epochs", "1", "--smoke_steps", "1", "--work_dir", str(tmp / "train"),
    ])
    ckpt = tmp / "train" / "epoch_1"
    assert ckpt.exists()

    _run([
        "tools/eval.py", "--config", str(tree["cfg"]), "--cpu",
        "--checkpoint", str(ckpt), "--work_dir", str(work), "--split", "val",
    ])
    cp = json.load(open(work / "cp_val.json"))
    assert len(cp["results"]) == 3
    for token, annos in cp["results"].items():
        for a in annos:
            assert "ref_detection_score" in a

    merged = tmp / "merged.json"
    _run([
        "tools/merge_results.py", "--inputs", str(work / "cp_val.json"),
        "--output", str(merged),
    ])

    pub = tmp / "pub"
    r = _run([
        "tools/pub_test.py", "--predictions", str(merged),
        "--frame_info", str(tree["out"] / "val_frame_info.json"),
        "--work_dir", str(pub), "--skip_eval",
    ])
    assert "tracking speed" in r.stdout
    result = json.load(open(pub / "tracking_result.json"))
    assert len(result["results"]) == 3
    # tracking ids persist across the 3 frames for the two real cars
    ids_per_frame = [
        sorted(a["tracking_id"] for a in annos)
        for _, annos in sorted(result["results"].items())
    ]
    assert all(len(ids) >= 2 for ids in ids_per_frame)


def test_track_scene_cli(tree):
    tmp = tree["tmp"]
    ckpt = tmp / "train" / "epoch_1"
    if not ckpt.exists():
        _run([
            "tools/train.py", "--config", str(tree["cfg"]), "--smoke", "--cpu",
            "--epochs", "1", "--smoke_steps", "1", "--work_dir", str(tmp / "train"),
        ])
    out = tmp / "scene_track" / "tracking_result.json"
    png = tmp / "scene_track" / "tracks.png"
    _run([
        "tools/track_scene.py", "--config", str(tree["cfg"]), "--cpu",
        "--checkpoint", str(ckpt), "--split", "val",
        "--out", str(out), "--render", str(png),
    ])
    result = json.load(open(out))
    assert len(result["results"]) == 3
    assert png.stat().st_size > 1000


def test_cached_feature_training_flow(tree):
    """cache_features -> train --cached_features over the micro dataroot:
    the frozen-trunk training accelerator end-to-end."""
    tmp = tree["tmp"]
    cache = tmp / "feat_cache"
    _run([
        "tools/cache_features.py", "--config", str(tree["cfg"]), "--cpu",
        "--split", "train", "--out", str(cache), "--batch", "2",
    ])
    files = sorted(os.listdir(cache))
    assert files == ["samp0.npz", "samp1.npz", "samp2.npz"]
    feat = np.load(cache / files[0])["feat"]
    assert feat.shape == (6, 5 * 64)

    # cached training: batch of 1 sample/device, 1 epoch over 3 frames
    cfg2 = tmp / "micro_car_cached.py"
    cfg2.write_text(
        open(tree["cfg"]).read()
        + "\ndata = dict(data, samples_per_device=1, workers=2)\n"
    )
    work = tmp / "train_cached"
    # single device so the 3-frame micro split yields whole batches
    _run([
        "tools/train.py", "--config", str(cfg2), "--cpu", "--epochs", "1",
        "--work_dir", str(work), "--cached_features", str(cache),
    ], env_extra={"XLA_FLAGS": ""})
    assert (work / "epoch_1").exists()
    log = [json.loads(l) for l in open(work / "train_log.jsonl")]
    assert len(log) >= 1 and all(np.isfinite(e["loss"]) for e in log)

    # multi-config mode: ONE shared trunk pass per frame, per-class subdirs
    cfg_bus = tmp / "micro_bus_cache.py"
    cfg_bus.write_text(
        open(tree["cfg"]).read().replace('det_type = ["car"]', 'det_type = ["bus"]')
    )
    multi_out = tmp / "feat_cache_multi"
    _run([
        "tools/cache_features.py", "--config", f"{tree['cfg']},{cfg_bus}",
        "--cpu", "--split", "train", "--out", str(multi_out), "--batch", "2",
    ])
    for stem in ("micro_car", "micro_bus_cache"):
        files = sorted(os.listdir(multi_out / stem))
        assert files == ["samp0.npz", "samp1.npz", "samp2.npz"], (stem, files)
    # the car descriptors must equal the single-config run's (same trunk,
    # same frames, same sampling)
    a = np.load(cache / "samp1.npz")["feat"]
    b = np.load(multi_out / "micro_car" / "samp1.npz")["feat"]
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_track_multiclass(tree):
    """Shared-trunk multi-class serving over the micro dataroot: two class
    heads (random init — the tool supports checkpoint=None), one trunk
    pass/frame, merged on-device tracker, FN-aware anno assembly."""
    tmp = tree["tmp"]
    # second class config: same micro geometry, smaller max_obj, no dets of
    # that class in the fixture -> exercises the zero-det class-drop quirk
    bus_cfg = tmp / "micro_bus.py"
    bus_cfg.write_text(
        open(tree["cfg"]).read().replace('det_type = ["car"]', 'det_type = ["bus"]')
    )
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from track_multiclass import run_multiclass

    out = tmp / "multiclass" / "tracking_result.json"
    result = run_multiclass(
        {"car": (str(tree["cfg"]), None), "bus": (str(bus_cfg), None)},
        str(out), trunk_key="car",
    )
    assert len(result["results"]) == 3
    for token, annos in result["results"].items():
        for a in annos:
            assert a["tracking_name"] in ("car", "bus")
            assert int(a["tracking_id"]) >= 1
    assert json.load(open(out))["results"].keys() == result["results"].keys()


def test_validate_cli_with_lite_amota(tree):
    tmp = tree["tmp"]
    ckpt = tmp / "train" / "epoch_1"
    if not ckpt.exists():
        _run([
            "tools/train.py", "--config", str(tree["cfg"]), "--smoke", "--cpu",
            "--epochs", "1", "--smoke_steps", "1", "--work_dir", str(tmp / "train"),
        ])
    work = tmp / "validate"
    r = _run([
        "tools/validate.py", "--config", str(tree["cfg"]), "--cpu",
        "--checkpoint", str(ckpt), "--work_dir", str(work), "--skip_eval",
        "--gt_info_dir", str(tree["out"] / "val_2hz" / "gt_info" / "individual_frames"),
    ])
    assert "AMOTA-lite" in r.stdout
    assert (work / "tracking_result.json").exists()


def test_check_artifacts_cli(tree):
    r = _run([
        "tools/check_artifacts.py", "--data", str(tree["out"]), "--split", "val",
    ])
    assert "0 problem(s)" in r.stdout


def test_estimate_stats_cli(tree):
    out = tree["tmp"] / "stats"
    _run([
        "tools/estimate_stats.py", "--data", str(tree["out"] / "val_2hz"),
        "--out", str(out), "--name", "test",
    ])
    P = json.load(open(out / "P_test.json"))
    assert "car" in P and len(P["car"]) == 11


def test_run_oracle_mot_cli(tree):
    out = tree["tmp"] / "oracle.json"
    r = _run([
        "tools/run_oracle_mot.py", "--data", str(tree["out"] / "val_2hz"),
        "--oracle", "dets", "--asso", "euler", "--out", str(out),
    ])
    summary = json.load(open(out))
    # oracle-dets on near-perfect synthetic detections tracks well
    assert summary["mota"] > 0.5, summary
    assert summary["idsw"] == 0


def test_create_data_infos(tree):
    out = tree["tmp"] / "infos_test.pkl"
    _run([
        "tools/create_data.py", "--dataroot", str(tree["fx"]["root"]),
        "--version", "v1.0-mini", "--out", str(out), "--nsweeps", "2",
    ])
    import pickle

    infos = pickle.load(open(out, "rb"))
    assert len(infos) == 3
    assert all("lidar_path" in i and "sweeps" in i for i in infos)
    assert infos[0]["gt_boxes"].shape[1] == 7
