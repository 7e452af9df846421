"""20 Hz preprocessing mode: token selection, per-sweep ego, interpolated GT.

Behavioral reference: preprocessing/nuscenes_data/token_info.py:18-108
(20hz branch + set_selected_or_not), ego_pose.py (20hz = every sweep
frame), gt_info.py 20hz branch (devkit get_boxes interpolation)."""
import json
import os

import numpy as np
import pytest

from fixtures_nusc import build_micro_nusc
from shasta_tpu.core.transforms import quat_slerp
from shasta_tpu.preprocessing.nusc_db import NuscDB
from shasta_tpu.preprocessing.nuscenes_chain import (
    _select_20hz,
    write_ego_info,
    write_gt_info,
    write_token_info,
)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("hz20")
    fx = build_micro_nusc(tmp)
    db = NuscDB(str(fx["root"]), "v1.0-mini")
    out = str(tmp / "prep" / "val_20hz")
    return dict(db=db, out=out, tmp=tmp)


def test_select_20hz_counter_reset():
    # key frames always selected + reset; non-key selected at even offsets
    entries = [("a", True, "s0"), ("b", False, "s1"), ("c", False, "s1"),
               ("d", False, "s1"), ("e", True, "s1"), ("f", False, "s2")]
    sel = [row[3] for row in _select_20hz(entries)]
    assert sel == [True, False, True, False, True, False]


def test_token_info_20hz(setup):
    write_token_info(setup["db"], None, setup["out"], mode="20hz")
    rows = json.load(open(os.path.join(setup["out"], "token_info", "scene-0001.json")))
    # 3 key frames + 2x2 intermediates = 7 chain entries
    assert len(rows) == 7
    toks = [r[0] for r in rows]
    assert toks == ["sd0", "sd0m0", "sd0m1", "sd1", "sd1m0", "sd1m1", "sd2"]
    keys = [r[1] for r in rows]
    assert keys == [True, False, False, True, False, False, True]
    samps = [r[2] for r in rows]
    assert samps == ["samp0", "samp1", "samp1", "samp1", "samp2", "samp2", "samp2"]
    sel = [r[3] for r in rows]
    # counter resets at keys; first intermediate (counter 1) dropped,
    # second (counter 2) kept
    assert sel == [True, False, True, True, False, True, True]


def test_token_info_2hz_unchanged(setup):
    out2 = str(setup["tmp"] / "prep2" / "val_2hz")
    write_token_info(setup["db"], None, out2, mode="2hz")
    toks = json.load(open(os.path.join(out2, "token_info", "scene-0001.json")))
    assert toks == ["samp0", "samp1", "samp2"]


def test_ego_info_20hz(setup):
    write_ego_info(setup["db"], None, setup["out"], mode="20hz")
    ego = np.load(os.path.join(setup["out"], "ego_info", "scene-0001.npz"))
    assert len(ego.files) == 7  # one pose per sweep frame
    assert len(ego["0"]) == 7  # translation(3) + rotation(4)


def test_gt_info_20hz_interpolation(setup):
    write_gt_info(setup["db"], None, setup["out"], mode="20hz")
    d = np.load(os.path.join(setup["out"], "gt_info", "scene-0001.npz"),
                allow_pickle=True)
    ids, bboxes = d["ids"], d["bboxes"]
    assert len(ids) == 7
    # key frame 0: cars at x = 10, 20 (fixture geometry)
    key0 = {i: np.asarray(b, float) for i, b in zip(ids[0], bboxes[0])}
    assert abs(key0["inst_a"][0] - 10.0) < 1e-9
    # intermediate sd0m0 at ~t0 + 1/3 of the gap: x = 10 + ~2/3 (timestamps
    # are integer microseconds, so the fraction is truncated slightly)
    mid = {i: np.asarray(b, float) for i, b in zip(ids[1], bboxes[1])}
    np.testing.assert_allclose(mid["inst_a"][0], 10.0 + 2.0 / 3.0, atol=1e-4)
    np.testing.assert_allclose(mid["inst_b"][0], 20.0 + 2.0 / 3.0, atol=1e-4)
    # sizes interpolate trivially (constant in the fixture)
    np.testing.assert_allclose(mid["inst_a"][3:6], [2.0, 4.5, 1.6], atol=1e-9)
    # rotation slerp between identical quats is identity
    np.testing.assert_allclose(mid["inst_a"][6:10], key0["inst_a"][6:10], atol=1e-9)


def test_quat_slerp_properties():
    from shasta_tpu.core.boxes import yaw_to_quaternion

    q0 = yaw_to_quaternion(0.0)
    q1 = yaw_to_quaternion(1.0)
    np.testing.assert_allclose(quat_slerp(q0, q1, 0.0), q0, atol=1e-12)
    np.testing.assert_allclose(quat_slerp(q0, q1, 1.0), q1, atol=1e-12)
    # midpoint of a pure-yaw rotation is the half-yaw quaternion
    np.testing.assert_allclose(
        quat_slerp(q0, q1, 0.5), yaw_to_quaternion(0.5), atol=1e-9
    )
    # shortest arc: antipodal representation handled
    np.testing.assert_allclose(
        np.abs(quat_slerp(q0, -np.asarray(q1), 1.0)), np.abs(q1), atol=1e-9
    )


def test_run_chain_20hz_dir_layout(setup, tmp_path):
    from shasta_tpu.preprocessing.nuscenes_chain import run_chain

    fx_root = setup["db"].dataroot
    results = os.path.join(fx_root, "cp_results.json")
    out = str(tmp_path / "prep20")
    run_chain(dataroot=fx_root, version="v1.0-mini", results_json=results,
              out_dir=out, split="val", mode="20hz")
    base = os.path.join(out, "val_20hz")
    for sub in ("token_info", "ego_info", "gt_info", "detections"):
        assert os.path.isdir(os.path.join(base, sub)), sub
