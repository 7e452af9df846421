"""Scene renderer (nusc_visualize equivalent): geometry units + end-to-end
rendering over the micro synthetic dataroot."""
import json

import numpy as np
import pytest

from fixtures_nusc import (
    CAM_INTRINSIC,
    CAM_TRANS,
    CAM_WH,
    build_micro_nusc,
)
from shasta_tpu.core.boxes import yaw_to_quaternion
from shasta_tpu.preprocessing.nusc_db import NuscDB
from shasta_tpu.viz.scene_renderer import (
    SceneRenderer,
    box_corners_3d,
    load_tracks,
    render_scene,
)


def test_box_corners_devkit_convention():
    """size [w, l, h]: l along box-x, w along box-y; yaw rotates about z."""
    c = box_corners_3d([0, 0, 0], [2.0, 4.0, 1.0], yaw_to_quaternion(0.0))
    assert c.shape == (8, 3)
    np.testing.assert_allclose(np.abs(c[:, 0]).max(), 2.0, atol=1e-9)  # l/2
    np.testing.assert_allclose(np.abs(c[:, 1]).max(), 1.0, atol=1e-9)  # w/2
    np.testing.assert_allclose(np.abs(c[:, 2]).max(), 0.5, atol=1e-9)  # h/2
    # 90 deg yaw swaps the extents
    c90 = box_corners_3d([5, 5, 0], [2.0, 4.0, 1.0], yaw_to_quaternion(np.pi / 2))
    np.testing.assert_allclose(np.abs(c90[:, 0] - 5).max(), 1.0, atol=1e-7)
    np.testing.assert_allclose(np.abs(c90[:, 1] - 5).max(), 2.0, atol=1e-7)


def test_camera_projection_geometry():
    """A box 10 m ahead of the fixture camera projects around the principal
    point, displaced down by the known analytic amount."""
    center = np.array([10.0, 0.0, 0.5])
    corners = box_corners_3d(center, [2.0, 4.0, 1.5], yaw_to_quaternion(0.0))
    # replicate the renderer's global->cam math independently:
    # ego == global in the fixture; camera axes x=-y_e, y=-z_e, z=+x_e
    rel = corners - np.asarray(CAM_TRANS)
    cam = np.stack([-rel[:, 1], -rel[:, 2], rel[:, 0]], axis=1)
    K = np.asarray(CAM_INTRINSIC)
    uv = cam @ K.T
    uv = uv[:, :2] / uv[:, 2:3]
    cx, cy = K[0, 2], K[1, 2]
    assert np.all(uv[:, 0] > cx - 200) and np.all(uv[:, 0] < cx + 200)
    # center depth 8.5, height offset of box center = 1.5-0.5 = 1.0 below cam
    v_center = cy + 400.0 * 1.0 / 8.5
    assert abs(uv[:, 1].mean() - v_center) < 25


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("viz")
    fx = build_micro_nusc(tmp)
    db = NuscDB(str(fx["root"]), "v1.0-mini")
    # tracking result straight from the fixture detections
    results = json.load(open(fx["results"]))["results"]
    tr = {
        tok: [
            {
                "sample_token": tok,
                "translation": d["translation"],
                "size": d["size"],
                "rotation": d["rotation"],
                "velocity": d["velocity"],
                "tracking_id": str(k + 1),
                "tracking_name": d["detection_name"],
                "tracking_score": d["detection_score"],
            }
            for k, d in enumerate(dets)
        ]
        for tok, dets in results.items()
    }
    tr_path = tmp / "tracking_result.json"
    json.dump({"results": tr, "meta": {}}, open(tr_path, "w"))
    return dict(db=db, tr_path=str(tr_path), tmp=tmp, fx=fx)


def test_render_lidar_bev_with_map(setup):
    db = setup["db"]
    tracks = load_tracks(setup["tr_path"])["samp0"]
    out = str(setup["tmp"] / "bev.png")
    r = SceneRenderer(db)
    path = r.render_lidar_bev("samp0", tracks, out, nsweeps=10, underlay_map=True)
    import os

    assert os.path.exists(path) and os.path.getsize(path) > 10_000


def test_render_camera_projects_boxes(setup):
    db = setup["db"]
    tracks = load_tracks(setup["tr_path"])["samp0"]
    out = str(setup["tmp"] / "cam.png")
    r = SceneRenderer(db)
    path = r.render_camera("samp0", tracks, out, channel="CAM_FRONT")
    import os

    assert path is not None and os.path.getsize(path) > 5_000
    # missing channel -> None, no file
    assert r.render_camera("samp0", tracks, str(setup["tmp"] / "x.png"),
                           channel="CAM_BACK") is None


def test_render_scene_cli_layout(setup):
    import os

    save = str(setup["tmp"] / "render")
    written = render_scene(
        setup["db"], "scene-0001", setup["tr_path"], save,
        render_class="car", channels=("LIDAR_TOP", "CAM_FRONT"), nsweeps=2,
    )
    # 3 key frames x 2 channels
    assert len(written) == 6
    lidar = [w for w in written if "/lidar/" in w]
    cam = [w for w in written if "front-camera" in w]
    assert len(lidar) == 3 and len(cam) == 3
    for w in written:
        assert os.path.exists(w)


def test_visualize_scene_tool(setup):
    """Drive the CLI end-to-end (mirrors visualize.py's interface)."""
    import subprocess
    import sys
    import os

    save = str(setup["tmp"] / "cli_out")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cmd = [
        sys.executable, os.path.join(repo, "tools", "visualize_scene.py"),
        "--dataroot", str(setup["fx"]["root"]), "--version", "v1.0-mini",
        "--scene_name", "scene-0001", "--render_class", "car",
        "--track_result_path", setup["tr_path"], "--save_path", save,
        "--nsweeps", "2",
    ]
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    res = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=300)
    assert res.returncode == 0, res.stderr
    assert "wrote 6 frames" in res.stdout
