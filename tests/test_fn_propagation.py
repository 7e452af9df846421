"""Golden parity: fast pipelines vs host path on a scene with FN events.

The reference propagates missed boxes forward (eval.py:141-148): a prev det
whose matched1 argmax is the FN column becomes a synthetic detection in the
current frame (translation += prev_dt * velocity, ref = 1 - P(dead)) and is
tracked like any other det. The host parity path (tracker/runner.py) has
always done this; these tests pin the on-device pipelines
(ScenePipeline / BatchedScenePipeline / MultiClassScenePipeline) to the
same annos on a scene containing FN, dead, FP-elimination and newborn
events — driven by a crafted affinity model shared by both paths.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from shasta_tpu.infer import (
    BatchedScenePipeline,
    MultiClassScenePipeline,
    ScenePipeline,
    default_tracker_params,
    track_scene_dataset,
)
from shasta_tpu.models import ShastaModel, ShastaConfig
from shasta_tpu.tracker.pub_tracker import NUSCENES_TRACKING_NAMES
from shasta_tpu.tracker.runner import run_affinity_eval, track

N = 6  # max_obj for the crafted scene
CAR = NUSCENES_TRACKING_NAMES.index("car")


def crafted_affinity(prev_boxes, curr_boxes):
    """Deterministic affinity from box geometry (batched (B, N, 11) inputs).

    Rules: a prev det with a curr det within 1 m matches it (0.9 mass);
    otherwise score >= 0.35 -> FN column, else -> dead column. A curr det
    with a prev det within 1 m matches; otherwise score >= 0.3 -> newborn
    row, else -> FP row. Residual mass is uniform, so every decision value
    is 0.9 (> both thresholds) and every refined score is 1 - base.
    """

    def one(pb, cb):
        n = pb.shape[0]
        base = 0.1 / (n + 1)
        pv, cv = pb[:, 10] > 0, cb[:, 10] > 0
        d = jnp.linalg.norm(pb[:, None, :2] - cb[None, :, :2], axis=-1)
        d_row = jnp.where(cv[None, :], d, jnp.inf)
        jmin, dmin = jnp.argmin(d_row, axis=1), jnp.min(d_row, axis=1)
        row_choice = jnp.where(
            (dmin < 1.0)[:, None],
            jax.nn.one_hot(jmin, n + 2),
            jnp.where(
                (pb[:, 10] >= 0.35)[:, None],
                jax.nn.one_hot(jnp.full((n,), n + 1), n + 2),  # FN col
                jax.nn.one_hot(jnp.full((n,), n), n + 2),  # dead col
            ),
        )
        m1 = base + 0.9 * row_choice

        d_col = jnp.where(pv[:, None], d, jnp.inf)
        imin, dmin2 = jnp.argmin(d_col, axis=0), jnp.min(d_col, axis=0)
        col_choice = jnp.where(
            (dmin2 < 1.0)[None, :],
            jax.nn.one_hot(imin, n + 2).T,
            jnp.where(
                (cb[:, 10] >= 0.3)[None, :],
                jax.nn.one_hot(jnp.full((n,), n), n + 2).T,  # newborn row
                jax.nn.one_hot(jnp.full((n,), n + 1), n + 2).T,  # FP row
            ),
        )
        m2 = base + 0.9 * col_choice
        return m1, m2

    return jax.vmap(one)(prev_boxes, curr_boxes)


class CraftedModel:
    """Duck-typed ShastaModel whose affinity is crafted_affinity and whose
    trunk features are zeros (the pipelines only thread them through)."""

    def __init__(self, cfg):
        self.cfg = cfg

    def apply(self, variables, *args, train=False, method=None, **kw):
        c = self.cfg
        name = getattr(method, "__name__", None)
        if name == "frame_features":
            B = args[0]["det_boxes"].shape[0]
            return jnp.zeros((B, c.max_obj, c.num_point * c.share_conv_channel))
        if name == "bev_single":
            B = args[0]["voxels"].shape[0] if "voxels" in args[0] else 1
            return jnp.zeros((B, 16, 16, c.share_conv_channel))
        if name == "affinity_step":
            prev_boxes, curr_boxes = args[0], args[1]
            return crafted_affinity(prev_boxes, curr_boxes)
        raise NotImplementedError(name)


def _row(x, y, vx=0.0, vy=0.0, dt=0.5, score=0.9):
    return [x, y, 0.0, 2.0, 4.0, 1.5, 0.0, vx, vy, dt, score]


def _cls_det(row):
    return {
        "translation": [row[0], row[1], row[2]],
        "size": [row[3], row[4], row[5]],
        "rotation": [1.0, 0.0, 0.0, 0.0],
        "velocity": [row[7], row[8]],
        "detection_name": "car",
        "detection_score": row[10],
        "attribute_name": "vehicle.moving",
    }


def _sample(token, prev_token, rows, prev_rows):
    det = np.zeros((N, 11), np.float32)
    for i, r in enumerate(rows):
        det[i] = r
    prev = np.zeros((N, 11), np.float32)
    for i, r in enumerate(prev_rows):
        prev[i] = r
    return {
        "token": token,
        "prev_token": prev_token,
        "det_boxes": det,
        "prev_det_boxes": prev,
        "cls_det_boxes": [_cls_det(r) for r in rows],
        "prev_cls_det_boxes": [_cls_det(r) for r in prev_rows],
        # minimal voxel arrays so collate/jit have fixed shapes to thread
        "voxels": np.zeros((8, 2, 5), np.float32),
        "coordinates": np.zeros((8, 3), np.int32),
        "num_points": np.zeros((8,), np.int32),
        "voxels_valid": np.zeros((8,), bool),
    }


@pytest.fixture(scope="module")
def scene():
    """3-frame car scene: A vanishes in f2 (-> FN propagation keeps its
    track alive), C is newborn, D is FP-eliminated then flagged dead."""
    f1 = [_row(0.0, 0.0, vx=2.0), _row(10.0, 0.0)]
    f2 = [_row(10.1, 0.0), _row(30.0, 0.0, score=0.5), _row(40.0, 0.0, score=0.2)]
    f3 = [_row(2.0, 0.0, vx=2.0), _row(10.2, 0.0)]
    return [
        _sample("t1", "", f1, []),
        _sample("t2", "t1", f2, f1),
        _sample("t3", "t2", f3, f2),
    ]


def _host_result(scene):
    def forward(batch):
        m1, m2 = crafted_affinity(
            jnp.asarray(batch["prev_det_boxes"]), jnp.asarray(batch["det_boxes"])
        )
        return np.asarray(m1), np.asarray(m2)

    preds = run_affinity_eval(forward, scene)
    frames = [
        {"token": s["token"], "timestamp": 1.0 + 0.5 * i, "first": s["prev_token"] == ""}
        for i, s in enumerate(scene)
    ]
    result, _ = track(preds["results"], frames, max_age=4, merged=True)
    return result


def _canon(annos):
    out = []
    for a in sorted(annos, key=lambda a: int(a["tracking_id"])):
        out.append((
            int(a["tracking_id"]),
            a["tracking_name"],
            tuple(np.round(a["translation"], 6)),
            round(float(a["tracking_score"]), 6),
        ))
    return out


def test_scene_pipeline_matches_host_with_fn(scene):
    host = _host_result(scene)

    cfg = ShastaConfig(max_obj=N)
    pipe = ScenePipeline(
        model=CraftedModel(cfg), variables={}, cls_id=CAR,
        params=default_tracker_params(max_age=4),
    )
    fast = track_scene_dataset(pipe, scene)

    assert set(fast["results"]) == set(host["results"])
    for token in host["results"]:
        assert _canon(fast["results"][token]) == _canon(host["results"][token]), token

    # the scene really exercises FN propagation: A's track survives f2 via
    # an FN anno at its propagated position and keeps its id in f3
    ids = {
        tok: {tuple(np.round(a["translation"][:2], 1)): int(a["tracking_id"])
              for a in host["results"][tok]}
        for tok in ("t1", "t2", "t3")
    }
    a_id = ids["t1"][(0.0, 0.0)]
    assert ids["t2"][(1.0, 0.0)] == a_id  # FN-propagated box, same track
    assert ids["t3"][(2.0, 0.0)] == a_id  # reappearing det, same track
    # D (40, 0) was FP-eliminated: never in any frame's annos
    assert (40.0, 0.0) not in ids["t2"]


def test_batched_pipeline_matches_host_with_fn(scene):
    host = _host_result(scene)
    cfg = ShastaConfig(max_obj=N)
    pipe = BatchedScenePipeline(
        model=CraftedModel(cfg), variables={}, cls_id=CAR,
        params=default_tracker_params(max_age=4), batch=1,
    )
    from shasta_tpu.data.nuscenes import collate

    keys = ("voxels", "num_points", "coordinates", "voxels_valid", "det_boxes")
    for i, s in enumerate(scene):
        batch = collate([s])
        frame = {k: batch[k] for k in keys}
        out = pipe.step_frames(
            frame, [len(s["cls_det_boxes"])], [s["prev_token"] == ""], [0.5]
        )
        # lane 0 must reproduce the host annos (ids offset by 0 for lane 0)
        want = {int(a["tracking_id"]): tuple(np.round(a["translation"][:2], 4))
                for a in host["results"][s["token"]]}
        got = {}
        n_curr = len(s["cls_det_boxes"])
        for k in range(n_curr):
            if out.used[0][k]:
                got[int(out.tid[0][k])] = tuple(
                    np.round(s["cls_det_boxes"][k]["translation"][:2], 4)
                )
        prev = s["prev_cls_det_boxes"]
        if prev:
            fn_lag = float(s["prev_det_boxes"][0, 9])
            for n in range(len(prev)):
                if out.fn[0][n] and out.used[0][N + n]:
                    tr = np.asarray(prev[n]["translation"][:2]) + fn_lag * np.asarray(
                        prev[n]["velocity"]
                    )
                    got[int(out.tid[0][N + n])] = tuple(np.round(tr, 4))
        assert got == want, s["token"]


def test_multiclass_two_classes_match_merged_host(scene):
    """Two-class shared-tracker parity vs the official_val.sh host flow:
    per-class run_affinity_eval -> merge -> PubTrackerMerged, including FN
    propagation, global id counter, and the zero-det class-drop quirk."""
    bus_rows = {
        # bus appears in f1/f2 and vanishes in f3 -> FN propagation
        "t1": [[-20.0, 0.0, 0.0, 2.5, 10.0, 3.0, 0.0, 1.0, 0.0, 0.5, 0.9]],
        "t2": [[-19.5, 0.0, 0.0, 2.5, 10.0, 3.0, 0.0, 1.0, 0.0, 0.5, 0.9]],
        "t3": [],
    }

    def _bus_cls(row):
        d = _cls_det(row)
        d["detection_name"] = "bus"
        return d

    bus_scene = []
    toks = [(s["token"], s["prev_token"]) for s in scene]
    for i, (tok, prev) in enumerate(toks):
        rows = bus_rows[tok]
        prev_rows = bus_rows[prev] if prev else []
        s = _sample(tok, prev, rows, prev_rows)
        s["cls_det_boxes"] = [_bus_cls(r) for r in rows]
        s["prev_cls_det_boxes"] = [_bus_cls(r) for r in prev_rows]
        bus_scene.append(s)

    # ---- host path: per-class affinity eval, merged annos, merged tracker
    def forward(batch):
        m1, m2 = crafted_affinity(
            jnp.asarray(batch["prev_det_boxes"]), jnp.asarray(batch["det_boxes"])
        )
        return np.asarray(m1), np.asarray(m2)

    car_annos = run_affinity_eval(forward, scene)["results"]
    bus_annos = run_affinity_eval(forward, bus_scene)["results"]
    merged = {tok: car_annos[tok] + bus_annos[tok] for tok in car_annos}
    frames = [
        {"token": s["token"], "timestamp": 1.0 + 0.5 * i, "first": s["prev_token"] == ""}
        for i, s in enumerate(scene)
    ]
    host, _ = track(merged, frames, max_age=4, merged=True)

    # ---- fast path: shared tracker table across both class heads
    cfg = ShastaConfig(max_obj=N)
    pipe = MultiClassScenePipeline(
        class_heads={"car": (CraftedModel(cfg), {}),
                     "bus": (CraftedModel(cfg), {})},
        trunk_key="car",
        params=default_tracker_params(max_age=4),
    )
    from shasta_tpu.data.nuscenes import collate

    frame_keys = ("voxels", "num_points", "coordinates", "voxels_valid")
    for s, sb in zip(scene, bus_scene):
        if s["prev_token"] == "":
            pipe.reset()
        batch = collate([s])
        bbatch = collate([sb])
        out = pipe.step_frame(
            {k: batch[k] for k in frame_keys},
            {"car": (batch["det_boxes"], len(s["cls_det_boxes"])),
             "bus": (bbatch["det_boxes"], len(sb["cls_det_boxes"]))},
            0.5,
        )
        got = {}
        for name, src in (("car", s), ("bus", sb)):
            o = out[name]
            for k in range(len(src["cls_det_boxes"])):
                if o.used[k]:
                    ct = tuple(np.round(src["cls_det_boxes"][k]["translation"][:2], 4))
                    got[(name,) + ct] = (int(o.tid[k]),
                                         round(float(o.ref[k]), 6))
            prev = src["prev_cls_det_boxes"]
            if prev:
                fn_lag = float(src["prev_det_boxes"][0, 9])
                for n in range(len(prev)):
                    if o.fn[n] and o.used[N + n]:
                        tr = np.asarray(prev[n]["translation"][:2]) + fn_lag * np.asarray(
                            prev[n]["velocity"])
                        got[(name,) + tuple(np.round(tr, 4))] = (
                            int(o.tid[N + n]), round(float(o.ref[N + n]), 6))
        want = {
            (a["tracking_name"],) + tuple(np.round(a["translation"][:2], 4)):
                (int(a["tracking_id"]), round(float(a["tracking_score"]), 6))
            for a in host["results"][s["token"]]
        }
        assert got == want, (s["token"], got, want)


def test_multiclass_pipeline_matches_host_with_fn(scene):
    host = _host_result(scene)
    cfg = ShastaConfig(max_obj=N)
    pipe = MultiClassScenePipeline(
        class_heads={"car": (CraftedModel(cfg), {})},
        trunk_key="car",
        params=default_tracker_params(max_age=4),
    )
    # CraftedModel duck-types bev_single (zeros map) and affinity_step
    # (geometry-only), so the fused program runs it end to end: zero BEV
    # -> zero sampled feats, crafted affinities -> real decision rules.
    frame_keys = ("voxels", "num_points", "coordinates", "voxels_valid")
    from shasta_tpu.data.nuscenes import collate

    for s in scene:
        if s["prev_token"] == "":
            pipe.reset()
        batch = collate([s])
        frame = {k: batch[k] for k in frame_keys}
        out = pipe.step_frame(
            frame, {"car": (batch["det_boxes"], len(s["cls_det_boxes"]))}, 0.5
        )["car"]
        want = {int(a["tracking_id"]): tuple(np.round(a["translation"][:2], 4))
                for a in host["results"][s["token"]]}
        got = {}
        for k in range(len(s["cls_det_boxes"])):
            if out.used[k]:
                got[int(out.tid[k])] = tuple(
                    np.round(s["cls_det_boxes"][k]["translation"][:2], 4)
                )
        prev = s["prev_cls_det_boxes"]
        if prev:
            fn_lag = float(s["prev_det_boxes"][0, 9])
            for n in range(len(prev)):
                if out.fn[n] and out.used[N + n]:
                    tr = np.asarray(prev[n]["translation"][:2]) + fn_lag * np.asarray(
                        prev[n]["velocity"]
                    )
                    got[int(out.tid[N + n])] = tuple(np.round(tr, 4))
        assert got == want, s["token"]
