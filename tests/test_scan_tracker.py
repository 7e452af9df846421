"""Parity: on-device scan tracker vs the host PubTrackerMerged."""
import numpy as np
import jax.numpy as jnp

from shasta_tpu.tracker.pub_tracker import (
    NUSCENES_TRACKING_NAMES,
    NUSCENE_CLS_VELOCITY_ERROR,
    TRK_REF,
    PubTrackerMerged,
)
from shasta_tpu.tracker.scan_tracker import FrameDets, TrackerParams, track_scene


def _params(max_age=4):
    names = NUSCENES_TRACKING_NAMES
    return TrackerParams(
        gates=jnp.array([NUSCENE_CLS_VELOCITY_ERROR[n] for n in names]),
        alpha=jnp.array([TRK_REF[n]["alpha"] for n in names]),
        beta=jnp.array([TRK_REF[n]["beta"] for n in names]),
        refine=jnp.array([TRK_REF[n]["ref"] for n in names]),
        max_age=max_age,
        merged_mode=True,
    )


def _random_scene(rng, F=8, max_real=6, n_slots=10):
    """Random dets per frame in class-major order + matching host dicts."""
    frames_np = []
    frames_dicts = []
    for f in range(F):
        n = int(rng.integers(1, max_real + 1))
        cls = np.sort(rng.integers(0, 7, size=n))
        ct = rng.uniform(-20, 20, (n, 2))
        # make some dets continuations of previous frame dets
        if f > 0 and frames_np[-1]["n"] > 0:
            prev = frames_np[-1]
            for i in range(min(n, prev["n"])):
                if rng.random() < 0.7:
                    cls[i] = prev["cls"][i]
                    ct[i] = prev["ct"][i] + rng.normal(0, 0.2, 2)
            order = np.argsort(cls, kind="stable")
            cls, ct = cls[order], ct[order]
        vel = rng.normal(0, 0.5, (n, 2))
        score = rng.uniform(0.2, 1.0, n)
        refsc = rng.uniform(0.0, 1.0, n)
        newborn = rng.random(n) < 0.3
        dead = rng.random(n) < 0.1
        frames_np.append(dict(n=n, cls=cls, ct=ct, vel=vel, score=score,
                              refsc=refsc, newborn=newborn, dead=dead))
        dicts = []
        for i in range(n):
            d = {
                "translation": [float(ct[i, 0]), float(ct[i, 1]), 0.0],
                "size": [2.0, 4.0, 1.5],
                "rotation": [1, 0, 0, 0],
                "velocity": [float(vel[i, 0]), float(vel[i, 1])],
                "detection_name": NUSCENES_TRACKING_NAMES[cls[i]],
                "detection_score": float(score[i]),
                "ref_detection_score": float(refsc[i]),
                "attribute_name": None,
            }
            if newborn[i]:
                d["newborn"] = True
            if dead[i]:
                d["dead"] = True
            dicts.append(d)
        frames_dicts.append(dicts)
    return frames_np, frames_dicts


def _stack_frames(frames_np, N):
    F = len(frames_np)
    out = FrameDets(
        ct=jnp.zeros((F, N, 2)),
        velocity=jnp.zeros((F, N, 2)),
        cls=jnp.full((F, N), -1, jnp.int32),
        score=jnp.zeros((F, N)),
        ref_score=jnp.zeros((F, N)),
        newborn=jnp.zeros((F, N), bool),
        dead=jnp.zeros((F, N), bool),
        valid=jnp.zeros((F, N), bool),
    )
    arrs = {k: np.array(v) for k, v in out._asdict().items()}
    for f, fr in enumerate(frames_np):
        n = fr["n"]
        arrs["ct"][f, :n] = fr["ct"]
        arrs["velocity"][f, :n] = fr["vel"]
        arrs["cls"][f, :n] = fr["cls"]
        arrs["score"][f, :n] = fr["score"]
        arrs["ref_score"][f, :n] = fr["refsc"]
        arrs["newborn"][f, :n] = fr["newborn"]
        arrs["dead"][f, :n] = fr["dead"]
        arrs["valid"][f, :n] = True
    return FrameDets(**{k: jnp.asarray(v) for k, v in arrs.items()})


def _host_ids(frames_dicts, max_age=4, lag=0.5):
    """Run PubTrackerMerged; dead flags are applied to the track AFTER the
    frame (scan applies them via the det's own dead field identically)."""
    t = PubTrackerMerged(max_age=max_age)
    per_frame = []
    for dicts in frames_dicts:
        out = t.step_centertrack(dicts, lag)
        by_key = {}
        for tr in out:
            if tr["active"]:
                key = (tr["detection_name"], round(tr["translation"][0], 4),
                       round(tr["translation"][1], 4))
                by_key[key] = (tr["tracking_id"], tr["ref_detection_score"])
        ids = []
        for d in dicts:
            key = (d["detection_name"], round(d["translation"][0], 4),
                   round(d["translation"][1], 4))
            ids.append(by_key.get(key, (0, 0.0)))
        per_frame.append(ids)
    return per_frame


def test_scan_tracker_matches_host(rng):
    N = 8
    for trial in range(5):
        frames_np, frames_dicts = _random_scene(rng, F=8, max_real=6)
        frames = _stack_frames(frames_np, N)
        lags = jnp.full((len(frames_np),), 0.5)
        tids, used, refs = track_scene(frames, lags, _params())
        tids, used, refs = map(np.asarray, (tids, used, refs))
        host = _host_ids(frames_dicts)
        for f, fr in enumerate(frames_np):
            for i in range(fr["n"]):
                h_id, h_ref = host[f][i]
                g_id = tids[f, i] if used[f, i] else 0
                assert g_id == h_id, (trial, f, i, g_id, h_id)
                if used[f, i]:
                    np.testing.assert_allclose(refs[f, i], h_ref, atol=1e-6,
                                               err_msg=str((trial, f, i)))


def test_scan_tracker_track_continuity():
    # two targets over 5 frames keep their ids
    F, N = 5, 4
    ct = np.zeros((F, N, 2))
    for f in range(F):
        ct[f, 0] = [f * 1.0, 0.0]
        ct[f, 1] = [0.0, 10.0 + f * 0.5]
    frames = FrameDets(
        ct=jnp.asarray(ct),
        velocity=jnp.zeros((F, N, 2)).at[:, 0, 0].set(2.0).at[:, 1, 1].set(1.0),
        cls=jnp.full((F, N), -1, jnp.int32).at[:, :2].set(2),  # car
        score=jnp.zeros((F, N)).at[:, :2].set(0.9),
        ref_score=jnp.zeros((F, N)).at[:, :2].set(0.9),
        newborn=jnp.zeros((F, N), bool),
        dead=jnp.zeros((F, N), bool),
        valid=jnp.zeros((F, N), bool).at[:, :2].set(True),
    )
    tids, used, _ = track_scene(frames, jnp.full((F,), 0.5), _params())
    tids = np.asarray(tids)
    assert np.all(tids[:, 0] == tids[0, 0])
    assert np.all(tids[:, 1] == tids[0, 1])
    assert tids[0, 0] != tids[0, 1]
