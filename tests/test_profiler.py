"""Observability utils (SURVEY §5: absent in the reference, first-class here)."""
import os

import numpy as np
import jax
import jax.numpy as jnp

from shasta_tpu.utils.profiler import StageTimer, annotate, cost_analysis, trace


def test_stage_timer_accumulates():
    t = StageTimer()
    for _ in range(3):
        with t.stage("work"):
            sum(range(1000))
    with t.stage("other", block_on=jnp.ones((4,))):
        pass
    s = t.summary()
    assert s["work"]["count"] == 3 and s["work"]["total_s"] >= 0
    assert s["other"]["count"] == 1
    assert s["work"]["mean_ms"] >= 0


def test_cost_analysis_reports_flops():
    def f(a, b):
        return a @ b

    x = jnp.ones((64, 64))
    c = cost_analysis(f, x, x)
    assert c.get("flops", 0) >= 2 * 64**3 * 0.9  # ~2mnk


def test_trace_writes_profile(tmp_path):
    d = str(tmp_path / "prof")
    with trace(d):
        with annotate("tiny"):
            jnp.ones((8,)).block_until_ready()
    # a plugins/profile/<ts>/ tree appears
    found = []
    for root, dirs, files in os.walk(d):
        found.extend(files)
    assert found, "no profiler artifacts written"


def test_velo2world():
    from shasta_tpu.core.transforms import quat_to_rotmat, velo2world
    from shasta_tpu.core.boxes import yaw_to_quaternion

    yaw = 0.5
    ego = np.eye(4)
    ego[:3, :3] = quat_to_rotmat(yaw_to_quaternion(yaw))
    v = velo2world(ego, np.array([1.0, 0.0]))
    np.testing.assert_allclose(v, [np.cos(yaw), np.sin(yaw)], atol=1e-12)
