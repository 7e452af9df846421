import numpy as np
import jax.numpy as jnp

from shasta_tpu.registry_setup import register_all
from shasta_tpu.train.trainer import (
    CheckpointHook,
    IterTimerHook,
    JsonlLoggerHook,
    TextLoggerHook,
    Trainer,
)
from shasta_tpu.utils.registry import build_from_cfg


def test_registry_builds_models():
    regs = register_all()
    m = build_from_cfg(
        dict(type="ShastaModel", max_obj=6, grid_shape=[41, 48, 48],
             cap_conv2=512, cap_conv3=256, cap_conv4=128, cap_extra=128),
        regs["models"],
    )
    assert m.cfg.max_obj == 6
    t = build_from_cfg(dict(type="PubTracker", max_age=3), regs["trackers"])
    assert t.max_age == 3


def test_trainer_hooks(tmp_path):
    calls = []

    class Spy:
        priority = 10

        def __getattr__(self, name):
            if name.startswith(("before_", "after_")):
                return lambda t: calls.append(name)
            raise AttributeError(name)

    def step(state, batch):
        return state + 1, {"loss": jnp.float32(batch)}

    def data():
        return iter([1.0, 2.0])

    tr = Trainer(step_fn=step, state=0, data_fn=data, work_dir=str(tmp_path),
                 max_epochs=2)
    tr.register_hook(IterTimerHook())
    tr.register_hook(TextLoggerHook(interval=1))
    tr.register_hook(JsonlLoggerHook())
    tr.register_hook(Spy())
    state = tr.run()
    assert state == 4  # 2 epochs x 2 iters
    assert calls.count("before_epoch") == 2
    assert calls.count("after_iter") == 4
    log = (tmp_path / "train_log.jsonl").read_text().strip().splitlines()
    assert len(log) == 4


def test_checkpoint_hook(tmp_path):
    import jax

    class FakeState:
        params = {"w": np.ones((2, 2))}
        batch_stats = {}

    def step(state, batch):
        return state, {"loss": 0.0}

    tr = Trainer(step_fn=step, state=FakeState(), data_fn=lambda: iter([0]),
                 work_dir=str(tmp_path), max_epochs=1)
    tr.register_hook(CheckpointHook(interval=1))
    tr.run()
    assert (tmp_path / "epoch_1").exists()


def test_nan_guard_hook(tmp_path):
    """NanGuardHook saves a rescue checkpoint and raises on NaN loss."""
    import pytest

    from flax import struct
    from shasta_tpu.train.trainer import NanGuardHook

    class S(struct.PyTreeNode):
        params: dict
        batch_stats: dict

    state = S(params={"w": jnp.ones((2,))}, batch_stats={})
    losses = iter([1.0, float("nan")])

    def step(state, batch):
        return state, {"loss": next(losses)}

    t = Trainer(
        step_fn=step, state=state, data_fn=lambda: [{}, {}, {}],
        work_dir=str(tmp_path), max_epochs=1,
    )
    t.register_hook(NanGuardHook())
    with pytest.raises(FloatingPointError, match="non-finite"):
        t.run()
    import os

    assert os.path.isdir(os.path.join(tmp_path, "rescue_nan"))


def test_epoch_seed_hook_reshuffles(tmp_path):
    """EpochSeedHook gives every epoch a fresh shuffle order (the
    DistSamplerSeedHook behavior; without it epochs replay identically)."""
    from shasta_tpu.data.loader import DataLoader
    from shasta_tpu.data.nuscenes import ARRAY_KEYS  # noqa: F401
    from shasta_tpu.train.trainer import EpochSeedHook

    ds = [{"det_boxes": np.full((2, 11), i, np.float32)} for i in range(16)]
    loader = DataLoader(ds, batch_size=4, num_workers=1, seed=0, prefetch=1)

    def order_for(epoch):
        loader.epoch = epoch
        out = []
        for b in loader:
            out.extend(b["det_boxes"][:, 0, 0].astype(int).tolist())
        return out

    assert order_for(0) != order_for(1)
    assert order_for(1) == order_for(1)  # deterministic per epoch

    class DummyT:
        epoch = 3

    EpochSeedHook(loader).before_epoch(DummyT())
    assert loader.epoch == 3
