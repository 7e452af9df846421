"""Populate the component registries for config-driven construction.

The reference builds everything via registries + build_from_cfg
(det3d/utils/registry.py, det3d/models/builder.py build_simp_track). Here
construction is usually explicit; calling :func:`register_all` once makes
`build_from_cfg(dict(type="ShastaModel", ...), MODELS)` style configs work.
"""
from __future__ import annotations

from .utils.registry import DATASETS, MODELS, TRACKERS


def register_all():
    from .data.loader import ConcatDataset, RepeatDataset
    from .data.nuscenes import NuScenesTrackDataset
    from .models import ShastaModel, ShastaConfig
    from .models.bevmap import BEVMap
    from .mot.mot_model import MOTModel
    from .tracker.pub_tracker import PubTracker, PubTrackerMerged

    if "NuScenesTrackDataset" not in DATASETS:
        DATASETS.register_module(NuScenesTrackDataset)
        DATASETS.register_module(ConcatDataset)
        DATASETS.register_module(RepeatDataset)

    def _shasta_from_cfg(**kwargs):
        kwargs = {
            k: tuple(v) if isinstance(v, list) else v for k, v in kwargs.items()
        }
        return ShastaModel(ShastaConfig(**kwargs))

    def _bevmap_from_cfg(**kwargs):
        kwargs = {
            k: tuple(v) if isinstance(v, list) else v for k, v in kwargs.items()
        }
        return BEVMap(ShastaConfig(**kwargs))

    if "ShastaModel" not in MODELS:
        MODELS.register_module(_shasta_from_cfg, name="ShastaModel")
        MODELS.register_module(_bevmap_from_cfg, name="BEVMap")
    if "PubTracker" not in TRACKERS:
        TRACKERS.register_module(PubTracker)
        TRACKERS.register_module(PubTrackerMerged)
        TRACKERS.register_module(MOTModel)
    return {"datasets": DATASETS, "models": MODELS, "trackers": TRACKERS}
