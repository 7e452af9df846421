"""Offline preprocessing: produces the data/nusc_preprocessed artifact tree.

Mirrors the reference preprocessing chain (preprocessing.sh:1-27) with the
same on-disk formats, implemented without the nuscenes-devkit dependency
(raw nuScenes JSON tables are read directly via :mod:`nusc_db`).
"""
from . import associate, gt_shasta  # noqa: F401
