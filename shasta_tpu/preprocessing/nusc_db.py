"""Minimal nuScenes raw-table reader (replaces the nuscenes-devkit).

The reference preprocessing imports `nuscenes.NuScenes` for table access
(token_info.py, ego_pose.py, gt_info.py, ...). The devkit is a heavy
dependency; everything those scripts need is plain JSON-table joins, so we
read the v1.0-* tables directly:

  scene.json, sample.json, sample_data.json, ego_pose.json,
  calibrated_sensor.json, sample_annotation.json, instance.json,
  category.json, attribute.json

API shape mirrors the devkit's `get(table, token)` so the CLIs read like
their reference counterparts behaviorally while being dependency-free.
"""
from __future__ import annotations

import json
import os
from functools import cached_property


TABLES = (
    "scene",
    "sample",
    "sample_data",
    "ego_pose",
    "calibrated_sensor",
    "sample_annotation",
    "instance",
    "category",
    "attribute",
)


class NuscDB:
    def __init__(self, dataroot: str, version: str = "v1.0-trainval"):
        self.dataroot = dataroot
        self.version = version
        self._tables: dict[str, list[dict]] = {}
        self._index: dict[str, dict[str, dict]] = {}

    def table(self, name: str) -> list[dict]:
        if name not in self._tables:
            path = os.path.join(self.dataroot, self.version, name + ".json")
            with open(path) as f:
                self._tables[name] = json.load(f)
        return self._tables[name]

    def get(self, name: str, token: str) -> dict:
        if name not in self._index:
            self._index[name] = {r["token"]: r for r in self.table(name)}
        return self._index[name][token]

    @cached_property
    def scene(self):
        return self.table("scene")

    @cached_property
    def sample(self):
        return self.table("sample")

    def scene_samples(self, scene_record: dict) -> list[dict]:
        """Ordered samples of a scene via the prev/next chain."""
        out = []
        token = scene_record["first_sample_token"]
        while token:
            s = self.get("sample", token)
            out.append(s)
            token = s["next"]
        return out

    def sample_lidar_data(self, sample: dict) -> dict:
        """The LIDAR_TOP sample_data record for a (key-frame) sample."""
        if "data" in sample and "LIDAR_TOP" in sample.get("data", {}):
            return self.get("sample_data", sample["data"]["LIDAR_TOP"])
        # raw tables have no 'data' map; search sample_data by sample_token
        for sd in self.table("sample_data"):
            if (
                sd["sample_token"] == sample["token"]
                and sd["is_key_frame"]
                and "LIDAR_TOP" in sd.get("filename", "")
            ):
                return sd
        raise KeyError(f"no LIDAR_TOP sample_data for {sample['token']}")

    def annotations_for_sample(self, sample_token: str) -> list[dict]:
        return [
            a
            for a in self.table("sample_annotation")
            if a["sample_token"] == sample_token
        ]

    def category_name(self, instance_token: str) -> str:
        inst = self.get("instance", instance_token)
        return self.get("category", inst["category_token"])["name"]
