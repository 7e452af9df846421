"""Unmatched-track handling: default / motion-model / bbox redundancy.

Behavioral reference: mot_3d/redundancy/redundancy.py:9-129. A track with no
high-score association can be rescued by a low-score detection overlapping
its predicted box (update mode 3) or kept as pure prediction (mode 0).
"""
from __future__ import annotations

import numpy as np

from ..core import geometry
from .bbox import MotBBox


class RedundancyModule:
    def __init__(self, configs: dict):
        self.configs = configs
        self.mode = configs["redundancy"]["mode"]
        self.asso = configs["running"]["asso"]
        self.det_score = configs["redundancy"]["det_score_threshold"][self.asso]
        self.det_threshold = configs["redundancy"]["det_dist_threshold"][self.asso]
        self.motion_model_type = configs["running"]["motion_model"]

    @property
    def back_step(self):
        return self.motion_model_type == "velo"

    def infer(self, trk, dets, velos=None, time_lag=None):
        """dets: (N, 8) mot arrays. Returns (result_bbox, update_mode, aux)."""
        if self.mode == "bbox":
            return self.bbox_redundancy(trk, dets)
        if self.mode == "mm":
            return self.motion_model_redundancy(trk, dets, velos, time_lag)
        return self.default_redundancy(trk, dets)

    def default_redundancy(self, trk, dets):
        return trk.get_state(), 0, None

    def motion_model_redundancy(self, trk, dets, velos, time_lag):
        pred_bbox = trk.get_state()
        cand_idx = [i for i, d in enumerate(dets) if d[7] > self.det_score]
        cand = [np.asarray(dets[i], np.float64) for i in cand_idx]
        if self.back_step and velos is not None:
            stepped = []
            for k, i in enumerate(cand_idx):
                d = cand[k].copy()
                d[0] -= velos[i][0] * time_lag
                d[1] -= velos[i][1] * time_lag
                stepped.append(d)
            cand = stepped

        dists = []
        if cand:
            import jax.numpy as jnp

            cg = MotBBox.to_geometry_rows(np.stack(cand))
            pg = MotBBox.to_geometry_rows(pred_bbox[None])
            if self.asso == "iou":
                dists = np.asarray(geometry.iou_3d(jnp.asarray(cg), jnp.asarray(pg)))[:, 0].tolist()
            elif self.asso == "giou":
                dists = np.asarray(geometry.giou_3d(jnp.asarray(cg), jnp.asarray(pg)))[:, 0].tolist()
            else:
                for d in cand:
                    diff = d[:7] - pred_bbox[:7]
                    diff[3] = (diff[3] + np.pi) % (2 * np.pi) - np.pi
                    if self.asso == "m_dis":
                        inv = np.linalg.inv(trk.compute_innovation_matrix())
                        dists.append(float(np.sqrt(diff @ inv @ diff)))
                    else:
                        dists.append(float(np.sqrt(np.sum(diff * diff))))

        if self.asso in ("iou", "giou"):
            rescued = len(dists) > 0 and np.max(dists) >= self.det_threshold
        else:
            rescued = len(dists) > 0 and np.min(dists) <= self.det_threshold
        return pred_bbox, (3 if rescued else 0), {"velo": np.zeros(2)}

    def bbox_redundancy(self, trk, dets):
        cand = [np.asarray(d, np.float64) for d in dets if d[7] > self.det_score]
        pred_bbox = trk.get_state()
        if not cand:
            return pred_bbox, 0, None
        import jax.numpy as jnp

        cg = MotBBox.to_geometry_rows(np.stack(cand))
        pg = MotBBox.to_geometry_rows(pred_bbox[None])
        ious = np.asarray(geometry.iou_3d(jnp.asarray(cg), jnp.asarray(pg)))[:, 0]
        if ious.max() < self.det_threshold:
            return pred_bbox, 0, None
        best = int(ious.argmax())
        return cand[best], (1 if ious[best] > 0.7 else 3), None
