"""Full ShaSTA model: frozen BEV trunk + affinity head, one fused forward.

Behavioral reference: det3d/models/tracker/shasta.py:164-327 (extract_feat +
forward). TPU-first structural changes:

- prev and curr frames run through the trunk as ONE doubled batch (the
  reference runs two sequential backbone calls, scn.py invocations at
  shasta.py:197-203); halves kernel launches and doubles MXU batch.
- BEV bilinear sampling is a batched gather (no per-sample Python loop).
- The pairwise affinity block uses the split-first-layer einsum formulation
  (see shasta_tpu.models.affinity).

Inputs are fixed-shape: detections padded to max_obj rows of 11 features
[x,y,z,w,l,h,yaw,vx,vy,dt,score] (nuscenes.py:230-232), voxels padded to a
static capacity with a validity mask.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..core.bilinear import sample_bev_features
from ..core.boxes import box_points_5
from ..ops import sparse as sp
from .affinity import AffinityNet
from .backbone import SparseBackbone
from .rpn import RPN, SharedConv
from .vfe import voxel_mean_vfe


@dataclasses.dataclass(frozen=True)
class ShastaConfig:
    """Static model hyper-shape (configs/nusc/car.py:26-70)."""

    max_obj: int = 90
    num_feats: int = 3
    num_point: int = 5
    share_conv_channel: int = 64
    num_input_features: int = 5
    pc_start: tuple[float, float] = (-54.0, -54.0)
    voxel_size: tuple[float, float] = (0.075, 0.075)
    out_stride: int = 8
    # Sparse grid (Z, Y, X) incl. the +1 z pad row (scn.py:181).
    grid_shape: tuple[int, int, int] = (41, 1440, 1440)
    # Voxel capacity caps per strided stage (per doubled batch).
    cap_conv2: int = 60000
    cap_conv3: int = 30000
    cap_conv4: int = 15000
    cap_extra: int = 15000
    bn_axis_name: str | None = None
    dtype: Any = None  # jnp.bfloat16 for the trunk matmuls, None = f32


class ShastaModel(nn.Module):
    cfg: ShastaConfig = ShastaConfig()

    def setup(self):
        c = self.cfg
        self.backbone = SparseBackbone(
            num_input_features=c.num_input_features,
            cap_conv2=c.cap_conv2,
            cap_conv3=c.cap_conv3,
            cap_conv4=c.cap_conv4,
            cap_extra=c.cap_extra,
            bn_axis_name=c.bn_axis_name,
            name="backbone",
        )
        self.neck = RPN(dtype=c.dtype, name="neck")
        self.shared_conv = SharedConv(c.share_conv_channel, dtype=c.dtype, name="shared_conv")
        self.affinity = AffinityNet(
            max_obj=c.max_obj,
            num_feats=c.num_feats,
            num_point=c.num_point,
            share_conv_channel=c.share_conv_channel,
            name="affinity",
        )

    def bev_maps(self, batch: dict, train: bool = False) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Run VFE + backbone + neck + shared conv on curr & prev as one batch.

        batch keys (all fixed-shape): voxels (V,P,5), num_points (V,),
        coords (V,4) [b,z,y,x], voxels_valid (V,), and prev_* mirrors.
        Batch indices of prev coords are the sample index (0..B-1); they are
        shifted by B here to share the trunk forward.
        """
        B = batch["det_boxes"].shape[0]
        c = self.cfg
        feats = voxel_mean_vfe(batch["voxels"], batch["num_points"], c.num_input_features)
        pfeats = voxel_mean_vfe(batch["prev_voxels"], batch["prev_num_points"], c.num_input_features)
        coords = batch["coordinates"]
        pcoords = batch["prev_coordinates"].at[:, 0].add(B)
        st = sp.SparseTensor(
            feats=jnp.concatenate([feats, pfeats], axis=0),
            coords=jnp.concatenate([coords, pcoords], axis=0),
            valid=jnp.concatenate([batch["voxels_valid"], batch["prev_voxels_valid"]], axis=0),
            shape=c.grid_shape,
            batch_size=2 * B,
        )
        bev = self.backbone(st, train)  # (2B, H, W, 256)
        bev = self.neck(bev, train)  # (2B, H, W, 512)
        bev = self.shared_conv(bev, train)  # (2B, H, W, 64)
        return bev[:B], bev[B:]

    def __call__(self, batch: dict, train: bool = False):
        c = self.cfg
        prev_boxes = batch["prev_det_boxes"][:, :, :7]
        curr_boxes = batch["det_boxes"][:, :, :7]
        curr_vel = batch["det_boxes"][:, :, 7:9]
        curr_dt = batch["det_boxes"][:, :, 9:10]

        bev, prev_bev = self.bev_maps(batch, train)

        curr_pts = box_points_5(curr_boxes)  # (B, N, 5, 3)
        prev_pts = box_points_5(prev_boxes)
        curr_feat = sample_bev_features(
            bev, curr_pts, c.pc_start, c.voxel_size, c.out_stride
        )  # (B, N, 320)
        prev_feat = sample_bev_features(
            prev_bev, prev_pts, c.pc_start, c.voxel_size, c.out_stride
        )

        return self.affinity(
            prev_boxes, curr_boxes, curr_vel, curr_dt,
            prev_feat.astype(jnp.float32), curr_feat.astype(jnp.float32),
        )
