"""ShaSTA affinity network — one fused XLA forward over the (B, T, D) block.

Behavioral reference: det3d/models/tracker/shasta.py:42-327. Given per-frame
detections (prev frame = "tracks", curr frame = detections) and their 320-d
BEV shape descriptors, produces the augmented affinity matrices:

- ``matched1``: row-softmax over curr dets + [dead, FN] anchor columns,
  for rows = prev dets only (shasta.py:324).
- ``matched2``: column-softmax over prev dets + [newborn, FP] anchor rows,
  for columns = curr dets only (shasta.py:325).

TPU-first design notes (differences from the reference implementation, not
from its math):
- The first linear layer of each pairwise MLP acts on concat(prev, curr);
  since Linear(concat(a, b)) == W_a a + W_b b + bias, we evaluate the
  per-entity halves once (O(T+D) rows) and broadcast-add, instead of
  materializing the (T*D, 2F) input (O(T*D) rows). This cuts the dominant
  matmul FLOPs ~90x for max_obj=90 with bit-identical math up to fp
  reassociation.
- Everything is batched; no per-sample Python loops. The module is shape-
  polymorphic only in B; T = D = max_obj + 2 are static.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


class MLP(nn.Module):
    """Dense stack with ReLU between layers (none after the last)."""

    features: Sequence[int]
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            x = nn.Dense(f, dtype=self.dtype, name=f"layers_{i}")(x)
            if i + 1 < len(self.features):
                x = nn.relu(x)
        return x


class PairwiseMLP(nn.Module):
    """MLP over concat(prev, curr) pairs with the split-first-layer trick.

    Parameters are stored as one (2*in_dim, h0) kernel so that checkpoints
    map 1:1 onto the reference's fused layer; the apply path slices it into
    the prev/curr halves.
    """

    in_dim: int  # per-side input feature size
    hidden: Sequence[int]  # sizes after the first layer (first entry = h0)
    out_dim: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, prev, curr):
        # prev: (B, T, F), curr: (B, D, F) -> (B, T, D, out_dim)
        h0 = self.hidden[0]
        kernel = self.param(
            "layers_0_kernel",
            nn.initializers.lecun_normal(),
            (2 * self.in_dim, h0),
        )
        bias = self.param("layers_0_bias", nn.initializers.zeros, (h0,))
        kp, kc = kernel[: self.in_dim], kernel[self.in_dim :]
        dt = self.dtype or prev.dtype
        hp = jnp.einsum("btf,fh->bth", prev.astype(dt), kp.astype(dt))
        hc = jnp.einsum("bdf,fh->bdh", curr.astype(dt), kc.astype(dt))
        x = hp[:, :, None, :] + hc[:, None, :, :] + bias.astype(dt)
        x = nn.relu(x)
        for i, f in enumerate(list(self.hidden[1:]) + [self.out_dim]):
            x = nn.Dense(f, dtype=self.dtype, name=f"layers_{i + 1}")(x)
            if i + 2 < len(self.hidden) + 1:
                x = nn.relu(x)
        return x


class AffinityNet(nn.Module):
    """The augmented-affinity head (shasta.py:49-109 parameterization)."""

    max_obj: int = 90
    num_feats: int = 3  # features used in hand/bbox residuals (config: 3)
    num_point: int = 5
    share_conv_channel: int = 64
    dtype: jnp.dtype | None = None  # None = f32; jnp.bfloat16 for MXU speed

    @property
    def shape_dim(self) -> int:  # 320 for defaults
        return self.num_point * self.share_conv_channel

    def setup(self):
        F = self.shape_dim
        # 4 anchor MLPs over flattened shape descriptors: newborn, fp (from
        # curr features), dead, fn (from prev features). shasta.py:49-57.
        in_shape = self.max_obj * F
        self.aug_shape = [
            MLP([in_shape // 64, F], dtype=self.dtype, name=f"aug_shape_{i}")
            for i in range(4)
        ]
        # 4 anchor MLPs over flattened bbox rows (7 feats). shasta.py:69-76.
        in_det = self.max_obj * 7
        self.aug_dets = [
            MLP([in_det // 32, 7], dtype=self.dtype, name=f"aug_dets_{i}")
            for i in range(4)
        ]
        # Pairwise residual heads. shasta.py:59-92.
        self.fuse_shape = PairwiseMLP(
            in_dim=F, hidden=[F // 8, F // 16, F // 32], out_dim=1,
            dtype=self.dtype, name="fuse_shape",
        )
        self.fuse_det = PairwiseMLP(
            in_dim=self.num_feats, hidden=[32, 8], out_dim=1,
            dtype=self.dtype, name="fuse_det",
        )
        self.res_coeff = PairwiseMLP(
            in_dim=F + self.num_feats,
            hidden=[32 + F // 8, 8 + F // 32],
            out_dim=3,
            dtype=self.dtype,
            name="res_coeff",
        )
        # Row-wise affinity MLP over the D axis. shasta.py:94-106.
        n = self.max_obj + 2
        self.aff = MLP([128, 64, 32, 64, 128, n], dtype=self.dtype, name="aff")

    def __call__(
        self,
        prev_boxes7: jnp.ndarray,  # (B, N, 7) [x,y,z,w,l,h,yaw]
        curr_boxes7: jnp.ndarray,  # (B, N, 7)
        curr_vel: jnp.ndarray,  # (B, N, 2) [vx, vy]
        curr_dt: jnp.ndarray,  # (B, N, 1) frame time delta (sec)
        prev_feat: jnp.ndarray,  # (B, N, 320) prev-frame shape descriptors
        curr_feat: jnp.ndarray,  # (B, N, 320)
        n_real=None,  # optional scalar: emulate a max_obj=n_real head
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """n_real (with zero-scattered params — shasta_tpu/multiclass.
        pad_affinity_params) makes a max_obj=N head reproduce a
        max_obj=n_real head EXACTLY for the real rows/cols: entity slots
        [n_real, N) are excluded from the column-normalized residual_dist
        sum and carry -1e9 logits (zero softmax mass), while the anchor
        slots stay at [N, N+2). This is what lets the 7 per-class heads
        (different max_obj per config) run as ONE vmapped head in the
        fused multi-class program."""
        B, N, F = prev_feat.shape
        assert N == self.max_obj, (N, self.max_obj)

        # --- shape anchors (abs-ed), shasta.py:241-247 ---
        curr_flat = curr_feat.reshape(B, -1)
        prev_flat = prev_feat.reshape(B, -1)
        newborn_geom = jnp.abs(self.aug_shape[0](curr_flat))[:, None, :]
        fp_geom = jnp.abs(self.aug_shape[1](curr_flat))[:, None, :]
        dead_geom = jnp.abs(self.aug_shape[2](prev_flat))[:, None, :]
        fn_geom = jnp.abs(self.aug_shape[3](prev_flat))[:, None, :]

        # curr gets [dead, fn] appended (D axis); prev gets [newborn, fp]
        # (T axis). shasta.py:246-247.
        feat_d = jnp.concatenate([curr_feat, dead_geom, fn_geom], axis=1)
        feat_t = jnp.concatenate([prev_feat, newborn_geom, fp_geom], axis=1)

        # --- bbox anchors (dims abs-ed), shasta.py:260-267; computed from the
        # NON-backprojected curr boxes, exactly as the reference does ---
        def _abs_dims(b):
            return jnp.concatenate([b[..., :3], jnp.abs(b[..., 3:6]), b[..., 6:]], -1)

        curr_box_flat = curr_boxes7.reshape(B, -1)
        prev_box_flat = prev_boxes7.reshape(B, -1)
        newborn_box = _abs_dims(self.aug_dets[0](curr_box_flat)[:, None, :])
        fp_box = _abs_dims(self.aug_dets[1](curr_box_flat)[:, None, :])
        dead_box = _abs_dims(self.aug_dets[2](prev_box_flat)[:, None, :])
        fn_box = _abs_dims(self.aug_dets[3](prev_box_flat)[:, None, :])

        # --- velocity back-projection of curr centers, shasta.py:269-270 ---
        curr_bp = jnp.concatenate(
            [curr_boxes7[..., :2] - curr_vel * curr_dt, curr_boxes7[..., 2:]], axis=-1
        )

        # --- augmented box rows, shasta.py:273-274 ---
        boxes_t = jnp.concatenate([prev_boxes7, newborn_box, fp_box], axis=1)  # (B,T,7)
        boxes_d = jnp.concatenate([curr_bp, dead_box, fn_box], axis=1)  # (B,D,7)

        # --- hand-designed residuals, shasta.py:276-283 ---
        eps = 1e-10
        nf = self.num_feats
        diff = boxes_t[:, :, None, :nf] - boxes_d[:, None, :, :nf]
        residual_dist = jnp.sum(diff * diff, axis=-1)  # (B, T, D)
        if n_real is not None:
            # rows [n_real, N) do not exist in the emulated head: they
            # must not contribute to the per-column normalization below
            row_real = jnp.concatenate(
                [jnp.arange(N) < n_real, jnp.ones((2,), bool)])
            residual_dist = residual_dist * row_real[None, :, None]
        # torch F.normalize(x, p=2, dim=1): per-(b, d) column L2 normalization.
        norm = jnp.sqrt(jnp.sum(residual_dist**2, axis=1, keepdims=True))
        residual_dist = residual_dist / jnp.maximum(norm, 1e-12)
        residual_dim = jnp.sum(
            jnp.abs(
                jnp.log(boxes_t[:, :, None, 3:6] + eps)
                - jnp.log(boxes_d[:, None, :, 3:6] + eps)
            ),
            axis=-1,
        )
        dc = jnp.cos(boxes_t[:, :, None, 6]) - jnp.cos(boxes_d[:, None, :, 6])
        ds = jnp.sin(boxes_t[:, :, None, 6]) - jnp.sin(boxes_d[:, None, :, 6])
        # safe sqrt: identical forward; zero subgradient at exactly-equal
        # yaws (padded rows) instead of the NaN d/dx sqrt(0) would produce
        rot_sq = dc * dc + ds * ds
        residual_rot = jnp.where(
            rot_sq > 0, jnp.sqrt(jnp.where(rot_sq > 0, rot_sq, 1.0)), 0.0
        )
        residual_hand = residual_dist + residual_dim + residual_rot

        # --- learned residuals (pairwise MLPs, split first layer) ---
        residual_shape = self.fuse_shape(feat_t, feat_d)[..., 0]  # (B,T,D)
        residual_fused = self.fuse_det(boxes_t[..., :nf], boxes_d[..., :nf])[..., 0]
        coeff = self.res_coeff(
            jnp.concatenate([feat_t, boxes_t[..., :nf]], -1),
            jnp.concatenate([feat_d, boxes_d[..., :nf]], -1),
        )  # (B, T, D, 3)
        alpha, beta, omega = coeff[..., 0], coeff[..., 1], coeff[..., 2]

        residual = alpha * residual_fused + beta * residual_hand + omega * residual_shape

        # --- affinity head + dual softmax, shasta.py:322-326 ---
        matched = self.aff(residual)  # row-wise MLP over D axis, (B, T, D)
        matched = matched.astype(jnp.float32)
        if n_real is not None:
            # padded entity rows/cols get zero softmax mass (exp(-1e9)
            # underflows to exactly 0 in f32) — anchors stay live
            pad_ent = jnp.concatenate(
                [jnp.arange(N) >= n_real, jnp.zeros((2,), bool)])
            matched = jnp.where(pad_ent[None, :, None], -1e9, matched)
            matched = jnp.where(pad_ent[None, None, :], -1e9, matched)
        matched1 = nn.softmax(matched[:, :-2, :], axis=2)
        matched2 = nn.softmax(matched[:, :, :-2], axis=1)
        return matched1, matched2
