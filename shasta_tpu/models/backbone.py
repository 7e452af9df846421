"""Sparse 3D ResNet backbone (SpMiddleResNetFHD equivalent) for TPU.

Behavioral reference: det3d/models/backbones/scn.py:99-211. Stage layout:
  conv_input: SubM 5->16 (k3)          grid [42, 1440, 1440] (z+1 pad row)
  conv1: 2x SparseBasicBlock(16)        indice_key res0
  conv2: SparseConv s2 16->32 + 2 blocks  -> [21, 720, 720]
  conv3: SparseConv s2 32->64 + 2 blocks  -> [11, 360, 360]
  conv4: SparseConv s2 p(0,1,1) 64->128 + 2 blocks -> [5, 180, 180]
  extra: SparseConv k(3,1,1) s(2,1,1) 128->128     -> [2, 180, 180]
  dense + reshape (B, H, W, D*C=256)    (scn.py:196-201, NHWC here)

All convs run as gather+matmul over fixed-capacity voxel sets
(shasta_tpu.ops.sparse); neighbor indices are built once per position set
and shared across the convs of a stage, mirroring spconv's indice_key reuse.
Voxel capacities per stage are static compile-time caps.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops import sparse as sp


class SparseBN(nn.Module):
    """BatchNorm1d over valid voxel rows, flax-style collections.

    Matches torch BN1d(eps=1e-3, momentum=0.01) (scn.py:67). When train=True
    uses masked batch stats (psum-synced over `axis_name` if set — the TPU
    SyncBN) and updates running stats; otherwise applies running stats.
    """

    momentum: float = 0.99
    epsilon: float = 1e-3
    axis_name: str | None = None

    @nn.compact
    def __call__(self, feats, valid, train: bool = False):
        C = feats.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((C,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((C,)))
        if train:
            mean, var = sp.masked_batch_stats(feats, valid, self.axis_name)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        return sp.masked_batch_norm(feats, valid, scale, bias, mean, var, self.epsilon)


class SubMConv(nn.Module):
    """Submanifold conv; weight (K, C_in, C_out) with (dz, dy, dx) tap order."""

    features: int
    kernel: Sequence[int] = (3, 3, 3)
    use_bias: bool = True
    dtype: object = None
    use_pallas: bool = False

    @nn.compact
    def __call__(self, st: sp.SparseTensor, index: sp.NeighborIndex) -> sp.SparseTensor:
        K = int(self.kernel[0] * self.kernel[1] * self.kernel[2])
        C = st.feats.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (K, C, self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,)) if self.use_bias else None
        # backbone tensors are frame-major fixed-capacity: lane-split the
        # Pallas kernels per batch element so each lane's table fits VMEM
        return sp.subm_conv_apply(st, index, w, b, compute_dtype=self.dtype,
                                  use_pallas=self.use_pallas,
                                  lanes=st.batch_size if self.use_pallas else 1)


class SparseBasicBlock(nn.Module):
    """Residual block (scn.py:52-95): conv-bn-relu-conv-bn + id, relu."""

    planes: int
    bn_axis_name: str | None = None
    dtype: object = None
    use_pallas: bool = False

    @nn.compact
    def __call__(self, st, index, train: bool = False):
        identity = st.feats
        out = SubMConv(self.planes, dtype=self.dtype, use_pallas=self.use_pallas, name="conv1")(st, index)
        f = SparseBN(axis_name=self.bn_axis_name, name="bn1")(out.feats, out.valid, train)
        f = nn.relu(f)
        out = SubMConv(self.planes, dtype=self.dtype, use_pallas=self.use_pallas, name="conv2")(out._replace(feats=f), index)
        f = SparseBN(axis_name=self.bn_axis_name, name="bn2")(out.feats, out.valid, train)
        f = nn.relu(f + identity)
        f = jnp.where(out.valid[:, None], f, 0.0)
        return out._replace(feats=f)


class StridedConvBNReLU(nn.Module):
    features: int
    kernel: Sequence[int]
    stride: Sequence[int]
    padding: Sequence[int]
    max_out: int
    bn_axis_name: str | None = None
    dtype: object = None
    use_pallas: bool = False
    # Pallas (tile, window, nwin) — per-stage spans measured by
    # tools/measure_spans.py; see ops.sparse.strided_conv_apply.
    knobs: tuple = (256, 512, 2)
    # Fused-path (tile, window, nwin): the fused kernel's value-window
    # coverage needs are measured separately (tools/sweep_fused_knobs.py
    # — per-CLUSTER spans, much tighter than the positional windows the
    # legacy kernel needs). None falls back to `knobs`.
    fused_knobs: tuple | None = None

    @nn.compact
    def __call__(self, st, train: bool = False, table=None,
                 plan_keys=None, plan_pos=None, plan_bases=None):
        lanes = st.batch_size if self.use_pallas else 1
        # B=1 Pallas routes through the fused lookup-conv kernel
        # (no separate gather lookup — ops/pallas/window_conv.py)
        fused = self.use_pallas and st.batch_size == 1
        knobs = (self.fused_knobs or self.knobs) if fused else self.knobs
        if plan_pos is not None:
            # fully host-built plan (shasta_tpu/plans.py): output set from
            # keys, conv via the position-fed block kernel
            from ..ops.pallas.block_conv import PosIndex

            coords, valid, out_shape = sp.decode_strided_keys(
                plan_keys, st.shape, self.kernel, self.stride,
                self.padding, st.batch_size)
            plan = sp.StridedPlan(coords, valid,
                                  PosIndex(plan_pos, plan_bases), out_shape)
        elif plan_keys is not None:
            # host-built OUTPUT SET only (C_in >= 64 stages): skips the
            # device candidate sort; gather/fused-index stays on device
            plan = sp.strided_plan_from_keys(
                st, plan_keys, self.kernel, self.stride, self.padding,
                table=table, use_pallas=self.use_pallas, fused=fused,
                knobs=knobs,
            )
        else:
            plan = sp.build_strided_plan(
                st, self.kernel, self.stride, self.padding, self.max_out,
                table=table, use_pallas=self.use_pallas, lanes=lanes,
                fused=fused,
                knobs=knobs,
            )
        K = int(self.kernel[0] * self.kernel[1] * self.kernel[2])
        C = st.feats.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (K, C, self.features),
        )
        out = sp.strided_conv_apply(st, plan, w, None, compute_dtype=self.dtype,
                                    use_pallas=self.use_pallas,
                                    lanes=lanes,
                                    knobs=knobs)  # bias=False (scn.py:126)
        f = SparseBN(axis_name=self.bn_axis_name, name="bn")(out.feats, out.valid, train)
        return out._replace(feats=nn.relu(f))


class SparseBackbone(nn.Module):
    """SpMiddleResNetFHD on TPU. Returns dense NHWC BEV map (B, H, W, D*C)."""

    num_input_features: int = 5
    # Static voxel capacities after each strided stage (compile-time).
    cap_conv2: int = 60000
    cap_conv3: int = 30000
    cap_conv4: int = 15000
    cap_extra: int = 15000
    bn_axis_name: str | None = None
    dtype: object = None
    # Route every conv's gather+matmul through the VMEM-resident Pallas
    # kernel (inference only — no VJP; see ops/pallas/window_conv.py).
    use_pallas: bool = False
    # Input voxels are host-sorted by linear key per frame. Frame-major
    # packing stays GLOBALLY ascending because each frame's padded rows map
    # to that frame's filler key (encode_keys stride Z*Y*X+1), so this
    # works for any batch size; a runtime monotonicity guard falls back to
    # the argsort when the claim is false.
    assume_sorted: bool = False

    @nn.compact
    def __call__(self, st: sp.SparseTensor, train: bool = False,
                 plans: dict | None = None) -> jnp.ndarray:
        import jax

        bn = dict(bn_axis_name=self.bn_axis_name, dtype=self.dtype,
                  use_pallas=self.use_pallas)
        if plans is not None:
            assert st.batch_size == 1 and self.use_pallas, \
                "host plans serve the B=1 Pallas path"
            from ..ops.pallas.block_conv import PosIndex

        # conv_input + conv1 share position set "res0". One argsort builds
        # the stage's KeyTable; every later position set comes out of a
        # strided compaction ALREADY key-sorted, so the remaining stages
        # (and every strided input lookup) skip their sorts entirely.
        # With HOST PLANS (shasta_tpu/plans.py) the C_in <= 32 stages take
        # precomputed neighbor positions (position-fed block kernel) and
        # every strided output set arrives as keys — no sorts, lookups or
        # candidate dedup run on device at all for those stages.
        with jax.named_scope("bb_stage0"):
            if plans is not None:
                t0 = None
            elif self.assume_sorted:
                t0 = sp.key_table_checked(st)  # guarded: sorts only if needed
            else:
                t0 = sp.key_table(st)
            lanes = st.batch_size if self.use_pallas else 1
            # B=1 Pallas: fused lookup-conv — the index is query keys +
            # window bases, no lookup kernel runs (window_conv.py)
            fused = self.use_pallas and st.batch_size == 1
            idx0 = (PosIndex(plans["s0_pos"], plans["s0_bases"])
                    if plans is not None else
                    sp.build_subm_index_fused(st, t0) if fused else
                    sp.build_subm_index(st, table=t0,
                                        use_pallas=self.use_pallas,
                                        lanes=lanes))
            w = self.param(
                "conv_input_kernel",
                nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
                (27, self.num_input_features, 16),
            )
            x = sp.subm_conv_apply(st, idx0, w, None, compute_dtype=self.dtype,
                                   use_pallas=self.use_pallas,
                                   lanes=lanes)  # bias=False (scn.py:114)
            f = SparseBN(axis_name=self.bn_axis_name, name="conv_input_bn")(x.feats, x.valid, train)
            x = x._replace(feats=nn.relu(f))
            x = SparseBasicBlock(16, **bn, name="res0a")(x, idx0, train)
            x = SparseBasicBlock(16, **bn, name="res0b")(x, idx0, train)

        with jax.named_scope("bb_stage1"):
            x = StridedConvBNReLU(32, (3, 3, 3), (2, 2, 2), (1, 1, 1), self.cap_conv2, **bn, knobs=(256, 512, 2), fused_knobs=(256, 192, 2), name="down1")(
                x, train, table=t0,
                plan_keys=plans["d1_keys"] if plans else None,
                plan_pos=plans["d1_pos"] if plans else None,
                plan_bases=plans["d1_bases"] if plans else None)
            t1 = None if plans else sp.key_table_presorted(x)
            idx1 = (PosIndex(plans["d1s_pos"], plans["d1s_bases"])
                    if plans else
                    sp.build_subm_index_fused(x, t1) if fused else
                    sp.build_subm_index(x, table=t1,
                                        use_pallas=self.use_pallas,
                                        lanes=lanes))
            x = SparseBasicBlock(32, **bn, name="res1a")(x, idx1, train)
            x = SparseBasicBlock(32, **bn, name="res1b")(x, idx1, train)

        with jax.named_scope("bb_stage2"):
            x = StridedConvBNReLU(64, (3, 3, 3), (2, 2, 2), (1, 1, 1), self.cap_conv3, **bn, knobs=(256, 384, 1), fused_knobs=(256, 288, 1), name="down2")(
                x, train, table=t1,
                plan_keys=plans["d2_keys"] if plans else None,
                plan_pos=plans["d2_pos"] if plans else None,
                plan_bases=plans["d2_bases"] if plans else None)
            t2 = sp.key_table_presorted(x)
            idx2 = (sp.build_subm_index_fused(x, t2) if fused else
                      sp.build_subm_index(x, table=t2,
                                          use_pallas=self.use_pallas,
                                          lanes=lanes))
            x = SparseBasicBlock(64, **bn, name="res2a")(x, idx2, train)
            x = SparseBasicBlock(64, **bn, name="res2b")(x, idx2, train)

        with jax.named_scope("bb_stage3"):
            # conv4 (z unpadded: padding (0,1,1), scn.py:146)
            x = StridedConvBNReLU(128, (3, 3, 3), (2, 2, 2), (0, 1, 1), self.cap_conv4, **bn, knobs=(256, 512, 1), fused_knobs=(128, 320, 1), name="down3")(
                x, train, table=t2,
                plan_keys=plans["d3_keys"] if plans else None)
            t3 = sp.key_table_presorted(x)
            idx3 = (sp.build_subm_index_fused(x, t3) if fused else
                      sp.build_subm_index(x, table=t3,
                                          use_pallas=self.use_pallas,
                                          lanes=lanes))
            x = SparseBasicBlock(128, **bn, name="res3a")(x, idx3, train)
            x = SparseBasicBlock(128, **bn, name="res3b")(x, idx3, train)

        with jax.named_scope("bb_extra"):
            # extra_conv: (3,1,1) stride (2,1,1) pad 0 (scn.py:155-161)
            x = StridedConvBNReLU(128, (3, 1, 1), (2, 1, 1), (0, 0, 0), self.cap_extra, **bn, knobs=(256, 384, 1), fused_knobs=(128, 224, 1), name="extra")(
                x, train, table=t3,
                plan_keys=plans["ex_keys"] if plans else None)

        dense = sp.to_dense(x)  # (B, D, H, W, C)
        B, D, H, W, C = dense.shape
        # torch views (N, C, D, H, W) as (N, C*D, H, W): channel index c*D+d
        # (scn.py:200-201). NHWC equivalent: (B, H, W, C, D) then flatten.
        return jnp.transpose(dense, (0, 2, 3, 4, 1)).reshape(B, H, W, C * D)
