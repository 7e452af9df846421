"""Float-tolerance parity of AffinityNet vs a torch oracle.

The oracle re-implements the reference affinity math (shasta.py:42-327)
directly in torch in this test file; its state_dict uses the reference's
module naming so it also exercises shasta_tpu.train.convert.
"""
import numpy as np
import jax.numpy as jnp
import torch
import torch.nn as nn

from shasta_tpu.models.affinity import AffinityNet
from shasta_tpu.train.convert import convert_affinity

MAX_OBJ = 6
NUM_FEATS = 3
F = 320  # num_point * share_conv_channel


class TorchOracle(nn.Module):
    """Reference-math oracle (independent re-derivation from shasta.py)."""

    def __init__(self, max_obj=MAX_OBJ, num_feats=NUM_FEATS):
        super().__init__()
        self.max_obj, self.num_feats = max_obj, num_feats
        asi = max_obj * F
        self.aug_shape = nn.ModuleList(
            nn.Sequential(nn.Linear(asi, asi // 64), nn.ReLU(), nn.Linear(asi // 64, F))
            for _ in range(4)
        )
        self.fuse_shape = nn.Sequential(
            nn.Linear(2 * F, F // 8), nn.ReLU(),
            nn.Linear(F // 8, F // 16), nn.ReLU(),
            nn.Linear(F // 16, F // 32), nn.ReLU(),
            nn.Linear(F // 32, 1),
        )
        adi = max_obj * 7
        self.aug_dets = nn.ModuleList(
            nn.Sequential(nn.Linear(adi, adi // 32), nn.ReLU(), nn.Linear(adi // 32, 7))
            for _ in range(4)
        )
        self.fuse_det = nn.Sequential(
            nn.Linear(2 * num_feats, 32), nn.ReLU(), nn.Linear(32, 8), nn.ReLU(), nn.Linear(8, 1)
        )
        self.res_coeff = nn.Sequential(
            nn.Linear(2 * (num_feats + F), 32 + F // 8), nn.ReLU(),
            nn.Linear(32 + F // 8, 8 + F // 32), nn.ReLU(),
            nn.Linear(8 + F // 32, 3),
        )
        n = max_obj + 2
        self.aff = nn.Sequential(
            nn.Linear(n, 128), nn.ReLU(), nn.Linear(128, 64), nn.ReLU(),
            nn.Linear(64, 32), nn.ReLU(), nn.Linear(32, 64), nn.ReLU(),
            nn.Linear(64, 128), nn.ReLU(), nn.Linear(128, n),
        )

    def forward(self, prev_boxes, curr_boxes, vel, dt, prev_feat, curr_feat):
        B = prev_feat.shape[0]
        nf = self.num_feats
        newborn_g = torch.abs(self.aug_shape[0](curr_feat.reshape(B, -1))).reshape(B, 1, -1)
        fp_g = torch.abs(self.aug_shape[1](curr_feat.reshape(B, -1))).reshape(B, 1, -1)
        dead_g = torch.abs(self.aug_shape[2](prev_feat.reshape(B, -1))).reshape(B, 1, -1)
        fn_g = torch.abs(self.aug_shape[3](prev_feat.reshape(B, -1))).reshape(B, 1, -1)
        feat_d = torch.cat([curr_feat, dead_g, fn_g], 1)
        feat_t = torch.cat([prev_feat, newborn_g, fp_g], 1)

        def absd(b):
            return torch.cat([b[..., :3], torch.abs(b[..., 3:6]), b[..., 6:]], -1)

        nb = absd(self.aug_dets[0](curr_boxes.reshape(B, -1)).reshape(B, 1, -1))
        fpb = absd(self.aug_dets[1](curr_boxes.reshape(B, -1)).reshape(B, 1, -1))
        db = absd(self.aug_dets[2](prev_boxes.reshape(B, -1)).reshape(B, 1, -1))
        fnb = absd(self.aug_dets[3](prev_boxes.reshape(B, -1)).reshape(B, 1, -1))

        curr_bp = curr_boxes.clone()
        curr_bp[:, :, :2] = curr_bp[:, :, :2] - vel * dt
        boxes_t = torch.cat([prev_boxes, nb, fpb], 1)
        boxes_d = torch.cat([curr_bp, db, fnb], 1)

        eps = 1e-10
        rd = ((boxes_t[:, :, None, :nf] - boxes_d[:, None, :, :nf]) ** 2).sum(-1)
        rd = nn.functional.normalize(rd)  # p=2, dim=1
        rdim = torch.abs(
            torch.log(boxes_t[:, :, None, 3:6] + eps) - torch.log(boxes_d[:, None, :, 3:6] + eps)
        ).sum(-1)
        rrot = torch.sqrt(
            (torch.cos(boxes_t[:, :, None, 6]) - torch.cos(boxes_d[:, None, :, 6])) ** 2
            + (torch.sin(boxes_t[:, :, None, 6]) - torch.sin(boxes_d[:, None, :, 6])) ** 2
        )
        hand = rd + rdim + rrot

        T = boxes_t.shape[1]
        D = boxes_d.shape[1]
        ft = feat_t[:, :, None, :].expand(B, T, D, F)
        fd = feat_d[:, None, :, :].expand(B, T, D, F)
        rshape = self.fuse_shape(torch.cat([ft, fd], -1))[..., 0]
        bt = boxes_t[:, :, None, :nf].expand(B, T, D, nf)
        bd = boxes_d[:, None, :, :nf].expand(B, T, D, nf)
        rfused = self.fuse_det(torch.cat([bt, bd], -1))[..., 0]
        coeff = self.res_coeff(torch.cat([ft, bt, fd, bd], -1))
        residual = coeff[..., 0] * rfused + coeff[..., 1] * hand + coeff[..., 2] * rshape

        m = self.aff(residual)
        m1 = torch.softmax(m[:, :-2, :], dim=2)
        m2 = torch.softmax(m[:, :, :-2], dim=1)
        return m1, m2


def test_affinity_matches_torch_oracle(rng):
    torch.manual_seed(0)
    oracle = TorchOracle().double()

    B, N = 2, MAX_OBJ
    prev_boxes = rng.normal(size=(B, N, 7))
    prev_boxes[:, :, 3:6] = np.abs(prev_boxes[:, :, 3:6]) + 0.5
    curr_boxes = rng.normal(size=(B, N, 7))
    curr_boxes[:, :, 3:6] = np.abs(curr_boxes[:, :, 3:6]) + 0.5
    vel = rng.normal(size=(B, N, 2)) * 0.5
    dt = np.full((B, N, 1), 0.5)
    prev_feat = rng.normal(size=(B, N, F))
    curr_feat = rng.normal(size=(B, N, F))

    with torch.no_grad():
        m1_t, m2_t = oracle(
            *(torch.tensor(a) for a in (prev_boxes, curr_boxes, vel, dt, prev_feat, curr_feat))
        )

    # convert oracle weights (reference naming) into the flax tree
    sd = {k: v.float() for k, v in oracle.state_dict().items()}
    params = convert_affinity(sd)

    net = AffinityNet(max_obj=MAX_OBJ, num_feats=NUM_FEATS)
    m1_j, m2_j = net.apply(
        {"params": params},
        jnp.array(prev_boxes, jnp.float32),
        jnp.array(curr_boxes, jnp.float32),
        jnp.array(vel, jnp.float32),
        jnp.array(dt, jnp.float32),
        jnp.array(prev_feat, jnp.float32),
        jnp.array(curr_feat, jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(m1_j), m1_t.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(m2_j), m2_t.numpy(), atol=2e-4)


def test_affinity_output_shapes_and_softmax(rng):
    net = AffinityNet(max_obj=MAX_OBJ, num_feats=NUM_FEATS)
    B, N = 1, MAX_OBJ
    import jax

    params = net.init(
        jax.random.PRNGKey(0),
        jnp.zeros((B, N, 7)), jnp.zeros((B, N, 7)), jnp.zeros((B, N, 2)),
        jnp.zeros((B, N, 1)), jnp.zeros((B, N, F)), jnp.zeros((B, N, F)),
    )["params"]
    m1, m2 = net.apply(
        {"params": params},
        jnp.zeros((B, N, 7)), jnp.zeros((B, N, 7)), jnp.zeros((B, N, 2)),
        jnp.zeros((B, N, 1)), jnp.zeros((B, N, F)), jnp.zeros((B, N, F)),
    )
    assert m1.shape == (B, N, N + 2)
    assert m2.shape == (B, N + 2, N)
    np.testing.assert_allclose(np.asarray(m1.sum(2)), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m2.sum(1)), 1.0, atol=1e-5)


def test_affinity_matches_torch_oracle_full_scale(rng):
    """Release-scale parity (max_obj=90, 320-d descriptors): the
    split-first-layer einsum trick and the 28800-dim anchor MLPs must
    match the reference formulation at the real car-config sizes, not just
    the toy ones (the converter shapes are pinned in
    test_convert_fullscale; this pins the numerics)."""
    torch.manual_seed(1)
    N = 90
    oracle = TorchOracle(max_obj=N).double()

    B = 1
    prev_boxes = rng.normal(size=(B, N, 7))
    prev_boxes[:, :, 3:6] = np.abs(prev_boxes[:, :, 3:6]) + 0.5
    curr_boxes = rng.normal(size=(B, N, 7))
    curr_boxes[:, :, 3:6] = np.abs(curr_boxes[:, :, 3:6]) + 0.5
    vel = rng.normal(size=(B, N, 2)) * 0.5
    dt = np.full((B, N, 1), 0.5)
    prev_feat = rng.normal(size=(B, N, F))
    curr_feat = rng.normal(size=(B, N, F))

    with torch.no_grad():
        m1_t, m2_t = oracle(
            *(torch.tensor(a) for a in (prev_boxes, curr_boxes, vel, dt, prev_feat, curr_feat))
        )

    sd = {k: v.float() for k, v in oracle.state_dict().items()}
    params = convert_affinity(sd)
    net = AffinityNet(max_obj=N, num_feats=NUM_FEATS)
    m1_j, m2_j = net.apply(
        {"params": params},
        jnp.array(prev_boxes, jnp.float32),
        jnp.array(curr_boxes, jnp.float32),
        jnp.array(vel, jnp.float32),
        jnp.array(dt, jnp.float32),
        jnp.array(prev_feat, jnp.float32),
        jnp.array(curr_feat, jnp.float32),
    )
    assert m1_j.shape == (B, N, N + 2) and m2_j.shape == (B, N + 2, N)
    np.testing.assert_allclose(np.asarray(m1_j), m1_t.numpy(), atol=5e-4)
    np.testing.assert_allclose(np.asarray(m2_j), m2_t.numpy(), atol=5e-4)
