"""Shared base for the per-class nuScenes tracking configs.

Structural reference: configs/nusc/car.py (model/data/optimizer sections).
Class configs import * from here and override the per-class block.
"""

# ---- per-class knobs (overridden by each class config) --------------------
det_type = ["car"]
max_objects = 90
fp_ratio = 1 / 3
dead_trk_ratio = 1 / 3
alpha = 0.5  # confidence-refinement threshold
beta = 0.5  # confidence-refinement mix
max_age = 4
fp_elim = 0.7  # FP elimination threshold (decision rules)
decision_thresh = 0.5

num_feats = 3
freeze_bev = True
pretrained_bev_map = "data/nusc_preprocessed/bev_map.pth"

# ---- model ----------------------------------------------------------------
model = dict(
    type="ShastaModel",
    max_obj=max_objects,
    num_feats=num_feats,
    num_point=5,
    share_conv_channel=64,
    num_input_features=5,
    pc_start=(-54.0, -54.0),
    voxel_size=(0.075, 0.075),
    out_stride=8,
    grid_shape=(41, 1440, 1440),
    # voxel caps for the doubled (curr+prev) batch, per device
    cap_conv2=100000,
    cap_conv3=50000,
    cap_conv4=25000,
    cap_extra=25000,
    # voxels arrive host-sorted (point_pipeline.sort_voxels) -> the backbone
    # skips its stage-0 argsort; runtime-guarded, safe for unsorted input
    assume_sorted_voxels=True,
)

# ---- data -----------------------------------------------------------------
data_root = "data/nuScenes"
preproc_root = "data/nusc_preprocessed"
nsweeps = 10

point_pipeline = dict(
    voxel_size=(0.075, 0.075, 0.2),
    pc_range=(-54.0, -54.0, -5.0, 54.0, 54.0, 3.0),
    max_points_in_voxel=10,
    max_voxels=120000,
    nsweeps=nsweeps,
    shuffle_points=True,
    global_rot_noise=(-0.78539816, 0.78539816),
    global_scale_noise=(0.9, 1.1),
    global_translate_std=0.5,
    # host-side key sort so the device backbone skips its stage-0 argsort
    sort_voxels=True,
)

data = dict(
    samples_per_device=4,
    workers=8,
    train=dict(
        info_path=f"{preproc_root}/infos_train_10sweeps_withvelo_filter_True.pkl",
        det_path=f"{preproc_root}/train_2hz/detections/cp/sensor_individual_frames",
        cls_info_path=f"{preproc_root}/train_2hz/detections/cp/cls_individual_frames",
        labels_path=f"{preproc_root}/train_2hz/gt_shasta/cp/individual_frames",
        frame_info_path=f"{preproc_root}/train_frame_info.json",
    ),
    val=dict(
        info_path=f"{preproc_root}/infos_val_10sweeps_withvelo_filter_True.pkl",
        det_path=f"{preproc_root}/val_2hz/detections/cp/sensor_individual_frames",
        cls_info_path=f"{preproc_root}/val_2hz/detections/cp/cls_individual_frames",
        frame_info_path=f"{preproc_root}/val_frame_info.json",
        test_mode=True,
    ),
    test=dict(
        info_path=f"{preproc_root}/infos_test_10sweeps_withvelo.pkl",
        det_path=f"{preproc_root}/test_2hz/detections/cp/sensor_individual_frames",
        cls_info_path=f"{preproc_root}/test_2hz/detections/cp/cls_individual_frames",
        frame_info_path=f"{preproc_root}/test_frame_info.json",
        test_mode=True,
    ),
)

# ---- optimization (trainval defaults, configs/nusc/car.py:218-249) --------
total_epochs = 3
learning_rate = 1e-4
weight_decay = 1e-2
grad_clip = None
use_scheduler = False
scheduler = dict(max_lr=1e-3, pct_start=0.4, div_factor=10.0)
seed = 0
