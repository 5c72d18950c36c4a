# KITTI 3-class adversarial training config.
# Tunables mirror the reference
# configs/adversarial/adversarial-second_hv_secfpn_8xb6-80e_kitti-3d-3class.py:77-84,
# 130-163 (sensor_error_bound, adversarial_loss_weight, regularization_weight,
# adversary lr_mult, warmup + cosine schedule, 30 epochs / val every 3).

_base_ = ["../_base_/kitti-3d-3class.py"]

model = dict(
    type="AdversarialVoxelNet",
    adversary_cfg=dict(
        type="VoxelPerturber",
        sensor_error_bound=0.2,           # Velodyne HDL-64E +-20 cm envelope
        voxel_size=[0.05, 0.05, 0.1],
        use_spatial_attention=True,
        hidden_channels=[64, 128, 64],
    ),
    # Multiplies the GRL scale on the perturbation delta. The reference STORES
    # 0.1 here (adversarial-second_hv_secfpn...3class.py:83) but its VoxelNet
    # forward applies a bare -1.0 (adversarial_voxelnet.py:284) — 1.0 keeps
    # effective parity while making the knob live (freeze mode sets 0.5).
    adversarial_loss_weight=1.0,
    regularization_weight=0.02,
    adversary_start_epoch=3,              # delayed start (epoch gate)
)

optim = dict(
    lr=1e-4,
    adversary_lr_mult=2.0,                 # adversary learns faster
    warmup_iters=2000,
    warmup_start_factor=0.1,
    eta_min_factor=0.01,
)

custom_hooks = [
    dict(type="EpochTrackerHook"),
    dict(type="NaNDetectionHook", max_nan_count=10),
]

max_epochs = 30
val_interval = 3
batch_size = 6
work_dir = "work_dirs/kitti_3class_adversarial"
