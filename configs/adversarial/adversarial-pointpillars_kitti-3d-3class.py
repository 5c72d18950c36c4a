# KITTI 3-class adversarial PointPillars (the all-dense pillar family —
# models/pointpillars.py; geometry from mmdet3d
# pointpillars_hv_secfpn_8xb6-160e_kitti-3d-3class). Same adversarial recipe
# as the SECOND config: VoxelPerturber on raw pillar points, GRL min-max,
# epoch-3 delayed start.

model = dict(
    type="AdversarialPointPillars",
    voxelizer=dict(
        point_cloud_range=[0.0, -39.68, -3.0, 69.12, 39.68, 1.0],
        voxel_size=[0.16, 0.16, 4.0],
        max_points_per_voxel=32,
        max_voxels=16000,
    ),
    bbox_head=dict(
        num_classes=3,
        anchor_ranges=[
            [0, -39.68, -1.78, 69.12, 39.68, -1.78],
            [0, -39.68, -0.6, 69.12, 39.68, -0.6],
            [0, -39.68, -0.6, 69.12, 39.68, -0.6],
        ],
        anchor_sizes=[[3.9, 1.6, 1.56], [0.8, 0.6, 1.73], [1.76, 0.6, 1.73]],
        anchor_rotations=[0.0, 1.5707963],
    ),
    adversary_cfg=dict(
        type="VoxelPerturber",
        sensor_error_bound=0.2,
        use_spatial_attention=True,
        hidden_channels=[64, 128, 64],
    ),
    adversarial_loss_weight=1.0,
    regularization_weight=0.02,
    adversary_start_epoch=3,
)

class_names = ["Car", "Pedestrian", "Cyclist"]

optim = dict(
    lr=1e-4,
    adversary_lr_mult=2.0,
    warmup_iters=2000,
    warmup_start_factor=0.1,
    eta_min_factor=0.01,
)

max_epochs = 80
val_interval = 5
batch_size = 6
work_dir = "work_dirs/kitti_3class_pointpillars_adversarial"
