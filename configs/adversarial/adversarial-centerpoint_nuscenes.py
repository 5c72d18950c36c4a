# NuScenes AdversarialCenterPoint config.
# Tunables mirror the reference
# configs/adversarial/adversarial-centerpoint_voxel-nuscenes.py:23-88
# (conservative recipe: w=0.05, reg=0.005, lr=5e-5, clip 1.0, 20 epochs).

model = dict(
    type="AdversarialCenterPoint",
    voxelizer=dict(
        point_cloud_range=[-51.2, -51.2, -5.0, 51.2, 51.2, 3.0],
        voxel_size=[0.1, 0.1, 0.2],
        max_points_per_voxel=10,
        max_voxels=60000,
    ),
    num_point_features=5,   # x, y, z, intensity, timestamp
    adversary_cfg=dict(
        type="VoxelPerturber",
        sensor_error_bound=0.2,
        voxel_size=[0.1, 0.1, 0.2],
        use_spatial_attention=True,
        hidden_channels=[16, 32, 64],
    ),
    adversarial_loss_weight=0.05,
    regularization_weight=0.005,
    adversary_start_epoch=3,
)

optim = dict(type="AdamW", lr=5e-5, weight_decay=1e-3, clip_grad_norm=1.0,
             warmup_iters=2000, eta_min_factor=0.0001)

custom_hooks = [
    dict(type="L2NormRegularizationHook", regularization_strength=0.005),
    dict(type="EpochTrackerHook"),
]

max_epochs = 20
val_interval = 5
batch_size = 1
load_from = None  # set to a pretrained CenterPoint checkpoint dir to warm start
work_dir = "work_dirs/nuscenes_adversarial_training"
