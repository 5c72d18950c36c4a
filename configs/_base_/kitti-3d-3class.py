# Base KITTI 3-class dataset + SECOND architecture settings.
# Same tunables (and defaults) as the reference chain
# configs/adversarial/adversarial-second_hv_secfpn_8xb6-80e_kitti-3d-3class.py
# -> mmdet3d _base_ configs, re-expressed for this framework's Config system.

dataset_type = "KittiDataset"
data_root = "data/kitti"
class_names = ["Car", "Pedestrian", "Cyclist"]
point_cloud_range = [0, -40.0, -3.0, 70.4, 40.0, 1.0]

model = dict(
    type="VoxelNet",
    voxelizer=dict(
        point_cloud_range=point_cloud_range,
        voxel_size=[0.05, 0.05, 0.1],
        max_points_per_voxel=5,
        max_voxels=16000,
    ),
    middle_encoder=dict(
        type="SparseEncoder",
        in_channels=4,
        sparse_shape=[41, 1600, 1408],
        encoder_channels=[[16], [32, 32, 32], [64, 64, 64], [64, 64, 64]],
        out_channels=128,
    ),
    backbone=dict(
        type="SECOND", in_channels=256, layer_nums=[5, 5],
        layer_strides=[1, 2], out_channels=[128, 256],
    ),
    neck=dict(
        type="SECONDFPN", in_channels=[128, 256], upsample_strides=[1, 2],
        out_channels=[256, 256],
    ),
    bbox_head=dict(
        type="Anchor3DHead",
        num_classes=3,
        anchor_ranges=[
            [0, -40.0, -0.6, 70.4, 40.0, -0.6],
            [0, -40.0, -0.6, 70.4, 40.0, -0.6],
            [0, -40.0, -0.6, 70.4, 40.0, -0.6],
        ],
        anchor_sizes=[[3.9, 1.6, 1.56], [0.8, 0.6, 1.73], [1.76, 0.6, 1.73]],
        anchor_rotations=[0, 1.5707963],
        diff_rad_by_sin=True,
    ),
    train_cfg=dict(
        pos_iou_thr=[0.6, 0.35, 0.35],
        neg_iou_thr=[0.45, 0.2, 0.2],
        min_pos_iou=[0.45, 0.2, 0.2],
    ),
    test_cfg=dict(
        use_rotate_nms=True, nms_thr=0.01, score_thr=0.1, nms_pre=100, max_num=50
    ),
)

optim = dict(type="AdamW", lr=1e-4, betas=(0.9, 0.999), weight_decay=1e-3,
             clip_grad_norm=0.5)
max_epochs = 40
val_interval = 5
batch_size = 6
