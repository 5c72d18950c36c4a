# Clean (non-adversarial) SECOND baseline, KITTI Car-only.
# Counterpart of the reference's configs/second_hv_secfpn_8xb6-80e_kitti-3d-car.py
# (its clean-training baseline; anchor z plane -1.78, Car-only ranges).

_base_ = ["_base_/kitti-3d-3class.py"]

class_names = ["Car"]

model = dict(
    type="VoxelNet",
    adversary_cfg=None,
    bbox_head=dict(
        _delete_=True,
        type="Anchor3DHead",
        num_classes=1,
        anchor_ranges=[[0, -40.0, -1.78, 70.4, 40.0, -1.78]],
        anchor_sizes=[[3.9, 1.6, 1.56]],
        anchor_rotations=[0, 1.5707963],
        diff_rad_by_sin=True,
    ),
    train_cfg=dict(
        _delete_=True,
        pos_iou_thr=[0.6],
        neg_iou_thr=[0.45],
        min_pos_iou=[0.45],
    ),
)

max_epochs = 80
val_interval = 2
batch_size = 6
work_dir = "work_dirs/kitti_car_baseline"
