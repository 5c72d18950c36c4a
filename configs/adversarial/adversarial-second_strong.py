# Strong-perturbation KITTI adversarial config.
# Tunables mirror the reference configs/adversarial/adversarial-second_strong_v2.py
# (StrongVoxelPerturber: deep channels, dropout, dynamic scaling; batch 1,
# 10 epochs, val every 2 per train_kitti_adversarial_strong.py:219-232).

_base_ = ["../_base_/kitti-3d-3class.py"]

model = dict(
    type="StrongAdversarialVoxelNet",
    adversary_cfg=dict(
        type="StrongVoxelPerturber",
        sensor_error_bound=0.18,
        hidden_channels=[64, 128, 256, 128],
        dropout_rate=0.1,
        activation="ReLU",
        use_batch_norm=True,
        dynamic_scaling=True,
    ),
    adversarial_loss_weight=0.1,
    momentum_loss_weight=0.1,
    anti_adaptation_prob=0.1,
    max_scaling=5.0,
)

max_epochs = 10
val_interval = 2
batch_size = 1
work_dir = "work_dirs/kitti_adversarial_strong"
