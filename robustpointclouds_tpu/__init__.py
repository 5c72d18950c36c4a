"""robustpointclouds_tpu — a TPU-native adversarial point-cloud detection framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
temex12/RobustPointClouds (reference layer map in /root/repo/SURVEY.md):
adversarial training of voxel-based 3D detectors (SECOND on KITTI,
CenterPoint on NuScenes) against learned, physically-bounded point
perturbations, plus the full compute stack the reference outsources to
CUDA dependencies (voxelization, sparse 3D convolution, rotated NMS,
KITTI AP) rebuilt as static-shape XLA/Pallas programs.

Layering (bottom-up):
  ops/       pure-XLA geometry + detection ops (boxes, IoU, coder, anchors,
             losses, assigner, NMS, voxelizer, sparse-conv index machinery)
  kernels/   Pallas TPU kernels for the hot paths
  nn/        flax modules (VFE, SparseEncoder, SECOND, SECONDFPN,
             Anchor3DHead, CenterHead, VoxelPerturber)
  models/    detector assemblies (VoxelNet/AdversarialVoxelNet,
             CenterPoint/AdversarialCenterPoint, strong variants) + registry
  train/     jit-compiled min-max train step, two optimizers, NaN ladder,
             orbax checkpointing
  data/      numpy input pipeline (KITTI/NuScenes readers, augmentation,
             static-shape batching)
  eval/      KITTI AP protocol, attack-mode evaluation
  parallel/  mesh / sharding utilities (DP over ICI via jax.sharding)
"""

__version__ = "0.1.0"
