from .detection import AnchorHeadConfig, anchor_head_loss, anchor_head_predict
from .pointpillars import AdversarialPointPillars, PointPillarsConfig
from .voxelnet import AdversarialVoxelNet, VoxelNetConfig, adversary_direct_terms

__all__ = [
    "AnchorHeadConfig",
    "anchor_head_loss",
    "anchor_head_predict",
    "AdversarialVoxelNet",
    "VoxelNetConfig",
    "adversary_direct_terms",
    "AdversarialPointPillars",
    "PointPillarsConfig",
]
