from .layers import MaskedBatchNorm, masked_mean, masked_std
from .vfe import HardSimpleVFE
from .sparse_encoder import SparseEncoder
from .second import SECONDBackbone, SECONDFPN
from .anchor_head import Anchor3DHead
from .perturber import VoxelPerturber, StrongVoxelPerturber

__all__ = [
    "MaskedBatchNorm", "masked_mean", "masked_std",
    "HardSimpleVFE", "SparseEncoder", "SECONDBackbone", "SECONDFPN",
    "Anchor3DHead", "VoxelPerturber", "StrongVoxelPerturber",
]
