from .structures import PointCloudBatch
from .synthetic import synthetic_kitti_batch

__all__ = ["PointCloudBatch", "synthetic_kitti_batch"]
