from .kitti_metric import KittiMetric, eval_kitti_ap

__all__ = ["KittiMetric", "eval_kitti_ap"]
