from . import boxes, box_coder, anchors, losses, voxelize, sparse, nms, assigner

__all__ = ["boxes", "box_coder", "anchors", "losses", "voxelize", "sparse", "nms", "assigner"]
