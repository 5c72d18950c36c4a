from .mesh import make_mesh, replicate, shard_batch, shard_stacked, stack_plans

__all__ = ["make_mesh", "shard_batch", "replicate", "stack_plans", "shard_stacked"]
