from .mesh import init_distributed, make_mesh, replicate, shard_batch_fn

__all__ = ["init_distributed", "make_mesh", "replicate", "shard_batch_fn"]
