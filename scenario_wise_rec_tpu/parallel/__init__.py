from .mesh import init_distributed, make_mesh, replicate, shard_batch_fn
from .sharding_rules import param_specs, place_opt_state, place_params

__all__ = ["init_distributed", "make_mesh", "replicate", "shard_batch_fn",
           "param_specs", "place_opt_state", "place_params"]
