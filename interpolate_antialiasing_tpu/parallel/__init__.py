from .sharding import make_mesh, shard_batch, data_parallel_resize
from .halo import halo_resize_h, plan_halo

__all__ = [
    "make_mesh",
    "shard_batch",
    "data_parallel_resize",
    "halo_resize_h",
    "plan_halo",
]
