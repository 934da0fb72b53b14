from deepseek_tpu.parallel.mesh import make_mesh
from deepseek_tpu.parallel.sharding import (
    cache_shardings, param_shardings, shard_cache, shard_params,
)

__all__ = [
    "make_mesh", "param_shardings", "cache_shardings",
    "shard_params", "shard_cache",
]
