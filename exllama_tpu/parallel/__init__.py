from exllama_tpu.parallel.mesh import (
    cache_sharding,
    make_mesh,
    param_shardings,
    shard_params,
)

__all__ = ["cache_sharding", "make_mesh", "param_shardings", "shard_params"]
