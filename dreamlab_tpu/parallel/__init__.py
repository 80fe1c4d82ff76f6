from .sharding import (
    make_mesh,
    replicated,
    data_sharding,
    unet_tp_shardings,
    shard_params,
)

__all__ = [
    "make_mesh",
    "replicated",
    "data_sharding",
    "unet_tp_shardings",
    "shard_params",
]
