from bcm3_tpu.parallel.mesh import (
    CHAIN_AXIS,
    chain_mesh,
    chain_sharding,
    replicated,
    shard_leading_axis,
)

__all__ = [
    "CHAIN_AXIS",
    "chain_mesh",
    "chain_sharding",
    "replicated",
    "shard_leading_axis",
]
