from .bpsvi_batch import make_sharded_bpsvi_batch
from .groups import make_sharded_group_builder, shard_group_ids
from .hilbert import ShardedHilbertCoreset
from .mesh import (DATA_AXIS, SAMP_AXIS, auto_mesh_shape, make_mesh,
                   shard_data, shard_weights)
from .sharded import make_sharded_incremental_builder

__all__ = [
    "DATA_AXIS",
    "SAMP_AXIS",
    "ShardedHilbertCoreset",
    "auto_mesh_shape",
    "make_mesh",
    "shard_data",
    "shard_weights",
    "make_sharded_bpsvi_batch",
    "make_sharded_group_builder",
    "make_sharded_incremental_builder",
    "shard_group_ids",
]
