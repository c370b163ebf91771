"""Mesh construction and sharding helpers."""

from rgbnomore_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    init_distributed,
)
