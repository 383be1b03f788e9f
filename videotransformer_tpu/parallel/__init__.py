"""Device-mesh parallelism: mesh construction and sharding helpers."""

from videotransformer_tpu.parallel.mesh import (
    create_mesh,
    shard_batch,
    replicate,
)

__all__ = ["create_mesh", "shard_batch", "replicate"]
