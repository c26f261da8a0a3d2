"""Device-mesh parallelism utilities (SPMD data parallelism over ICI)."""

from ldt_tpu.parallel.mesh import (
    data_mesh,
    replicate,
    shard_batch,
    shard_leading_axis,
)

__all__ = ["data_mesh", "replicate", "shard_batch", "shard_leading_axis"]
