"""Device-mesh parallelism utilities (SPMD data parallelism over ICI)."""

from ldt_tpu.parallel.mesh import (
    data_mesh,
    replicate,
    shard_batch,
    shard_leading_axis,
)
from ldt_tpu.parallel.sp import set_sp_mesh, sp_shard

__all__ = ["data_mesh", "replicate", "shard_batch", "shard_leading_axis",
           "set_sp_mesh", "sp_shard"]
