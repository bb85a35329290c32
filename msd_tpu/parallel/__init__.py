from msd_tpu.parallel.mesh_utils import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_leading_axis,
)
