from msd_tpu.parallel.mesh_utils import (  # noqa: F401
    batch_sharding,
    leading_axis_or_replicated,
    make_mesh,
    mesh_size,
    pad_to_multiple,
    replicated_sharding,
    shard_leading_axis,
)
