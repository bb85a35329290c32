"""Device-mesh / sharding helpers.

The reference's only parallelism is single-process torch DataParallel
(ref: train_deep_sdf.py:352, SURVEY.md §2.6). The TPU-native equivalent is a
1-D data mesh: the scene/point batch axis is sharded over devices, decoder
params and the latent table are replicated, and XLA inserts the psum for
gradient reduction over ICI when the jitted train step consumes sharded
batches. No prefix games, no scatter/gather — just NamedShardings.

SDF point evaluation is embarrassingly parallel over query points, so the
same 1-D mesh covers training, latent optimization, and dense-grid eval.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int | None = None, axis_name: str = "data") -> Mesh:
    """1-D mesh over the first ``num_devices`` devices (all by default)."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_leading_axis(x, mesh: Mesh, axis_name: str = "data"):
    """Place an array with its leading axis sharded over the mesh."""
    return jax.device_put(x, batch_sharding(mesh, axis_name))


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def mesh_size(mesh: Mesh) -> int:
    """Total device count of a mesh."""
    return int(np.prod(list(mesh.shape.values())))


def leading_axis_or_replicated(
    mesh: Mesh, n: int, what: str = "array", axis_name: str = "data"
) -> NamedSharding:
    """Shard the leading axis of an n-row array over the mesh when n divides
    evenly; otherwise replicate (correctness-preserving fallback). The
    trainers avoid the replication cliff on their hot paths: Stage-1 pads
    the scene batch and latent table to mesh multiples with masked losses,
    and Stage-2 shards the SDF-consistency term over the point axis — this
    fallback remains only for genuinely small/cold arrays."""
    import logging

    if n % mesh_size(mesh) == 0:
        return NamedSharding(mesh, P(axis_name))
    logging.warning(
        "%s (%d rows) not divisible by %d devices; REPLICATING (1x compute "
        "per device). Pad the leading axis to a mesh multiple to shard.",
        what, n, mesh_size(mesh),
    )
    return NamedSharding(mesh, P())
