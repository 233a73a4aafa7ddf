"""Device mesh construction and sharding helpers.

The reference has no distributed backend at all (SURVEY §2.9). Here the
scaling story is XLA-native: a 1-D "data" mesh shards events across chips and
XLA inserts the gradient allreduce over ICI; a second "bucket" axis is
reserved for intra-event sequence sharding of the LSH bucket grid (the HEPT
analogue of sequence/context parallelism — buckets are embarrassingly
parallel after the sort).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: int | None = None,
    axis_names: tuple[str, ...] = ("data",),
    axis_sizes: tuple[int, ...] | None = None,
) -> Mesh:
    """Mesh over the available devices.

    1-D by default; pass `axis_sizes` for multi-axis meshes (e.g.
    axis_names=("data", "heads"), axis_sizes=(2, 4)). The product of
    axis_sizes must equal the device count used.
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    if axis_sizes is None:
        axis_sizes = (n,) + (1,) * (len(axis_names) - 1)
    if len(axis_sizes) != len(axis_names):
        raise ValueError(f"{len(axis_names)} axis names, {len(axis_sizes)} sizes")
    prod = 1
    for s in axis_sizes:
        prod *= s
    if prod != n:
        raise ValueError(f"axis_sizes {axis_sizes} product {prod} != {n} devices")
    dev = np.asarray(devices[:n]).reshape(axis_sizes)
    return Mesh(dev, axis_names)


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Shard leading (batch) dim over `axis`, replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
