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
    n_devices: int | None = None, axis_names: tuple[str, ...] = ("data",)
) -> Mesh:
    """1-D (or reshaped) mesh over the available devices."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    dev = np.asarray(devices[:n])
    if len(axis_names) > 1:
        # split n into len(axis_names) roughly-even factors, data-major
        shape = [1] * len(axis_names)
        shape[0] = n
        dev = dev.reshape(shape)
    return Mesh(dev.reshape([n] + [1] * (len(axis_names) - 1)), axis_names)


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Shard leading (batch) dim over `axis`, replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
