"""Intra-event model parallelism: head-sharded HEPT attention.

The LSH bucket grid (n_hashes, heads, n_buckets) is embarrassingly parallel
after the sort (SURVEY §2.9/§5: "the natural ring/Ulysses analogue for
HEPT"). The cleanest decomposition on a TPU mesh is over *heads*: each chip
hashes, sorts, gathers, attends and unsorts its own head slice end-to-end
with zero communication; the only collective is the all-gather that
reassembles the (n, heads*d) output for the following out-projection. With
h=8 reference heads this scales a single >60k-point event across up to 8
chips.

Used via `shard_map` over a ("heads",) mesh axis; also composes with the
"data" axis for 2-D (event × head) meshes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.bucket_attn import hept_attention_core


def head_sharded_attention(
    mesh: Mesh,
    axis: str = "heads",
    *,
    block_size: int,
    impl: str = "xla",
):
    """Build a head-sharded version of `hept_attention_core`.

    Returns fn(q_hat, k_hat, v, alpha, codes, invalid) -> (h, n, dv) where
    the h axis is physically sharded over `axis`; inputs are passed whole and
    partitioned by shard_map.
    """

    def local(q_hat, k_hat, v, alpha, codes, invalid):
        # Each chip sees (h_local, n, d) slices; the core is unchanged —
        # hash_shift is computed per (hash, head) so locality is exact.
        return hept_attention_core(
            q_hat, k_hat, v, alpha, codes, invalid,
            block_size=block_size, impl=impl,
        )

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(axis, None, None),  # q_hat (h, n, d)
            P(axis, None, None),  # k_hat
            P(axis, None, None),  # v
            P(axis, None, None),  # alpha (h, d, c)
            P(None, axis, None),  # codes (c, h, n)
            P(),  # invalid (n,)
        ),
        out_specs=P(axis, None, None),
    )
