"""Tiled brute-force k-nearest-neighbours (regular-shape TPU replacement for
`torch_cluster.knn`).

Used by (a) the retrieval metrics (reference `src/utils/metrics.py:24-62`
computes a full N×N cdist + topk per event — ~14 GB at 60k points; we tile the
query axis so only (tile, N) distance blocks exist at once) and (b) the
DGCNN/GravNet learned-space kNN graphs (reference gnns.py:250-252,283-288).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import Array


@partial(jax.jit, static_argnames=("k", "tile"))
def knn_brute_force(
    queries: Array,
    points: Array,
    k: int,
    valid: Array | None = None,
    tile: int = 1024,
) -> tuple[Array, Array]:
    """k nearest points (L2) for each query, tiled over queries.

    Args:
      queries: (M, d); points: (N, d); valid: optional (N,) bool — invalid
        points are pushed to +inf distance (never neighbours).
      tile: query rows per distance block (memory/latency trade-off).
    Returns:
      (dists, indices): (M, k) ascending squared-L2 distances and indices.
    """
    m, d = queries.shape
    n = points.shape[0]
    pad_m = (-m) % tile
    q = jnp.pad(queries, ((0, pad_m), (0, 0)))
    p_sq = jnp.sum(points * points, axis=-1)  # (N,)

    def one_tile(q_tile):
        # squared L2 via the expansion; keeps the matmul on the MXU.
        d2 = (
            jnp.sum(q_tile * q_tile, axis=-1, keepdims=True)
            - 2.0 * q_tile @ points.T
            + p_sq[None, :]
        )
        if valid is not None:
            d2 = jnp.where(valid[None, :], d2, jnp.inf)
        neg_top, idx = jax.lax.top_k(-d2, k)
        return -neg_top, idx

    q_tiles = q.reshape(-1, tile, d)
    dists, idxs = jax.lax.map(one_tile, q_tiles)
    return dists.reshape(-1, k)[:m], idxs.reshape(-1, k)[:m]
