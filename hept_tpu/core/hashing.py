"""E2LSH random-projection hashing.

TPU-native rebuild of the reference's E2LSH machinery
(`/root/reference/src/models/model_utils/hash_utils.py:329-350`,
`/root/reference/example/hept_utils.py:38-71`): hash codes are plain matmul
projections `h(x) = x @ alpha` with `alpha ~ N(0, 1)` frozen at init, one
projection per (head, OR-hash). The projections feed an argsort, so they are
wrapped in `stop_gradient` (the reference runs them under `torch.no_grad`).

Everything here is a pure function of explicit arrays — the frozen `alpha`
lives in the model's non-trainable "constants" collection and is passed in.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def e2lsh_init(key: jax.Array, n_heads: int, dim: int, n_hashes: int) -> jax.Array:
    """Frozen N(0,1) projection directions, shape (n_heads, dim, n_hashes).

    Mirrors `E2LSH.__init__` (reference hash_utils.py:339-344). The `beta`
    offset the reference draws is unused in its projection, so we omit it.
    """
    return jax.random.normal(key, (n_heads, dim, n_hashes), dtype=jnp.float32)


def e2lsh_project(x: jax.Array, alpha: jax.Array) -> jax.Array:
    """Project per-head vectors onto hash directions.

    Args:
      x: (n_heads, n, dim) per-head features.
      alpha: (n_heads, dim, n_hashes) frozen directions.
    Returns:
      (n_hashes, n_heads, n) scalar hash values — the layout the
      OR-hash machinery sorts over (reference hash_utils.py:345-350).
    """
    proj = jnp.einsum(
        "hnd,hdc->chn", x, alpha, preferred_element_type=jnp.float32
    )
    return proj


def lsh_mapping(alpha: jax.Array, queries: jax.Array, keys: jax.Array):
    """Hash q and k; compute the span used to separate AND-regions.

    Args:
      alpha: (n_heads, dim, n_hashes).
      queries, keys: (n_heads, n, dim).
    Returns:
      (q_hashed, k_hashed, hash_shift) with shapes
      (n_hashes, n_heads, n), (n_hashes, n_heads, n), (n_hashes, n_heads, 1).

    `hash_shift = max(q,k) - min(q,k)` over the point axis: multiplying an
    integer region code by a value >= the hash span guarantees that points in
    different regions never interleave after the argsort
    (reference hash_utils.py:329-336). The whole mapping is gradient-free
    (it only feeds a sort).
    """
    q_hashed = e2lsh_project(queries, alpha)
    k_hashed = e2lsh_project(keys, alpha)
    max_hash = jnp.maximum(
        q_hashed.max(axis=-1, keepdims=True), k_hashed.max(axis=-1, keepdims=True)
    )
    min_hash = jnp.minimum(
        q_hashed.min(axis=-1, keepdims=True), k_hashed.min(axis=-1, keepdims=True)
    )
    hash_shift = max_hash - min_hash
    return (
        jax.lax.stop_gradient(q_hashed),
        jax.lax.stop_gradient(k_hashed),
        jax.lax.stop_gradient(hash_shift),
    )
