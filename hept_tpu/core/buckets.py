"""Sort/gather plumbing: AND-code packing, bucket sort, inverse permutation.

Rebuilds the reference's sort-to-buckets pipeline
(`/root/reference/src/models/attention/hept.py:9-19`,
`/root/reference/src/models/model_utils/hash_utils.py:42-89`,
`/root/reference/example/transformer.py:10-13`) with XLA-friendly primitives:
one argsort over combined float keys, `take_along_axis` gathers, and an O(n)
scatter for the inverse permutation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array


def bit_shift(base: Array, shift_idx: Array) -> Array:
    """Pack `shift_idx` into the high bits above `base`.

    `num_bits = ceil(log2(max(base) + 1))` per row (axis 1 of a (R, n) array),
    then `(shift_idx << num_bits) | base` — the example variant's AND-code
    packing (example/transformer.py:10-13), used to fold the batch index into
    the sort key for flat ragged batches.
    """
    base = base.astype(jnp.int32)
    shift_idx = shift_idx.astype(jnp.int32)
    max_base = base.max(axis=1, keepdims=True)
    num_bits = jnp.ceil(jnp.log2(max_base.astype(jnp.float32) + 1.0)).astype(jnp.int32)
    return jnp.left_shift(shift_idx, num_bits) | base


def invert_permutation(perm: Array) -> Array:
    """O(n) inverse of a permutation along the last axis.

    `inv[perm[i]] = i` — the scatter formulation of
    reference hash_utils.py:42-53 / example/hept_utils.py:50-61.
    """
    n = perm.shape[-1]
    ar = jnp.arange(n, dtype=perm.dtype)
    if perm.ndim == 1:
        return jnp.zeros_like(perm).at[perm].set(ar)
    flat = perm.reshape(-1, n)
    inv = jax.vmap(lambda p: jnp.zeros_like(p).at[p].set(ar))(flat)
    return inv.reshape(perm.shape)


def sort_to_buckets(x: Array, perm: Array, block_size: int) -> Array:
    """Gather rows of x into sorted fixed-size buckets.

    Args:
      x: (h, n, d) per-head features (shared across OR-hashes) or
         (c, h, n, d) per-hash features.
      perm: (c, h, n) argsort positions of the combined hash keys.
      block_size: bucket size B; n must be a multiple of B.
    Returns:
      (c, h, n // B, B, d) bucketed features
      (reference hept.py:9-14 / hash_utils.py:79-89).
    """
    if x.ndim == 3:
        x = x[None]
    c, h, n = perm.shape
    sorted_x = jnp.take_along_axis(
        jnp.broadcast_to(x, (c, h) + x.shape[-2:]), perm[..., None], axis=-2
    )
    return sorted_x.reshape(c, h, n // block_size, block_size, -1)


def unsort_from_buckets(s_x: Array, perm_inverse: Array) -> Array:
    """Scatter bucketed outputs back to original point order.

    Args:
      s_x: (c, h, nb, B, d); perm_inverse: (c, h, n).
    Returns: (c, h, n, d). (reference hept.py:17-19)
    """
    c, h, nb, bs, d = s_x.shape
    flat = s_x.reshape(c, h, nb * bs, d)
    return jnp.take_along_axis(flat, perm_inverse[..., None], axis=-2)
