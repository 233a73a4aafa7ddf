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


def gather_rows(x: Array, perm: Array) -> Array:
    """Permute rows of per-(hash, head) feature arrays, fast on TPU.

    Args:
      x: (h, n, d) (shared across OR-hashes) or (c, h, n, d).
      perm: (c, h, n) row indices into the n axis.
    Returns: (c, h, n, d).

    Implementation note: XLA's TPU lowering of `take_along_axis` on a
    broadcast (c, h, n, d) operand runs at a few GB/s; flattening to 2-D and
    indexing rows with a flat integer array is ~5x faster (same bytes, a
    gather the compiler recognizes as contiguous row fetches) — see
    scripts/profile_gather.py.
    """
    c, h, n = perm.shape
    d = x.shape[-1]
    if x.ndim == 3:
        flat = x.reshape(h * n, d)
        offs = (jnp.arange(h, dtype=perm.dtype) * n)[None, :, None]
    else:
        flat = x.reshape(c * h * n, d)
        offs = (jnp.arange(c * h, dtype=perm.dtype) * n).reshape(c, h, 1)
    fidx = (perm + offs).reshape(-1)
    return flat[fidx].reshape(c, h, n, d)


def _float0_zero(x):
    import numpy as np

    return np.zeros(x.shape, dtype=jax.dtypes.float0)


@jax.custom_vjp
def sort_carry(keys: Array, payload: Array) -> tuple[Array, Array]:
    """Sort payload rows by keys via XLA variadic sort (no gather).

    Args:
      keys: (c, h, n) sort keys.
      payload: (h, n, d) (broadcast over hashes) or (c, h, n, d).
    Returns:
      (sorted_payload (c, h, n, d), source_index (c, h, n)) where
      source_index[s] is the original row now at sorted slot s.

    The TPU-fast formulation: XLA's variadic sort moves payload columns
    through the sorting network directly at ~6x the throughput of a
    take_along_axis gather and ~3x the flat-row gather, and it subsumes the
    argsort itself (scripts/profile_gather.py: 8.8 ms vs 4.4 + 51 ms at
    60k x 24 rows x 30 columns). A custom VJP applies the inverse
    permutation with a flat-row gather instead of differentiating through
    the sorting network.
    """
    return _sort_carry_impl(keys, payload)


def _sort_carry_impl(keys, payload):
    c, h, n = keys.shape
    if payload.ndim == 3:
        payload = jnp.broadcast_to(payload[None], (c,) + payload.shape)
    d = payload.shape[-1]
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (c, h, n))
    ops = [keys, iota] + [payload[..., j] for j in range(d)]
    out = jax.lax.sort(ops, dimension=-1, num_keys=1, is_stable=False)
    return jnp.stack(out[2:], axis=-1), out[1]


def _sort_carry_fwd(keys, payload):
    out = _sort_carry_impl(keys, payload)
    return out, (out[1], keys, payload.ndim == 3)


def _sort_carry_bwd(res, cotangents):
    src, keys, was_3d = res
    g_sorted, _ = cotangents  # integer source_index output carries no grad
    # sorted[s] = payload[src[s]]  =>  d payload[r] = g_sorted[inv[r]], which
    # is exactly the unsort: re-sort g_sorted on the carried source indices.
    # Sort-based (no scatter-invert, no gather) — variadic sort moves rows
    # ~3-6x faster than take_along_axis on TPU (scripts/profile_gather.py).
    gp = _unsort_carry_impl(src, g_sorted)  # (c, h, n, d)
    if was_3d:
        gp = gp.sum(axis=0)  # broadcast over hashes sums in reverse
    return _float0_zero(keys) if jnp.issubdtype(keys.dtype, jnp.integer) else jnp.zeros_like(keys), gp


sort_carry.defvjp(_sort_carry_fwd, _sort_carry_bwd)


@jax.custom_vjp
def unsort_carry(source_index: Array, payload: Array) -> Array:
    """Inverse of `sort_carry`: restore original row order by sorting on the
    carried source indices (unique ints, so unstable sort is exact).

    Args: source_index (c, h, n); payload (c, h, n, d). Returns (c, h, n, d).
    """
    return _unsort_carry_impl(source_index, payload)


def _unsort_carry_impl(source_index, payload):
    ops = [source_index] + [payload[..., j] for j in range(payload.shape[-1])]
    out = jax.lax.sort(ops, dimension=-1, num_keys=1, is_stable=False)
    return jnp.stack(out[1:], axis=-1)


def _unsort_carry_fwd(source_index, payload):
    # Carry an iota column through the unsort: sorted by src (a permutation),
    # slot i receives iota j with src[j] = i, i.e. inv[i] — the inverse
    # permutation for free inside the sort that runs anyway.
    c, h, n = source_index.shape
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (c, h, n))
    ops = [source_index, iota] + [payload[..., j] for j in range(payload.shape[-1])]
    out = jax.lax.sort(ops, dimension=-1, num_keys=1, is_stable=False)
    return jnp.stack(out[2:], axis=-1), (source_index, out[1])


def _unsort_carry_bwd(res, g):
    source_index, inv = res
    # out[src[s]] = payload[s]  =>  d payload[s] = g[src[s]]; sorting g on inv
    # places g[j] with inv[j] = s at slot s, i.e. j = src[s] — sort-based
    # forward-permutation apply, no gather.
    gp = _unsort_carry_impl(inv, g)
    return _float0_zero(source_index), gp


unsort_carry.defvjp(_unsort_carry_fwd, _unsort_carry_bwd)


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
    c, h, n = perm.shape
    return gather_rows(x, perm).reshape(c, h, n // block_size, block_size, -1)


def unsort_from_buckets(s_x: Array, perm_inverse: Array) -> Array:
    """Scatter bucketed outputs back to original point order.

    Args:
      s_x: (c, h, nb, B, d); perm_inverse: (c, h, n).
    Returns: (c, h, n, d). (reference hept.py:17-19)
    """
    c, h, nb, bs, d = s_x.shape
    return gather_rows(s_x.reshape(c, h, nb * bs, d), perm_inverse)
