"""Static-shape padding policies for bucketed attention.

Two semantics exist in the reference and both are kept:

* "zero" (src variant): pad rows are zeroed in q̂/k̂/v and their hash keys set
  huge so they sort last (src/models/attention/hept.py:89-96,
  hash_utils.py:57-76). Pads share the trailing bucket(s) with real points and
  contribute exp(-.5|q̂|²) mass to those denominators — a quirk we replicate
  for parity.

* "replicate" (example variant, the newer/batched one): pad rows duplicate
  real points chosen by sorted AND-code rank so the trailing bucket is filled
  with *nearby* real points; outputs at pad rows are dropped
  (example/transformer.py:16-32).

On TPU every event lives in a fixed-size (N_max) slot. Rows beyond the
reference's ceil(n/B)*B padding are "inert": zeroed, with key = +BIG, so they
fill whole buckets of their own (N_max - ceil(n/B)*B is a multiple of B) and
never mix with real points.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def ceil_to_multiple(n, m: int):
    return ((n + m - 1) // m) * m


def pad_to_multiple(x: Array, multiple: int, axis: int = 0, value: float = 0.0) -> Array:
    """Pad `axis` of x up to the next multiple (host/static variant)."""
    n = x.shape[axis]
    target = int(ceil_to_multiple(n, multiple))
    if target == n:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, target - n)
    return jnp.pad(x, pads, constant_values=value)


def replication_pad_plan(
    n_valid: Array,
    n_total: int,
    block_size: int,
    sorted_code_idx: Array,
) -> tuple[Array, Array, Array]:
    """Compute gather indices implementing the example variant's padding.

    For an event with `n_valid` real rows stored in slots [0, n_valid) of an
    N_total buffer:
      * slots [n_valid, padded_n) (padded_n = ceil(n_valid/B)*B) replicate the
        real points ranked [n_valid - B, n_valid - B + pad_count) by the first
        (hash 0, head 0) AND code — exactly the rows the reference fills the
        trailing bucket with (example/transformer.py:24-31);
      * slots [padded_n, N_total) are inert.

    Args:
      n_valid: scalar int (traced ok).
      n_total: static buffer size, multiple of block_size.
      block_size: bucket size B.
      sorted_code_idx: (n_total,) argsort of the hash-0/head-0 AND code with
        invalid rows keyed to sort last (so ranks [0, n_valid) are real rows).
    Returns:
      gather: (n_total,) int32 source row for each slot.
      valid: (n_total,) bool — True for the original real rows (unpad mask).
      inert: (n_total,) bool — True for whole-bucket inert pad slots.
    """
    pos = jnp.arange(n_total, dtype=jnp.int32)
    padded_n = ceil_to_multiple(n_valid, block_size)
    fill_rank = jnp.clip(n_valid - block_size + (pos - n_valid), 0, n_total - 1)
    fill_idx = sorted_code_idx[fill_rank].astype(jnp.int32)
    valid = pos < n_valid
    inert = pos >= padded_n
    gather = jnp.where(valid, pos, jnp.where(inert, 0, fill_idx))
    return gather, valid, inert
