"""Deterministic segmented reductions (static shapes).

TPU-native replacements for the reference's `torch_scatter.segment_csr` /
`scatter_mean` (used by the InfoNCE loss, `src/utils/losses.py:66-74`) and
PyG's scatter-softmax message passing (`src/models/attention/pct.py`,
`src/models/baselines/gnns.py`). XLA segment reductions are deterministic by
construction, so no sort+CSR trick is needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array


def segment_sum(data: Array, segment_ids: Array, num_segments: int) -> Array:
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_mean(data: Array, segment_ids: Array, num_segments: int,
                 weights: Array | None = None) -> Array:
    """Mean per segment; empty segments yield 0."""
    if weights is None:
        weights = jnp.ones(data.shape[0], dtype=data.dtype)
    w = weights.reshape((-1,) + (1,) * (data.ndim - 1))
    total = jax.ops.segment_sum(data * w, segment_ids, num_segments=num_segments)
    count = jax.ops.segment_sum(w, segment_ids, num_segments=num_segments)
    return total / jnp.maximum(count, 1e-12)


def segment_max(data: Array, segment_ids: Array, num_segments: int) -> Array:
    return jax.ops.segment_max(data, segment_ids, num_segments=num_segments)


def segment_softmax(
    logits: Array, segment_ids: Array, num_segments: int, mask: Array | None = None
) -> Array:
    """Numerically stable softmax within segments over axis 0.

    Replaces PyG's `softmax(alpha, index)` used by PCT attention
    (reference pct.py:70-77). `mask` marks valid entries (padded edge slots
    get zero probability).
    """
    if mask is not None:
        logits = jnp.where(
            mask.reshape((-1,) + (1,) * (logits.ndim - 1)), logits, -jnp.inf
        )
    seg_max = jax.ops.segment_max(logits, segment_ids, num_segments=num_segments)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    shifted = logits - seg_max[segment_ids]
    exp = jnp.exp(shifted)
    if mask is not None:
        exp = jnp.where(mask.reshape((-1,) + (1,) * (exp.ndim - 1)), exp, 0.0)
    denom = jax.ops.segment_sum(exp, segment_ids, num_segments=num_segments)
    return exp / jnp.maximum(denom[segment_ids], 1e-16)
