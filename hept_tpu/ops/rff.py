"""Random feature maps for kernel linear attention (pure JAX).

Rebuilds the math of reference `src/models/model_utils/rff_utils.py` (itself
from performer-pytorch / google-research FAVOR+) plus the two feature-map
classes the reference pulls from the `fast_transformers` package
(performer.py:17-28, flt.py:17-27) — here as pure functions of explicit
projection matrices so everything jits and shards.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import Array


def gaussian_orthogonal_random_matrix(
    key: jax.Array, nrows: int, ncols: int, scaling: int = 0
) -> Array:
    """Block-orthogonal Gaussian projections (rff_utils.py:32-52).

    QR of Gaussian blocks with Haar sign correction; rows scaled either by
    chi-distributed norms (scaling=0) or sqrt(ncols) (scaling=1).
    """
    nblocks = int(math.ceil(nrows / ncols))
    k1, k2 = jax.random.split(key)
    blocks = jax.random.normal(k1, (nblocks, ncols, ncols))
    q, r = jnp.linalg.qr(blocks)
    diag_sign = jnp.sign(jnp.diagonal(r, axis1=-2, axis2=-1))
    q = q * diag_sign[:, None, :]
    q = jnp.swapaxes(q, -1, -2)
    g_ortho = q.reshape(nblocks * ncols, ncols)[:nrows]
    if scaling == 0:
        multiplier = jnp.linalg.norm(
            jax.random.normal(k2, (nrows, ncols)), axis=1
        )
        return multiplier[:, None] * g_ortho
    if scaling == 1:
        return math.sqrt(ncols) * g_ortho
    raise ValueError(f"invalid scaling {scaling}")


def softmax_kernel(
    data: Array,
    projection: Array,
    is_query: bool,
    softmax_temp: float | None = None,
    eps: float = 1e-4,
) -> Array:
    """FAVOR+ positive softmax features (rff_utils.py:60-89).

    Args: data (..., n, d); projection (m, d). Returns (..., n, m).
    Queries stabilize with a per-row max; keys with a global max.
    """
    d = data.shape[-1]
    if softmax_temp is None:
        softmax_temp = 1.0 / math.sqrt(d)
    normalizer = math.sqrt(softmax_temp)
    ratio = projection.shape[0] ** -0.5
    data_dash = jnp.einsum("...id,jd->...ij", normalizer * data, projection)
    diag = jnp.sum(data**2, axis=-1, keepdims=True) * 0.5 * normalizer**2
    if is_query:
        stab = jnp.max(data_dash, axis=-1, keepdims=True)
    else:
        stab = jnp.max(data_dash, axis=(-1, -2), keepdims=True)
    return ratio * (jnp.exp(data_dash - diag - stab) + eps)


def linear_attention(q: Array, k: Array, v: Array, eps: float = 1e-6):
    """Non-causal linear attention (rff_utils.py:96-102).

    q, k: (..., n, m) feature maps; v: (..., n, dv).
    """
    k_sum = jnp.sum(k, axis=-2)
    d_inv = 1.0 / (jnp.einsum("...nd,...d->...n", q, k_sum) + eps)
    context = jnp.einsum("...nd,...ne->...de", k, v)
    return jnp.einsum("...de,...nd,...n->...ne", context, q, d_inv)


def favor_features(x: Array, omega: Array, offset: Array) -> Array:
    """The reference's Favor subclass (performer.py:20-28): hyperbolic
    exp features with an additive log-offset folding the RBF distance.

    x: (..., n, d); omega: (d, m/2); offset: (..., n, 1). Returns (..., n, m).
    """
    n_dims = 2 * omega.shape[-1]
    u = jnp.einsum("...nd,dm->...nm", x, omega)
    off = offset - 0.5 * math.log(n_dims)
    return jnp.concatenate([jnp.exp(u + off), jnp.exp(-u + off)], axis=-1)


def rff_features(x: Array, omega: Array, gamma: float = 1.0) -> Array:
    """Random Fourier features (flt.py:22-27): [cos(u), sin(u)]·sqrt(2/m)."""
    n_dims = 2 * omega.shape[-1]
    u = jnp.einsum("...nd,dm->...nm", x * math.sqrt(gamma), omega)
    return jnp.concatenate([jnp.cos(u), jnp.sin(u)], axis=-1) * math.sqrt(
        2.0 / n_dims
    )


def orthogonal_gaussian(key: jax.Array, dim: int, n_features: int) -> Array:
    """Feature-map omega (d, m/2) as drawn by fast_transformers' orthogonal
    feature maps: Gaussian with orthogonal columns per block."""
    half = n_features // 2
    # draw (half, dim) block-orthogonal rows, then transpose
    mat = gaussian_orthogonal_random_matrix(key, half, dim, scaling=0)
    return mat.T  # (dim, half)
