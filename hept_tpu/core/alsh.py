"""Asymmetric-LSH transforms and auxiliary hash families.

Rebuilds the live and near-live parts of the reference's LSH utility library
(`src/models/model_utils/hash_utils.py:96-326`). Only `XBOXPLUS` sits on a hot
path (SMYRF clustering; implemented alongside its consumer in
models/attention/smyrf.py); the remaining transforms are provided for API
parity as pure functions, including the families the reference ships but
never calls (Voronoi/cross-polytope LSH, H2-ALSH, QLSH).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array


def l2lsh_k(vec: Array) -> Array:
    """L2-ALSH key transform (hash_utils.py:187-199): normalize by the max
    norm and append |x|^2, |x|^4, |x|^8 columns."""
    norms = jnp.linalg.norm(vec, axis=-1, keepdims=True)
    x = vec / jnp.max(norms, axis=0, keepdims=True)
    n = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return jnp.concatenate([x, n**2, n**4, n**8], axis=-1)


def l2lsh_q(vec: Array) -> Array:
    """L2-ALSH query transform (hash_utils.py:201-206): standardize and pad
    with 0.5 columns."""
    mu = vec.mean(axis=-1, keepdims=True)
    sd = vec.std(axis=-1, keepdims=True)
    x = (vec - mu) / jnp.maximum(sd, 1e-12)
    ext = jnp.full(x.shape[:-1] + (1,), 0.5, x.dtype)
    return jnp.concatenate([x, ext, ext, ext], axis=-1)


def xbox(q: Array, k: Array):
    """XBOX transform (hash_utils.py:209-219): keys padded to the max key
    norm, queries zero-extended."""
    k_norm = jnp.linalg.norm(k, axis=-1, keepdims=True)
    max_norm = jnp.max(k_norm, axis=-2, keepdims=True)
    k_ext = jnp.sqrt(jnp.maximum(max_norm**2 - k_norm**2, 0.0))
    zeros = jnp.zeros(q.shape[:-1] + (1,), q.dtype)
    return (
        jnp.concatenate([q, zeros], axis=-1),
        jnp.concatenate([k, k_ext], axis=-1),
    )


def xbox_max(q: Array, k: Array):
    """XBOXMax (hash_utils.py:240-255): like XBOXPLUS but with max instead of
    sum of the two norm maxima."""
    q_sq = jnp.sum(q * q, axis=-1, keepdims=True)
    k_sq = jnp.sum(k * k, axis=-1, keepdims=True)
    m = jnp.maximum(
        jnp.max(q_sq, axis=-2, keepdims=True), jnp.max(k_sq, axis=-2, keepdims=True)
    )
    q_ext = jnp.sqrt(jnp.maximum(m - q_sq, 0.0))
    k_ext = jnp.sqrt(jnp.maximum(m - k_sq, 0.0))
    z = jnp.zeros_like(q_ext)
    return (
        jnp.concatenate([q, z, q_ext], axis=-1),
        jnp.concatenate([k, k_ext, jnp.zeros_like(k_ext)], axis=-1),
    )


def voronoi_lsh(key: jax.Array, vecs: Array, n_hashes: int, n_anchors: int = 16) -> Array:
    """Voronoi LSH (hash_utils.py:290-311): bucket = argmin distance to a
    random anchor set, one set per hash round. vecs (..., n, d) -> (n_hashes, ..., n)."""
    d = vecs.shape[-1]
    anchors = jax.random.normal(key, (n_hashes, n_anchors, d))
    d2 = (
        jnp.sum(vecs**2, axis=-1)[None, ..., None]
        - 2.0 * jnp.einsum("...nd,had->h...na", vecs, anchors)
        + jnp.sum(anchors**2, axis=-1)[:, None, :].reshape(
            (n_hashes,) + (1,) * (vecs.ndim - 2) + (1, n_anchors)
        )
    )
    return jnp.argmin(d2, axis=-1)


def cross_polytope_lsh(key: jax.Array, vecs: Array, n_hashes: int) -> Array:
    """Cross-polytope LSH (hash_utils.py:314-326): bucket = argmax of
    [Rx; -Rx] under random rotations."""
    d = vecs.shape[-1]
    rot = jax.random.normal(key, (n_hashes, d, d))
    proj = jnp.einsum("...nd,hde->h...ne", vecs, rot)
    both = jnp.concatenate([proj, -proj], axis=-1)
    return jnp.argmax(both, axis=-1)


def sort_key_val(keys: Array, values: Array, axis: int = -1):
    """Sort keys and carry values (hash_utils.py:158-164)."""
    order = jnp.argsort(keys, axis=axis)
    return jnp.take_along_axis(keys, order, axis=axis), jnp.take_along_axis(
        values, order, axis=axis
    )


def hadamard_transform(x: Array) -> Array:
    """Fast Walsh-Hadamard transform along the last axis (power-of-two dim),
    normalized by 1/sqrt(d) (hash_utils.py:96-116's sign-randomized variant
    is this transform after multiplying x by random signs)."""
    d = x.shape[-1]
    assert d & (d - 1) == 0, "dimension must be a power of two"
    h = 1
    y = x
    while h < d:
        y = y.reshape(x.shape[:-1] + (d // (2 * h), 2, h))
        a = y[..., 0, :]
        b = y[..., 1, :]
        y = jnp.stack([a + b, a - b], axis=-2).reshape(x.shape)
        h *= 2
    return y / jnp.sqrt(d)


def inversion_number(x: Array, y: Array) -> Array:
    """Count pairwise order inversions between two rankings
    (hash_utils.py:119-144, a bucketing-quality diagnostic): number of pairs
    (i, j), i<j, whose relative order differs. O(n²) vectorized."""
    rx = jnp.argsort(jnp.argsort(x))
    ry = jnp.argsort(jnp.argsort(y))
    less_x = rx[:, None] < rx[None, :]
    less_y = ry[:, None] < ry[None, :]
    return jnp.sum(jnp.triu(less_x ^ less_y, k=1))


def h2lsh_k(vec: Array) -> Array:
    """H2-ALSH key transform (hash_utils.py:258-270): scale all keys by the
    global max norm, append sqrt(M^2 - |x|^2) so all transformed keys share
    one norm."""
    norms = jnp.linalg.norm(vec, axis=-1, keepdims=True)
    m = jnp.max(norms)
    ext = jnp.sqrt(jnp.maximum(m**2 - norms**2, 0.0))
    return jnp.concatenate([vec, ext], axis=-1)


def h2lsh_q(vec: Array) -> Array:
    """H2-ALSH query transform (hash_utils.py:272-276): unit-normalize and
    zero-extend (queries gain no norm column)."""
    norms = jnp.linalg.norm(vec, axis=-1, keepdims=True)
    x = vec / jnp.maximum(norms, 1e-12)
    return jnp.concatenate([x, jnp.zeros_like(x[..., :1])], axis=-1)


def qlsh_project(key: jax.Array, q: Array, k: Array, n_hashes: int, r: float = 1.0):
    """QLSH (hash_utils.py:353-373): query-centric E2LSH — both sides project
    on shared directions; keys quantize relative to each query's offset.
    Returns (q_proj, k_bucket) with k_bucket = floor((k·a - q·a)/r) per hash."""
    d = q.shape[-1]
    a = jax.random.normal(key, (d, n_hashes), q.dtype)
    qp = q @ a  # (nq, n_hashes)
    kp = k @ a  # (nk, n_hashes)
    rel = kp[None, :, :] - qp[:, None, :]
    return qp, jnp.floor(rel / r).astype(jnp.int32)
