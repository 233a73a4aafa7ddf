"""SMYRF attention baseline: asymmetric LSH clustering + in-bucket softmax.

Rebuilds reference src/models/attention/smyrf.py:56-222: the XBOXPLUS
asymmetric transform equalizes q/k norms, an E2LSH projection (with uniform
beta shift) clusters points, balanced clusters come from argsort, exact
softmax runs within each (q-cluster, k-cluster) pair, and hash rounds combine
via logsumexp weights. "rpe" mode folds the RBF kernel by appending
[ones, -|q|²/2] / [-|k|²/2, ones] columns and clamping logits at 0.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.buckets import gather_rows, invert_permutation
from ..mlp import TorchLinear

MASKED_VALUE = -3.0e38


def xboxplus(q, k):
    """XBOXPLUS transform (reference hash_utils.py:222-237)."""
    q_sq = jnp.sum(q * q, axis=-1, keepdims=True)
    k_sq = jnp.sum(k * k, axis=-1, keepdims=True)
    m = jnp.max(q_sq, axis=-2, keepdims=True) + jnp.max(k_sq, axis=-2, keepdims=True)
    q_ext = jnp.sqrt(jnp.maximum(m - q_sq, 0.0))
    k_ext = jnp.sqrt(jnp.maximum(m - k_sq, 0.0))
    zq = jnp.zeros_like(q_ext)
    q_t = jnp.concatenate([q, zq, q_ext], axis=-1)
    k_t = jnp.concatenate([k, k_ext, jnp.zeros_like(k_ext)], axis=-1)
    return q_t, k_t


class SmyrfAttention(nn.Module):
    h_dim: int
    num_heads: int
    bucket_size: int
    n_hashes: int
    num_w_per_dist: int
    coords_dim: int
    pe_type: str = "learned"
    r: float = 1.0

    @nn.compact
    def __call__(self, query, key, value, *, coords, valid, w_rpe_weight=None, **_):
        n = query.shape[0]
        h, d = self.num_heads, self.h_dim
        c, bs = self.n_hashes, self.bucket_size
        assert n % bs == 0
        nb = n // bs

        # zero invalid rows first: the reference's dense-batch pads are zeros,
        # and XBOXPLUS norms are computed over all rows (hash_utils.py:224-228)
        keep = valid[:, None]
        q = jnp.where(keep, query.reshape(n, h * d), 0.0).reshape(n, h, d).transpose(1, 0, 2)
        k = jnp.where(keep, key.reshape(n, h * d), 0.0).reshape(n, h, d).transpose(1, 0, 2)
        v = jnp.where(keep, value.reshape(n, h * d), 0.0).reshape(n, h, d).transpose(1, 0, 2)

        if "rpe" in self.pe_type:
            w = w_rpe_weight.reshape(h, d, self.coords_dim - 1, self.num_w_per_dist)
            qw = jnp.exp(jnp.minimum(w.sum(axis=1), 50.0)).sum(axis=-1)
            qw_e = jnp.concatenate([qw[:, :1], qw], axis=-1)
            sqrt_w_r = jnp.sqrt(2.0 * qw_e)[:, None, :] * coords[None, :, :]
            q = jnp.concatenate([q, sqrt_w_r], axis=-1)
            k = jnp.concatenate([k, sqrt_w_r], axis=-1)
            softmax_temp = 1.0
            q_t, k_t = q, k  # rpe mode hashes the raw RBF-lifted vectors
        else:
            softmax_temp = 1.0 / math.sqrt(d)
            q_t, k_t = xboxplus(q, k)

        # E2LSH clustering with uniform beta shift (smyrf.py:33-53).
        rng = (
            self.make_rng("rotations")
            if self.has_rng("rotations")
            else jax.random.PRNGKey(0)
        )
        ka, kb = jax.random.split(rng)
        dim_t = q_t.shape[-1]
        alpha = jax.random.normal(ka, (dim_t, c))
        beta = jax.random.uniform(kb, (1, c)) * self.r
        q_hashed = (jnp.einsum("hnd,dc->chn", q_t, alpha) + beta.T[:, :, None])
        k_hashed = (jnp.einsum("hnd,dc->chn", k_t, alpha) + beta.T[:, :, None])
        big = jnp.asarray(3.0e38, jnp.float32)
        q_hashed = jnp.where(valid[None, None, :], q_hashed, big)
        k_hashed = jnp.where(valid[None, None, :], k_hashed, big)
        q_pos = jnp.argsort(jax.lax.stop_gradient(q_hashed), axis=-1)
        k_pos = jnp.argsort(jax.lax.stop_gradient(k_hashed), axis=-1)

        if self.pe_type == "rpe":
            # append [ones, q_sq] / [k_sq, ones] so q̂·k̂ = q·k - ½|q|² - ½|k|²
            q_sq = -0.5 * jnp.sum(q * q, axis=-1, keepdims=True)
            k_sq = -0.5 * jnp.sum(k * k, axis=-1, keepdims=True)
            ones = jnp.ones_like(q_sq)
            q = jnp.concatenate([q, ones, q_sq], axis=-1)
            k = jnp.concatenate([k, k_sq, ones], axis=-1)

        def gather(x, p):  # flat-row gather (core/buckets.gather_rows)
            return gather_rows(x, p)

        dq = q.shape[-1]
        sq = gather(q, q_pos).reshape(c, h, nb, bs, dq)
        sk = gather(k, k_pos).reshape(c, h, nb, bs, dq)
        sv = gather(v, k_pos).reshape(c, h, nb, bs, d)
        s_kvalid = gather(valid.astype(jnp.float32)[None, :, None].repeat(h, 0), k_pos)
        s_kvalid = s_kvalid.reshape(c, h, nb, bs)

        inner = jnp.einsum("chbie,chbje->chbij", sq, sk)
        if "rpe" in self.pe_type:
            inner = jnp.minimum(inner, 0.0)
        inner = inner * softmax_temp
        inner = jnp.where(s_kvalid[:, :, :, None, :] > 0.5, inner, MASKED_VALUE)

        lse = jax.nn.logsumexp(inner, axis=-1, keepdims=True)
        dots = jnp.exp(inner - lse)
        # zero fully-masked rows (smyrf.py:195-197)
        full_row_mask = jnp.all(inner <= MASKED_VALUE, axis=-1, keepdims=True)
        dots = jnp.where(full_row_mask, 0.0, dots)
        so = jnp.einsum("chbij,chbjd->chbid", dots, sv)

        q_inv = invert_permutation(q_pos)
        o = gather_rows(so.reshape(c, h, n, d), q_inv)
        logits = gather_rows(lse.reshape(c, h, n, 1), q_inv)
        probs = jnp.exp(logits - jax.nn.logsumexp(logits, axis=0, keepdims=True))
        out = jnp.sum(o * probs, axis=0)
        out = out.transpose(1, 0, 2).reshape(n, h * d)
        return TorchLinear(d, name="out_linear")(out)
