"""Performer (FAVOR+) linear attention baseline.

Rebuilds reference src/models/attention/performer.py:31-100 for the
per-event static layout: softmax-kernel random features + linear attention;
"rpe" mode folds the RBF distance kernel into a Favor feature map with
per-token log offsets. The frozen projection matrices live in the
"constants" collection (the reference registers them as buffers / feature
maps drawn at init).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.rff import (
    favor_features,
    gaussian_orthogonal_random_matrix,
    linear_attention,
    orthogonal_gaussian,
    softmax_kernel,
)
from ..mlp import TorchLinear


class PerformerAttention(nn.Module):
    h_dim: int
    num_heads: int
    nb_features: int
    num_w_per_dist: int
    coords_dim: int
    pe_type: str = "learned"
    softmax_eps: float = 1e-6
    normalization_eps: float = 1e-6

    @nn.compact
    def __call__(self, query, key, value, *, coords, valid, w_rpe_weight=None, **_):
        n = query.shape[0]
        h, d = self.num_heads, self.h_dim
        q = query.reshape(n, h, d).transpose(1, 0, 2)  # (h, n, d)
        k = key.reshape(n, h, d).transpose(1, 0, 2)
        v = value.reshape(n, h, d).transpose(1, 0, 2)

        if self.pe_type == "rpe":
            omega = self.variable(
                "constants",
                "favor_omega",
                lambda: orthogonal_gaussian(
                    self.make_rng("params"), d + self.coords_dim, self.nb_features
                ),
            ).value
            w = w_rpe_weight.reshape(h, d, self.coords_dim - 1, self.num_w_per_dist)
            qw = jnp.exp(jnp.minimum(w.sum(axis=1), 50.0)).sum(axis=-1)
            qw_e = jnp.concatenate([qw[:, :1], qw], axis=-1)  # (h, cd)
            sqrt_w_r = jnp.sqrt(2.0 * qw_e)[:, None, :] * coords[None, :, :]  # (h, n, cd)
            q_sq = -0.5 * jnp.sum(q * q, axis=-1, keepdims=True)
            k_sq = -0.5 * jnp.sum(k * k, axis=-1, keepdims=True)
            w_r = -jnp.sum(sqrt_w_r * sqrt_w_r, axis=-1, keepdims=True)
            q_cat = jnp.concatenate([q, sqrt_w_r], axis=-1)
            k_cat = jnp.concatenate([k, sqrt_w_r], axis=-1)
            q = favor_features(q_cat, omega, q_sq + w_r)
            k = favor_features(k_cat, omega, k_sq + w_r)
        else:
            projection = self.variable(
                "constants",
                "projection_matrix",
                lambda: gaussian_orthogonal_random_matrix(
                    self.make_rng("params"), self.nb_features, d, scaling=0
                ),
            ).value
            q = softmax_kernel(q, projection, is_query=True, eps=self.softmax_eps)
            k = softmax_kernel(k, projection, is_query=False, eps=self.softmax_eps)

        k = jnp.where(valid[None, :, None], k, 0.0)
        out = linear_attention(q, k, v, eps=self.normalization_eps)  # (h, n, d)
        out = out.transpose(1, 0, 2).reshape(n, h * d)
        return TorchLinear(d, name="out_linear")(out)
