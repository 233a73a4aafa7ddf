"""FLT: Fourier-learned-transform attention baseline (arXiv 2302.01925).

Rebuilds reference src/models/attention/flt.py:30-113: learnable distance
weights split into (dR, dAngle) groups; each coordinate group is lifted with
random Fourier features, concatenated to q/k, then run through Performer's
softmax-kernel linear attention.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from flax import linen as nn

from ...ops.rff import (
    gaussian_orthogonal_random_matrix,
    linear_attention,
    orthogonal_gaussian,
    rff_features,
    softmax_kernel,
)
from ..mlp import TorchLinear


class FLTAttention(nn.Module):
    h_dim: int
    num_heads: int
    nb_features: int
    nb_features_inner: int
    num_w_per_dist: int
    coords_dim: int  # FULL coords dim (reference passes coords_dim-1 as its ctor arg)
    softmax_eps: float = 1e-6
    normalization_eps: float = 1e-6

    @nn.compact
    def __call__(self, query, key, value, *, coords, valid, w_rpe_weight=None, **_):
        n = query.shape[0]
        h, d = self.num_heads, self.h_dim
        cd = self.coords_dim
        q = query.reshape(n, h, d).transpose(1, 0, 2)  # (h, n, d)
        k = key.reshape(n, h, d).transpose(1, 0, 2)
        v = value.reshape(n, h, d).transpose(1, 0, 2)

        softmax_temp = 1.0 / math.sqrt(d)

        # w_rpe reshape "(h d) (r c k)" with c=2 groups (alpha, qw) and
        # k = num_w_per_dist // 2 (flt.py:76-84).
        kk = self.num_w_per_dist // 2
        w = w_rpe_weight.reshape(h, d, cd - 1, 2, kk).transpose(3, 0, 1, 2, 4)
        summed = jnp.exp(jnp.minimum(w.sum(axis=2), 50.0)).sum(axis=-1)  # (2, h, r)
        alpha, qw = summed[0], summed[1]  # (h, cd-1) each
        qw_e = jnp.concatenate([qw[:, :1], qw], axis=-1)  # (h, cd)
        sqrt_w_r = jnp.sqrt(qw_e)[:, None, :] * coords[None, :, :]  # (h, n, cd)

        omega_dr = self.variable(
            "constants", "rff_omega_dr",
            lambda: orthogonal_gaussian(self.make_rng("params"), 2, self.nb_features_inner),
        ).value
        omega_da = self.variable(
            "constants", "rff_omega_da",
            lambda: orthogonal_gaussian(self.make_rng("params"), 1, self.nb_features_inner),
        ).value

        d_r = sqrt_w_r[..., :2][..., None, :]  # (h, n, 1, 2)
        d_angle = sqrt_w_r[..., 2:][..., None]  # (h, n, cd-2, 1)
        phi_dr = rff_features(d_r, omega_dr)  # (h, n, 1, m)
        phi_da = rff_features(d_angle, omega_da)  # (h, n, cd-2, m)
        phi = jnp.concatenate([phi_dr, phi_da], axis=-2)  # (h, n, cd-1, m)
        phi = phi * jnp.sqrt(alpha)[:, None, :, None]
        phi = phi.reshape(h, n, (cd - 1) * self.nb_features_inner)

        q_cat = jnp.concatenate([q * math.sqrt(softmax_temp), phi], axis=-1)
        k_cat = jnp.concatenate([k * math.sqrt(softmax_temp), phi], axis=-1)

        ncols = d + (cd - 1) * self.nb_features_inner
        projection = self.variable(
            "constants", "projection_matrix",
            lambda: gaussian_orthogonal_random_matrix(
                self.make_rng("params"), self.nb_features, ncols, scaling=0
            ),
        ).value
        qf = softmax_kernel(q_cat, projection, is_query=True, softmax_temp=1.0,
                            eps=self.softmax_eps)
        kf = softmax_kernel(k_cat, projection, is_query=False, softmax_temp=1.0,
                            eps=self.softmax_eps)
        kf = jnp.where(valid[None, :, None], kf, 0.0)
        out = linear_attention(qf, kf, v, eps=self.normalization_eps)
        out = out.transpose(1, 0, 2).reshape(n, h * d)
        return TorchLinear(d, name="out_linear")(out)
