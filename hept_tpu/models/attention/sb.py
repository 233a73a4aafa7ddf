"""Scatterbrain (SB) attention baseline: SMYRF sparse + Performer low-rank.

Rebuilds reference src/models/attention/sb.py:66-278 + feature_maps_sb.py:
locally-sensitive clusters get exact softmax attention with the low-rank
estimate subtracted in-bucket (so it is not double counted), a global FAVOR+
linear-attention term adds the long-range mass, and hash rounds combine with
logsumexp weights. Duplicate (q, k) pairs across rounds are down-weighted by
their count.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.buckets import gather_rows, invert_permutation
from ...ops.rff import gaussian_orthogonal_random_matrix
from ..mlp import TorchLinear
from .smyrf import xboxplus

MASKED_VALUE = -3.0e38


def sb_softmax_kernel(data, projection, is_query, softmax_temp):
    """cosh-variant FAVOR features returning (features, log_scale)
    (feature_maps_sb.py:52-83)."""
    m = 2 * projection.shape[0]
    normalizer = math.sqrt(softmax_temp)
    data_dash = jnp.einsum("...id,jd->...ij", data, normalizer * projection)
    diag = jnp.sum(data**2, axis=-1, keepdims=True) / 2 * softmax_temp
    data_dash = jnp.concatenate([data_dash, -data_dash], axis=-1)
    if is_query:
        amax = jnp.max(data_dash, axis=-1, keepdims=True)
        log_scale = -diag + amax - math.log(m) / 2
        feats = jnp.exp(data_dash - amax)
    else:
        dmd = data_dash - diag - math.log(m) / 2
        log_scale = jnp.max(dmd, axis=(-1, -2), keepdims=True)
        feats = jnp.exp(dmd - log_scale)
    return feats, log_scale


class SBAttention(nn.Module):
    h_dim: int
    num_heads: int
    bucket_size: int
    n_hashes: int
    nb_features: int
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
        softmax_temp = 1.0 / math.sqrt(d)

        keep = valid[:, None]
        q = jnp.where(keep, query.reshape(n, h * d), 0.0).reshape(n, h, d).transpose(1, 0, 2)
        k = jnp.where(keep, key.reshape(n, h * d), 0.0).reshape(n, h, d).transpose(1, 0, 2)
        v = jnp.where(keep, value.reshape(n, h * d), 0.0).reshape(n, h, d).transpose(1, 0, 2)

        # ---- LSH clustering (XBOXPLUS + E2LSH with beta) ----
        q_t, k_t = xboxplus(q, k)
        rng = (
            self.make_rng("rotations")
            if self.has_rng("rotations")
            else jax.random.PRNGKey(0)
        )
        ka, kb = jax.random.split(rng)
        dim_t = q_t.shape[-1]
        alpha = jax.random.normal(ka, (dim_t, c))
        beta = jax.random.uniform(kb, (1, c)) * self.r
        big = jnp.asarray(3.0e38, jnp.float32)
        q_hashed = jnp.einsum("hnd,dc->chn", q_t, alpha) + beta.T[:, :, None]
        k_hashed = jnp.einsum("hnd,dc->chn", k_t, alpha) + beta.T[:, :, None]
        q_hashed = jnp.where(valid[None, None, :], q_hashed, big)
        k_hashed = jnp.where(valid[None, None, :], k_hashed, big)
        q_pos = jnp.argsort(jax.lax.stop_gradient(q_hashed), axis=-1)
        k_pos = jnp.argsort(jax.lax.stop_gradient(k_hashed), axis=-1)

        # ---- Performer features (global low-rank part) ----
        projection = self.variable(
            "constants", "sb_projection",
            lambda: gaussian_orthogonal_random_matrix(
                self.make_rng("params"), self.nb_features // 2, d, scaling=0
            ),
        ).value
        q_prime, q_log = sb_softmax_kernel(q, projection, True, softmax_temp)
        k_prime, k_log = sb_softmax_kernel(k, projection, False, softmax_temp)
        prime_log_scale = q_log + k_log  # (h, n, 1)
        k_prime = jnp.where(valid[None, :, None], k_prime, 0.0)

        qk1 = jnp.einsum("hnm,hm->hn", q_prime, k_prime.sum(axis=-2))
        context = jnp.einsum("hnm,hne->hme", k_prime, v)
        qkv = jnp.einsum("hme,hnm->hne", context, q_prime)

        # ---- sparse in-bucket part ----
        def gather(x, p):  # flat-row gather (core/buckets.gather_rows)
            return gather_rows(x, p)

        sq = gather(q, q_pos).reshape(c, h, nb, bs, d)
        sk = gather(k, k_pos).reshape(c, h, nb, bs, d)
        sv = gather(v, k_pos).reshape(c, h, nb, bs, d)
        sqp = gather(q_prime, q_pos).reshape(c, h, nb, bs, -1)
        skp = gather(k_prime, k_pos).reshape(c, h, nb, bs, -1)
        s_log = gather(prime_log_scale, q_pos).reshape(c, h, nb, bs, 1)
        s_kvalid = gather(valid.astype(jnp.float32)[None, :, None].repeat(h, 0), k_pos)
        s_kvalid = s_kvalid.reshape(c, h, nb, 1, bs)

        inner = jnp.einsum("chbie,chbje->chbij", sq, sk) * softmax_temp
        dots_prime = jnp.einsum("chbim,chbjm->chbij", sqp, skp)
        inner = jnp.where(s_kvalid > 0.5, inner, MASKED_VALUE)
        dots_prime = jnp.where(s_kvalid > 0.5, dots_prime, 0.0)

        q_rev = invert_permutation(q_pos)
        if c > 1:
            # duplicate-pair correction (sb.py:204-218)
            k_rev = invert_permutation(k_pos)
            q_bidx = (q_rev // bs).transpose(1, 2, 0)  # (h, n, c)
            k_bidx = (k_rev // bs).transpose(1, 2, 0)
            s_qb = gather(q_bidx, q_pos).reshape(c, h, nb, bs, -1)
            s_kb = gather(k_bidx, k_pos).reshape(c, h, nb, bs, -1)
            dup = jnp.sum(
                s_qb[..., :, None, :] == s_kb[..., None, :, :], axis=-1
            ).astype(jnp.float32)
            dup = jax.lax.stop_gradient(jnp.maximum(dup, 1.0))
            inner = inner - jnp.log(dup)
            dots_prime = dots_prime / dup

        lse = jnp.maximum(jnp.max(inner, axis=-1, keepdims=True), s_log)
        prime_scale_b = jnp.exp(s_log - lse)
        dots = jnp.exp(inner - lse) - dots_prime * prime_scale_b
        dots_sum = jnp.sum(dots, axis=-1, keepdims=True)
        so = jnp.einsum("chbij,chbjd->chbid", dots, sv)

        def unsort(x, e):
            return gather_rows(x.reshape(c, h, n, e), q_rev)

        o = unsort(so, d)
        logits = unsort(lse, 1)
        dsum = unsort(dots_sum, 1)

        norm_log_scale = jax.nn.logsumexp(logits, axis=0)  # (h, n, 1)
        probs = jnp.exp(logits - norm_log_scale[None])
        out_lsh = jnp.sum(o * probs, axis=0)  # (h, n, d)

        prime_scale = jnp.exp(prime_log_scale - norm_log_scale)
        out = out_lsh + qkv * prime_scale
        normalization = jnp.sum(dsum * probs, axis=0) + qk1[..., None] * prime_scale
        out = out / jnp.maximum(normalization, 1e-6)
        out = out.transpose(1, 0, 2).reshape(n, h * d)
        return TorchLinear(d, name="out_linear")(out)
