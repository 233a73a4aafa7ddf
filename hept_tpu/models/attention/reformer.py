"""Reformer LSH attention baseline.

Rebuilds reference src/models/attention/reformer.py:69-309 per-event:
argmax-of-random-rotations bucketing, stable sort, look-one-back key windows,
self-attention masking, padded-key masking, and logsumexp OR-combination
across hash rounds. Random rotations are drawn fresh each forward from a
"rotations" rng stream (the reference draws torch.randn per call and caches
per training step for reversible nets; with a fixed rng key per apply the
behavior is deterministic under jit).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.buckets import gather_rows, invert_permutation
from ..mlp import TorchLinear

TOKEN_SELF_ATTN_VALUE = -5e4
MASKED_VALUE = -3.0e38


class ReformerAttention(nn.Module):
    h_dim: int
    num_heads: int
    bucket_size: int
    n_hashes: int
    # Reference reformer.py:74-76 defaults: duplicate (q,k) pairs across hash
    # rounds are NOT corrected and buckets of different ids that share a
    # sorted block DO attend. Setting allow_duplicate_attention=False enables
    # the count-based down-weighting of reference reformer.py:266-285;
    # attend_across_buckets=False enables the bucket-id mask of lines 250-259.
    allow_duplicate_attention: bool = True
    attend_across_buckets: bool = True

    @nn.compact
    def __call__(self, qk, key, value, *, valid, **_):
        # Reformer shares q=k (reference line 153 ignores `key`).
        del key
        n = qk.shape[0]
        h, d = self.num_heads, self.h_dim
        c, bs = self.n_hashes, self.bucket_size
        assert n % (2 * bs) == 0, "n must be divisible by 2*bucket_size"
        n_buckets = n // bs
        softmax_temp = 1.0 / math.sqrt(d)

        # zero invalid rows (the reference's dense-batch pads are zeros)
        keep = valid[:, None]
        qk = jnp.where(keep, qk, 0.0).reshape(n, h, d).transpose(1, 0, 2)  # (h, n, d)
        v = jnp.where(keep, value, 0.0).reshape(n, h, d).transpose(1, 0, 2)

        # Random rotations: one set shared across heads (reference
        # rotations_shape batch dim 1, line 116-123), n_buckets//2 columns.
        rot = jax.random.normal(
            self.make_rng("rotations") if self.has_rng("rotations")
            else jax.random.PRNGKey(0),
            (d, c, n_buckets // 2),
        )
        rotated = jnp.einsum("hnd,dci->chni", qk, rot)
        rotated = jnp.concatenate([rotated, -rotated], axis=-1)
        buckets = jnp.argmax(rotated, axis=-1)  # (c, h, n)
        # invalid rows to the last bucket so they sort last
        buckets = jnp.where(valid[None, None, :], buckets, n_buckets - 1)
        buckets = jax.lax.stop_gradient(buckets)

        # stable sort by bucket id
        perm = jnp.argsort(buckets, axis=-1, stable=True)  # (c, h, n)
        perm_inv = invert_permutation(perm)

        def gather(x, p):  # x (h, n, e), p (c, h, n) -> (c, h, n, e)
            return gather_rows(x, p)

        qk_norm = qk / jnp.maximum(
            jnp.linalg.norm(qk, axis=-1, keepdims=True), 1e-12
        )
        sq = gather(qk, perm).reshape(c, h, n_buckets, bs, d)
        sperm = perm.reshape(c, h, n_buckets, bs)

        def look_one_back(x):  # (c, h, nb, bs, ...) -> (c, h, nb, 2bs, ...)
            prev = jnp.roll(x, 1, axis=2)
            return jnp.concatenate([x, prev], axis=3)

        sk = look_one_back(gather(qk_norm, perm).reshape(c, h, n_buckets, bs, d))
        sv = look_one_back(gather(v, perm).reshape(c, h, n_buckets, bs, d))
        skidx = look_one_back(
            sperm[..., None]
        )  # (c, h, nb, 2bs, 1) original indices of keys
        svalid = look_one_back(
            gather(valid[None, :, None].astype(jnp.float32).repeat(h, 0), perm)
            .reshape(c, h, n_buckets, bs, 1)
        )

        inner = jnp.einsum("chbie,chbje->chbij", sq, sk) * softmax_temp
        # mask padded keys
        inner = jnp.where(svalid[..., 0][:, :, :, None, :] > 0.5, inner, MASKED_VALUE)
        # mask self-attention (qk == key index) to -5e4
        self_mask = sperm[..., :, None] == skidx[..., None, :, 0]
        inner = jnp.where(self_mask, TOKEN_SELF_ATTN_VALUE, inner)

        if not self.attend_across_buckets:
            # mask attention to keys whose bucket id differs from the query's
            # (reference reformer.py:250-259): blocks are rank-partitioned, so
            # a sorted block can straddle two bucket ids.
            sbuckets = gather(buckets.transpose(1, 2, 0), perm)
            # (c, h, n, c): per round's sort, every round's bucket ids; pick
            # each round's own column
            own = jnp.take_along_axis(
                sbuckets, jnp.arange(c)[:, None, None, None], axis=-1
            ).reshape(c, h, n_buckets, bs)
            bq_b = own[..., :, None]
            bkv_b = look_one_back(own.reshape(c, h, n_buckets, bs, 1))[..., 0]
            inner = jnp.where(
                bq_b != bkv_b[..., None, :], MASKED_VALUE, inner
            )

        if not self.allow_duplicate_attention:
            # Count how many hash rounds each (q, k) pair co-attends in and
            # down-weight its log-prob by log(count) so OR-combination does
            # not double-count (reference reformer.py:261-285). A pair meets
            # in round r if q's rank-bucket equals k's, or equals k's + 1
            # (k visible through look-one-back).
            locs1 = jnp.swapaxes(perm_inv // bs, 0, 1).transpose(0, 2, 1)
            # locs1: (h, n, c) rank-bucket of each point in each round
            locs2 = (locs1 + 1) % n_buckets
            if not self.attend_across_buckets:
                bb = jnp.swapaxes(buckets, 0, 1).transpose(0, 2, 1)  # (h,n,c)
                locs1 = bb * n_buckets + locs1
                locs2 = bb * n_buckets + locs2
            locs = jnp.concatenate([locs1, locs2], axis=-1)  # (h, n, 2c)
            slocs = gather(locs, perm).reshape(c, h, n_buckets, bs, 2 * c)
            bkv_locs = look_one_back(slocs)  # (c, h, nb, 2bs, 2c)
            # chunked over rounds to avoid a (.., bs, 2bs, 2c) bool blow-up
            # (reference chunked_sum, reformer.py:282)
            dup = jnp.zeros(inner.shape, jnp.float32)
            for r in range(2 * c):
                q_r = slocs[..., r % c][..., :, None]  # q locs1 tiled (2 nh)
                k_r = bkv_locs[..., r][..., None, :]
                dup = dup + (q_r == k_r).astype(jnp.float32)
            dup = jax.lax.stop_gradient(dup)
            inner = inner - jnp.log(dup + 1e-9)

        lse = jax.nn.logsumexp(inner, axis=-1, keepdims=True)
        dots = jnp.exp(inner - lse)
        so = jnp.einsum("chbij,chbjd->chbid", dots, sv)

        def unsort(x, e):
            return gather_rows(x.reshape(c, h, n, e), perm_inv)

        o = unsort(so, d)  # (c, h, n, d)
        logits = unsort(lse, 1)  # (c, h, n, 1)
        probs = jnp.exp(logits - jax.nn.logsumexp(logits, axis=0, keepdims=True))
        out = jnp.sum(o * probs, axis=0)  # (h, n, d)
        out = out.transpose(1, 0, 2).reshape(n, h * d)
        return TorchLinear(d, name="out_linear")(out)
