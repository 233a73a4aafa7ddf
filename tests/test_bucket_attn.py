"""Property tests for HEPT bucket attention (XLA path).

Key invariants (SURVEY.md §4): block attention equals dense RBF attention when
one bucket covers all points; OR-combination over identical hashes is a no-op;
bucketing with AND codes never mixes different code groups.
"""

import jax
import jax.numpy as jnp
import numpy as np

from hept_tpu.core import e2lsh_init
from hept_tpu.ops import (
    bucket_rbf_attention_xla,
    dense_rbf_attention,
    hept_attention_core,
)


def _rand_qkv(key, h, n, d, dv):
    kq, kk, kv = jax.random.split(key, 3)
    return (
        jax.random.normal(kq, (h, n, d)),
        jax.random.normal(kk, (h, n, d)),
        jax.random.normal(kv, (h, n, dv)),
    )


class TestBucketEqualsDense:
    def test_single_bucket_covers_all(self):
        h, n, d, dv, c = 2, 32, 6, 5, 3
        q, k, v = _rand_qkv(jax.random.PRNGKey(0), h, n, d, dv)
        alpha = e2lsh_init(jax.random.PRNGKey(1), h, d, c)
        codes = jnp.zeros((c, h, n))
        out = hept_attention_core(q, k, v, alpha, codes, block_size=n, impl="xla")
        expected = dense_rbf_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-5, atol=1e-5)

    def test_two_groups_block_diagonal(self):
        # Points in two well-separated AND-code groups of size B each:
        # bucketed attention == dense attention within each group.
        h, d, dv, c, bs = 1, 4, 3, 2, 16
        n = 2 * bs
        q, k, v = _rand_qkv(jax.random.PRNGKey(2), h, n, d, dv)
        alpha = e2lsh_init(jax.random.PRNGKey(3), h, d, c)
        group = (jnp.arange(n) >= bs).astype(jnp.float32)
        codes = jnp.broadcast_to(group[None, None, :], (c, h, n)) * 1000.0
        out = hept_attention_core(q, k, v, alpha, codes, block_size=bs, impl="xla")
        for g in range(2):
            sel = slice(g * bs, (g + 1) * bs)
            expected = dense_rbf_attention(q[:, sel], k[:, sel], v[:, sel])
            np.testing.assert_allclose(
                np.asarray(out[:, sel]), np.asarray(expected), rtol=1e-4, atol=1e-5
            )


class TestQkvRes:
    def test_matches_manual(self):
        g, b, d, dv = 4, 8, 5, 3
        key = jax.random.PRNGKey(4)
        sq = jax.random.normal(key, (g, b, d))
        sk = jax.random.normal(jax.random.PRNGKey(5), (g, b, d))
        sv = jax.random.normal(jax.random.PRNGKey(6), (g, b, dv))
        denom, so = bucket_rbf_attention_xla(sq, sk, sv)
        # manual numpy
        q2 = -0.5 * (np.asarray(sq) ** 2).sum(-1, keepdims=True)
        k2 = -0.5 * (np.asarray(sk) ** 2).sum(-1, keepdims=True)
        logits = np.einsum("gid,gjd->gij", np.asarray(sq), np.asarray(sk))
        p = np.exp(np.minimum(logits + q2 + k2.transpose(0, 2, 1), 0.0))
        np.testing.assert_allclose(
            np.asarray(denom), p.sum(-1, keepdims=True) + 1e-20, rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(so), np.einsum("gij,gjd->gid", p, np.asarray(sv)), rtol=1e-3, atol=1e-5
        )

    def test_attention_weights_at_most_one(self):
        # clamp(max=0) then exp => weights in (0, 1]; self-attention weight is
        # exactly 1 when q == k (distance 0).
        g, b, d = 1, 4, 3
        x = jax.random.normal(jax.random.PRNGKey(7), (g, b, d))
        denom, so = bucket_rbf_attention_xla(x, x, x)
        assert np.all(np.asarray(denom) >= 1.0)  # self weight contributes 1


class TestOrCombine:
    def test_identical_hashes_average(self):
        # With identical alpha columns and identical codes across hashes, all
        # rounds produce the same num/denom, so the OR-combine must equal the
        # single-hash result.
        h, n, d, dv = 2, 24, 5, 4
        q, k, v = _rand_qkv(jax.random.PRNGKey(8), h, n, d, dv)
        a1 = e2lsh_init(jax.random.PRNGKey(9), h, d, 1)
        a3 = jnp.tile(a1, (1, 1, 3))
        codes1 = jnp.zeros((1, h, n))
        codes3 = jnp.zeros((3, h, n))
        out1 = hept_attention_core(q, k, v, a1, codes1, block_size=8, impl="xla")
        out3 = hept_attention_core(q, k, v, a3, codes3, block_size=8, impl="xla")
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out3), rtol=1e-5, atol=1e-6)


class TestInvalidMask:
    def test_invalid_rows_sort_last_and_dont_touch_real(self):
        # n=32, 16 real + 16 invalid; bs=16 -> invalid rows form their own
        # bucket; real outputs must match the 16-point dense attention.
        h, d, dv, c, bs = 1, 4, 3, 2, 16
        n = 2 * bs
        q, k, v = _rand_qkv(jax.random.PRNGKey(10), h, n, d, dv)
        invalid = jnp.arange(n) >= bs
        qz = jnp.where(invalid[None, :, None], 0.0, q)
        kz = jnp.where(invalid[None, :, None], 0.0, k)
        vz = jnp.where(invalid[None, :, None], 0.0, v)
        alpha = e2lsh_init(jax.random.PRNGKey(11), h, d, c)
        codes = jnp.zeros((c, h, n))
        out = hept_attention_core(
            qz, kz, vz, alpha, codes, invalid, block_size=bs, impl="xla"
        )
        expected = dense_rbf_attention(q[:, :bs], k[:, :bs], v[:, :bs])
        np.testing.assert_allclose(
            np.asarray(out[:, :bs]), np.asarray(expected), rtol=1e-4, atol=1e-5
        )

    def test_gradients_flow(self):
        h, n, d, dv, c, bs = 2, 16, 4, 3, 2, 8
        q, k, v = _rand_qkv(jax.random.PRNGKey(12), h, n, d, dv)
        alpha = e2lsh_init(jax.random.PRNGKey(13), h, d, c)
        codes = jnp.zeros((c, h, n))

        def loss(q, k, v):
            return hept_attention_core(q, k, v, alpha, codes, block_size=bs).sum()

        grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        for g in grads:
            assert np.isfinite(np.asarray(g)).all()
            assert np.abs(np.asarray(g)).max() > 0


class TestStableRatio:
    """Regression: reference DENOM_EPS=1e-20 must not NaN the backward pass
    when attention rows fully underflow (den**2 underflows f32)."""

    def test_empty_row_grads_finite(self):
        from hept_tpu.ops.bucket_attn import stable_ratio

        num = jnp.zeros((2, 4, 8))
        den = jnp.full((2, 1, 8), 1e-20)

        def loss(n, d):
            return jnp.sum(stable_ratio(n, d) ** 2) + jnp.sum(stable_ratio(n, d))

        gn, gd = jax.grad(loss, argnums=(0, 1))(num, den)
        assert bool(jnp.isfinite(gn).all()) and bool(jnp.isfinite(gd).all())

    def test_matches_plain_division_grads(self):
        from hept_tpu.ops.bucket_attn import stable_ratio

        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        num = jax.random.normal(k1, (3, 5, 7))
        den = jnp.abs(jax.random.normal(k2, (3, 1, 7))) + 0.5

        g1 = jax.grad(lambda n, d: jnp.sum((n / d) ** 3), argnums=(0, 1))(num, den)
        g2 = jax.grad(lambda n, d: jnp.sum(stable_ratio(n, d) ** 3), argnums=(0, 1))(num, den)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)

    def test_attention_far_clusters_grads_finite(self):
        # two far-apart point clusters force fully-underflowed rows when the
        # q and k sorts disagree; grads must stay finite at DENOM_EPS=1e-20.
        from hept_tpu.core.hashing import e2lsh_init
        from hept_tpu.ops.bucket_attn import hept_attention_core_cols

        h, n, d, dv, c, bs = 2, 64, 6, 4, 2, 8
        k = jax.random.PRNGKey(3)
        q = jax.random.normal(k, (h, d, n)) * 60.0  # huge magnitudes
        v = jax.random.normal(k, (h, dv, n))
        alpha = e2lsh_init(k, h, d, c)
        codes = jnp.zeros((c, h, n), jnp.float32)

        def loss(q, v):
            out = hept_attention_core_cols(q, q * -1.0, v, alpha, codes, None,
                                           block_size=bs, impl="xla")
            return jnp.sum(out ** 2)

        gq, gv = jax.grad(loss, argnums=(0, 1))(q, v)
        assert bool(jnp.isfinite(gq).all()) and bool(jnp.isfinite(gv).all())
