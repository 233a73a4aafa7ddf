"""canon_residual fast mode: exact-equivalence to static_keys.

Unlike the bucket-composition divergences (shared_sort/share_heads/
static_keys), canonical-residual is a pure STORAGE reordering: the residual
stream rides in round-0 sorted order, round 0 skips its x-gather and output
unsort, rounds 1.. use composed permutations. Same buckets, same per-bucket
math, row-local layers — so with packing off the model output must match the
static_keys path exactly, and no new convergence gate is needed.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hept_tpu.ops.bucket_attn import (
    hept_attention_core_xcols,
    static_bucket_plan,
)

C, NEV, NE = 3, 2, 512


def test_canonical_plan_composed_maps():
    rng = np.random.default_rng(0)
    n = NEV * NE
    hashed = jnp.asarray(rng.normal(size=(C, n)).astype(np.float32))
    codes = jnp.asarray(rng.integers(0, 5, size=(C, n)).astype(np.float32))
    coords = jnp.asarray(rng.normal(size=(3, n)).astype(np.float32))
    src, inv, scoords, f, finv = static_bucket_plan(
        hashed, codes, None, coords, sort_events=NEV, canonical=True
    )
    src, inv, f, finv = map(np.asarray, (src, inv, f, finv))
    ar = np.arange(NE)
    # f[0] is the identity (canonical order IS round 0's order)
    np.testing.assert_array_equal(f[0], np.broadcast_to(ar, (NEV, NE)))
    for r in range(C):
        for b in range(NEV):
            # f maps round-r slots to canonical positions:
            # sorted_r[s] = orig[src_r[s]] = canon[f_r[s]]
            np.testing.assert_array_equal(src[0, b][f[r, b]], src[r, b])
            # finv inverts f
            np.testing.assert_array_equal(f[r, b][finv[r, b]], ar)


def _core_inputs(seed=7):
    rng = np.random.default_rng(seed)
    h, d_model, d, cd, c = 4, 16, 16, 3, 3
    n, block = 512, 32
    x_cols = jnp.asarray(rng.normal(size=(d_model, n)).astype(np.float32))
    coords_cols = jnp.asarray(rng.normal(size=(cd, n)).astype(np.float32))
    wq, wk, wv = (
        jnp.asarray(rng.normal(size=(h, d_model, d)).astype(np.float32) * 0.2)
        for _ in range(3)
    )
    sqrt_w = jnp.abs(
        jnp.asarray(rng.normal(size=(h, cd)).astype(np.float32))
    ) + 0.5
    alpha = jnp.asarray(
        rng.normal(size=(1, d_model + cd, c)).astype(np.float32)
    )
    codes = jnp.asarray(
        np.broadcast_to(
            rng.integers(0, 4, size=(c, 1, n)), (c, h, n)
        ).astype(np.float32)
    )
    # the share_heads key computation, as the model's static_hash would
    a1, a2 = alpha[0, :d_model, :], alpha[0, d_model:, :]
    gamma = sqrt_w.mean(axis=0)[:, None] * a2
    hashed = (
        jnp.einsum("ec,en->cn", a1, x_cols)
        + jnp.einsum("rc,rn->cn", gamma, coords_cols)
    )
    return (x_cols, coords_cols, wq, wk, wv, sqrt_w, alpha, codes, hashed,
            block)


def test_core_canon_matches_static_exactly():
    (x_cols, coords_cols, wq, wk, wv, sqrt_w, alpha, codes, hashed,
     block) = _core_inputs()
    kwargs = dict(
        block_size=block, impl="xla", sort_pack=False, shared_sort=True,
        share_heads=True,
    )
    plan3 = static_bucket_plan(hashed, codes[:, 0], None, coords_cols)
    want = hept_attention_core_xcols(
        x_cols, coords_cols, wq, wk, wv, sqrt_w, alpha, codes, None, plan3,
        **kwargs,
    )  # (h, d, n) original order

    plan5 = static_bucket_plan(
        hashed, codes[:, 0], None, coords_cols, canonical=True
    )
    src0 = np.asarray(plan5[0][0, 0])
    x_canon = x_cols[:, src0]
    got_c = hept_attention_core_xcols(
        x_canon, coords_cols, wq, wk, wv, sqrt_w, alpha, codes, None, plan5,
        canon=True, **kwargs,
    )  # (h, d, n) canonical order
    inv0 = np.asarray(plan5[1][0, 0])
    got = np.asarray(got_c)[:, :, inv0]
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-6, atol=1e-7)


def test_core_canon_grads_match_static():
    (x_cols, coords_cols, wq, wk, wv, sqrt_w, alpha, codes, hashed,
     block) = _core_inputs(seed=9)
    kwargs = dict(
        block_size=block, impl="xla", sort_pack=False, shared_sort=True,
        share_heads=True,
    )
    plan3 = static_bucket_plan(hashed, codes[:, 0], None, coords_cols)
    plan5 = static_bucket_plan(
        hashed, codes[:, 0], None, coords_cols, canonical=True
    )
    src0 = jnp.asarray(np.asarray(plan5[0][0, 0]))
    inv0 = jnp.asarray(np.asarray(plan5[1][0, 0]))
    w = jnp.asarray(
        np.random.default_rng(10).normal(
            size=(wq.shape[0], wq.shape[2], x_cols.shape[1])
        ).astype(np.float32)
    )

    def loss_static(xc, wq_, wv_):
        o = hept_attention_core_xcols(
            xc, coords_cols, wq_, wk, wv_, sqrt_w, alpha, codes, None, plan3,
            **kwargs,
        )
        return (w * o).sum()

    def loss_canon(xc, wq_, wv_):
        o = hept_attention_core_xcols(
            xc[:, src0], coords_cols, wq_, wk, wv_, sqrt_w, alpha, codes,
            None, plan5, canon=True, **kwargs,
        )
        return (w * o[:, :, inv0]).sum()

    g1 = jax.grad(loss_static, argnums=(0, 1, 2))(x_cols, wq, wv)
    g2 = jax.grad(loss_canon, argnums=(0, 1, 2))(x_cols, wq, wv)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6
        )


def _model_pair(packs: bool, n=600, sort_events=1):
    from hept_tpu.models import HeptTransformer, TransformerConfig

    base = dict(
        in_dim=5, coords_dim=3, h_dim=8, num_heads=2, n_layers=2,
        block_size=50, n_hashes=2, num_regions=20, num_w_per_dist=4,
        padding_mode="replicate", scan_layers=True, qkv_post_sort=True,
        shared_sort=True, share_heads=True, static_keys="x0",
        sort_pack=packs, unsort_pack=packs, sort_events=sort_events,
    )
    m_static = HeptTransformer(TransformerConfig(**base))
    m_canon = HeptTransformer(TransformerConfig(**base, canon_residual=True))
    return m_static, m_canon


@pytest.mark.parametrize("packs", [False, True])
def test_model_canon_matches_static(packs):
    rng = np.random.default_rng(11)
    n = 600
    m_static, m_canon = _model_pair(packs)
    x = jnp.asarray(rng.normal(size=(n, 5)).astype(np.float32))
    coords = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    valid = jnp.asarray(np.arange(n) < 550)
    variables = m_static.init(jax.random.PRNGKey(0), x, coords, valid)
    want = m_static.apply(variables, x, coords, valid)
    got = m_canon.apply(variables, x, coords, valid)
    if packs:
        # round 0 skips the unsort_pack bf16 rounding in canon mode
        # (strictly less rounding) — tolerance is bf16-scale on 1/c of the
        # OR-combine contributions.
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=0.05, atol=5e-3
        )
    else:
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
        )


def test_model_canon_grads_finite_and_flow():
    rng = np.random.default_rng(13)
    n = 600
    _, m_canon = _model_pair(True)
    x = jnp.asarray(rng.normal(size=(n, 5)).astype(np.float32))
    coords = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    valid = jnp.asarray(np.ones(n, bool))
    variables = m_canon.init(jax.random.PRNGKey(0), x, coords, valid)

    def loss(p):
        o = m_canon.apply(
            {"params": p, "constants": variables["constants"]},
            x, coords, valid,
        )
        return (o ** 2).mean()

    g = jax.grad(loss)(variables["params"])
    flat = {
        "/".join(map(str, k)): v
        for k, v in jax.tree_util.tree_flatten_with_path(g)[0]
    }
    assert all(bool(jnp.isfinite(v).all()) for v in flat.values())
    wq_grads = [v for k, v in flat.items() if "w_q" in k]
    assert wq_grads and all(float(jnp.abs(v).sum()) > 0 for v in wq_grads)


def test_flat_batched_canon_matches_static():
    """Stacked flat batching (sort_events=B) composes with canon_residual."""
    from hept_tpu.models import make_flat_batched_apply

    rng = np.random.default_rng(17)
    b, n = 2, 400
    m_static, m_canon = _model_pair(False, sort_events=b)
    x = jnp.asarray(rng.normal(size=(b, n, 5)).astype(np.float32))
    coords = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32))
    valid = jnp.asarray(
        np.stack([np.arange(n) < 380, np.arange(n) < 400])
    )
    variables = m_static.init(
        jax.random.PRNGKey(0), x[0], coords[0], valid[0]
    )
    want = make_flat_batched_apply(m_static)(variables, x, coords, valid)
    got = make_flat_batched_apply(m_canon)(variables, x, coords, valid)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
    )
