"""static_keys fast mode: permute_gather equivalence + plan-path parity.

The static-keys divergence (layer-invariant bucket hashes) changes WHICH
buckets form — that part is convergence-gated on TPU
(scripts/validate_static_keys.py). What must be EXACT is the machinery:
applying a known permutation by gather must match applying it by sort-carry,
forward and backward, and the attention core fed a plan must match the
share_heads path fed the identical keys.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hept_tpu.core.buckets import grouped_sort_carry, permute_gather
from hept_tpu.ops.bucket_attn import (
    hept_attention_core_xcols,
    static_bucket_plan,
    static_hash,
)

C, NEV, D, NE = 3, 2, 10, 512


def _plan_arrays(seed=0):
    rng = np.random.default_rng(seed)
    perms = np.stack(
        [np.stack([rng.permutation(NE) for _ in range(NEV)]) for _ in range(C)]
    ).astype(np.int32)
    inv = np.argsort(perms, axis=-1).astype(np.int32)
    return jnp.asarray(perms), jnp.asarray(inv)


@pytest.mark.parametrize("pack", [False, True])
def test_permute_gather_matches_sort_carry(pack):
    src, inv = _plan_arrays()
    payload = jnp.asarray(
        np.random.default_rng(1).normal(size=(NEV, D, NE)).astype(np.float32)
    )
    got = permute_gather(payload, src, inv, pack=pack)
    # sort-carry applying the same permutation: sorting by `inv` as key
    # yields sorted[s] = payload[argsort(inv)[s]] = payload[src[s]]
    (want,), _ = grouped_sort_carry(
        [inv], [jnp.broadcast_to(payload[None], (C, NEV, D, NE))], pack=pack
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("pack", [False, True])
def test_permute_gather_grad_matches_sort_carry(pack):
    src, inv = _plan_arrays(seed=2)
    payload = jnp.asarray(
        np.random.default_rng(3).normal(size=(NEV, D, NE)).astype(np.float32)
    )
    w = jnp.asarray(
        np.random.default_rng(4).normal(size=(C, NEV, D, NE)).astype(np.float32)
    )

    g1 = jax.grad(lambda p: (w * permute_gather(p, src, inv, pack=pack)).sum())(
        payload
    )

    def via_sort(p):
        (s,), _ = grouped_sort_carry(
            [inv], [jnp.broadcast_to(p[None], (C, NEV, D, NE))], pack=pack
        )
        return (w * s).sum()

    g2 = jax.grad(via_sort)(payload)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-6)


def test_static_bucket_plan_shapes_and_inverse():
    rng = np.random.default_rng(5)
    n = NEV * NE
    hashed = jnp.asarray(rng.normal(size=(C, n)).astype(np.float32))
    codes = jnp.asarray(rng.integers(0, 5, size=(C, n)).astype(np.float32))
    coords = jnp.asarray(rng.normal(size=(3, n)).astype(np.float32))
    src, inv, scoords = static_bucket_plan(
        hashed, codes, None, coords, sort_events=NEV
    )
    assert src.shape == (C, NEV, NE) and inv.shape == (C, NEV, NE)
    assert scoords.shape == (C, NEV, 3, NE)
    # inverse property per (round, event) row
    ar = np.arange(NE)
    for r in range(C):
        for b in range(NEV):
            s = np.asarray(src[r, b])
            assert sorted(s.tolist()) == ar.tolist()
            np.testing.assert_array_equal(np.asarray(inv[r, b])[s], ar)
    # scoords really is coords gathered by src
    want = np.take_along_axis(
        np.asarray(coords).reshape(3, NEV, NE).transpose(1, 0, 2)[None].repeat(C, 0),
        np.asarray(src)[:, :, None, :], axis=3,
    )
    np.testing.assert_allclose(np.asarray(scoords), want, rtol=1e-6)


def test_core_plan_matches_share_heads_same_keys():
    """Feeding the core a plan built from the SAME keys the share_heads
    branch computes must reproduce its output exactly (f32, xla impl)."""
    rng = np.random.default_rng(7)
    h, d_model, d, cd, c = 4, 16, 16, 3, 2
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

    kwargs = dict(
        block_size=block, impl="xla", sort_pack=False, shared_sort=True,
        share_heads=True,
    )
    want = hept_attention_core_xcols(
        x_cols, coords_cols, wq, wk, wv, sqrt_w, alpha, codes, None, None,
        **kwargs,
    )

    # replicate the share_heads key computation exactly
    a1, a2 = alpha[0, :d_model, :], alpha[0, d_model:, :]
    gamma = sqrt_w.mean(axis=0)[:, None] * a2
    hashed = (
        jnp.einsum("ec,en->cn", a1, x_cols)
        + jnp.einsum("rc,rn->cn", gamma, coords_cols)
    )
    plan = static_bucket_plan(hashed, codes[:, 0], None, coords_cols)
    got = hept_attention_core_xcols(
        x_cols, coords_cols, wq, wk, wv, sqrt_w, alpha, codes, None, plan,
        **kwargs,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6
    )


def test_static_hash_and_bins_orders_by_secondary_then_primary():
    """With and_bins, sorting the key must group by the quantized secondary
    direction FIRST and order by the primary hash within each bin (the AND
    construction: key = h1 + q2 * span(h1) with non-overlapping bin ranges).
    """
    rng = np.random.default_rng(13)
    d_model, cd, c, n, bins = 12, 3, 2, 400, 4
    x0 = jnp.asarray(rng.normal(size=(d_model, n)).astype(np.float32))
    coords = jnp.asarray(rng.normal(size=(cd, n)).astype(np.float32))
    alpha = jnp.asarray(
        rng.normal(size=(2, d_model + cd, c)).astype(np.float32)
    )
    base = static_hash(x0, coords, alpha, 1.3, "x0", and_bins=0)
    keyed = static_hash(x0, coords, alpha, 1.3, "x0", and_bins=bins)
    assert base.shape == keyed.shape == (c, n)
    # base uses only alpha[0] — identical to pre-and_bins behavior
    only0 = static_hash(x0, coords, alpha[:1], 1.3, "x0", and_bins=0)
    np.testing.assert_allclose(np.asarray(base), np.asarray(only0), rtol=1e-6)

    # recover h1/q2 independently and check the grouping property per round.
    # The quantization is replicated with the same jnp ops/order as
    # static_hash so bin boundaries match bitwise.
    h1 = np.asarray(base)
    h2j = static_hash(x0, coords, alpha[1:], 1.3, "x0", and_bins=0)
    lo_j = h2j.min(axis=1, keepdims=True)
    hi_j = h2j.max(axis=1, keepdims=True)
    q2_all = np.asarray(
        jnp.clip(
            jnp.floor((h2j - lo_j) / (hi_j - lo_j + 1e-12) * bins),
            0, bins - 1,
        )
    )
    for r in range(c):
        q2 = q2_all[r]
        order = np.argsort(np.asarray(keyed[r]), kind="stable")
        qs = q2[order]
        assert (np.diff(qs) >= 0).all(), "secondary bins not contiguous"
        for b in range(bins):
            seg = order[qs == b]
            assert (np.diff(h1[r][seg]) >= 0).all(), (
                f"primary order violated inside bin {b}"
            )


def test_model_static_and_bins_forward_and_grad():
    from hept_tpu.models import HeptTransformer, TransformerConfig

    rng = np.random.default_rng(17)
    n = 600
    cfg = TransformerConfig(
        in_dim=5, coords_dim=3, h_dim=8, num_heads=2, n_layers=2,
        block_size=50, n_hashes=2, num_regions=20, num_w_per_dist=4,
        padding_mode="replicate", scan_layers=True, qkv_post_sort=True,
        shared_sort=True, share_heads=True, static_keys="x0",
        static_and_bins=4, sort_pack=True, unsort_pack=True,
    )
    model = HeptTransformer(cfg)
    x = jnp.asarray(rng.normal(size=(n, 5)).astype(np.float32))
    coords = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    valid = jnp.asarray(np.ones(n, bool))
    variables = model.init(jax.random.PRNGKey(0), x, coords, valid)
    assert variables["constants"]["static_alpha"].shape[0] == 2
    out = model.apply(variables, x, coords, valid)
    assert out.shape == (n, cfg.h_dim // 2)
    assert bool(jnp.isfinite(out).all())

    def loss(p):
        o = model.apply(
            {"params": p, "constants": variables["constants"]},
            x, coords, valid,
        )
        return (o ** 2).mean()

    g = jax.grad(loss)(variables["params"])
    assert all(
        bool(jnp.isfinite(l).all()) for l in jax.tree_util.tree_leaves(g)
    )


@pytest.mark.parametrize("variant", [True, "coords"])
def test_model_static_keys_forward_and_grad(variant):
    from hept_tpu.models import HeptTransformer, TransformerConfig

    rng = np.random.default_rng(11)
    n = 600
    cfg = TransformerConfig(
        in_dim=5, coords_dim=3, h_dim=8, num_heads=2, n_layers=2,
        block_size=50, n_hashes=2, num_regions=20, num_w_per_dist=4,
        padding_mode="replicate", scan_layers=True, qkv_post_sort=True,
        shared_sort=True, share_heads=True, static_keys=variant,
        sort_pack=True, unsort_pack=True,
    )
    model = HeptTransformer(cfg)
    x = jnp.asarray(rng.normal(size=(n, 5)).astype(np.float32))
    coords = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    valid = jnp.asarray(np.ones(n, bool))
    variables = model.init(jax.random.PRNGKey(0), x, coords, valid)
    assert "static_alpha" in variables["constants"]
    out = model.apply(variables, x, coords, valid)
    assert out.shape == (n, cfg.h_dim // 2)
    assert bool(jnp.isfinite(out).all())

    def loss(p):
        o = model.apply(
            {"params": p, "constants": variables["constants"]},
            x, coords, valid,
        )
        return (o ** 2).mean()

    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)
    # the attention projections must receive gradient through the gathers
    gq = variables["params"]  # structure probe
    flat = {
        "/".join(map(str, k)): v
        for k, v in jax.tree_util.tree_flatten_with_path(g)[0]
    }
    wq_grads = [v for k, v in flat.items() if "w_q" in k]
    assert wq_grads and all(float(jnp.abs(v).sum()) > 0 for v in wq_grads)
