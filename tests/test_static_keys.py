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


def test_model_static_rounds_scan_matches_loop():
    """static_rounds: the scan path consumes per-layer sub-plans as a
    scanned input (axis 0), the loop path slices plan[i] — both must
    produce identical outputs for the same (restacked) params."""
    import dataclasses

    from hept_tpu.models import HeptTransformer, TransformerConfig
    from hept_tpu.models.transformer import stack_layer_params

    rng = np.random.default_rng(23)
    n = 600
    cfg = TransformerConfig(
        in_dim=5, coords_dim=3, h_dim=8, num_heads=2, n_layers=2,
        block_size=50, n_hashes=2, num_regions=20, num_w_per_dist=4,
        padding_mode="replicate", scan_layers=False, qkv_post_sort=True,
        shared_sort=True, share_heads=True, static_keys="x0",
        static_rounds=4,
    )
    model = HeptTransformer(cfg)
    x = jnp.asarray(rng.normal(size=(n, 5)).astype(np.float32))
    coords = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    valid = jnp.asarray(np.ones(n, bool))
    variables = model.init(jax.random.PRNGKey(0), x, coords, valid)
    assert variables["constants"]["static_alpha"].shape[-1] == 4
    out_loop = model.apply(variables, x, coords, valid)
    assert bool(jnp.isfinite(out_loop).all())

    scan_model = HeptTransformer(dataclasses.replace(cfg, scan_layers=True))
    scan_vars = {
        "params": stack_layer_params(variables["params"], cfg.n_layers),
        "constants": stack_layer_params(variables["constants"], cfg.n_layers),
    }
    out_scan = scan_model.apply(scan_vars, x, coords, valid)
    np.testing.assert_allclose(
        np.asarray(out_scan), np.asarray(out_loop), rtol=1e-6, atol=1e-6
    )

    def loss(p):
        o = scan_model.apply(
            {"params": p, "constants": scan_vars["constants"]},
            x, coords, valid,
        )
        return (o ** 2).mean()

    g = jax.grad(loss)(scan_vars["params"])
    assert all(
        bool(jnp.isfinite(l).all()) for l in jax.tree_util.tree_leaves(g)
    )


def test_static_rounds_layers_get_distinct_buckets():
    """With static_rounds > n_hashes, consecutive layers must attend over
    DIFFERENT bucket grids (the whole point: multi-layer round-union)."""
    from hept_tpu.models import HeptTransformer, TransformerConfig

    rng = np.random.default_rng(29)
    n = 600
    cfg = TransformerConfig(
        in_dim=5, coords_dim=3, h_dim=8, num_heads=2, n_layers=2,
        block_size=50, n_hashes=2, num_regions=20, num_w_per_dist=4,
        padding_mode="replicate", scan_layers=False, qkv_post_sort=True,
        shared_sort=True, share_heads=True, static_keys="x0",
        static_rounds=4,
    )
    model = HeptTransformer(cfg)
    x = jnp.asarray(rng.normal(size=(n, 5)).astype(np.float32))
    coords = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    valid = jnp.asarray(np.ones(n, bool))
    variables = model.init(jax.random.PRNGKey(0), x, coords, valid)

    # rebuild the plan exactly as the model does and check the sub-plan
    # slicing: layer 0 rides rounds (0, 1), layer 1 rides rounds (2, 3)
    from hept_tpu.models.transformer import _prepare_event
    from hept_tpu.ops.bucket_attn import static_bucket_plan, static_hash

    regions = variables["constants"]["regions"]
    xp, cp, codes, invalid, _, _ = _prepare_event(
        x, coords, valid, regions, cfg
    )
    p = variables["params"]
    henc = jnp.maximum(
        xp @ p["feat_enc_0"]["kernel"] + p["feat_enc_0"]["bias"], 0.0
    ) @ p["feat_enc_1"]["kernel"] + p["feat_enc_1"]["bias"]
    alpha = variables["constants"]["static_alpha"]
    scale = float(np.sqrt(2.0 * cfg.num_w_per_dist))
    hashed = static_hash(henc.T, cp.T, alpha, scale, "x0", and_bins=0)
    assert hashed.shape[0] == 4
    codes0 = jnp.tile(codes[:, 0], (2, 1))
    src, inv, _ = static_bucket_plan(hashed, codes0, invalid, cp.T)
    # the 4 rounds' permutations must be pairwise distinct
    perms = np.asarray(src[:, 0])
    for a in range(4):
        for b in range(a + 1, 4):
            assert not np.array_equal(perms[a], perms[b])


def test_model_static_rounds_rejects_bad_canon_count():
    """canon + static_rounds needs total = 1 + k*(n_hashes-1) (pinned
    round 0); n_hashes=3 with static_rounds=6 violates it."""
    from hept_tpu.models import HeptTransformer, TransformerConfig

    cfg = TransformerConfig(
        in_dim=5, coords_dim=3, h_dim=8, num_heads=2, n_layers=2,
        block_size=50, n_hashes=3, num_regions=20, num_w_per_dist=4,
        padding_mode="replicate", qkv_post_sort=True, shared_sort=True,
        share_heads=True, static_keys="x0", static_rounds=6,
        canon_residual=True,
    )
    model = HeptTransformer(cfg)
    x = jnp.zeros((100, 5))
    coords = jnp.zeros((100, 3))
    valid = jnp.ones(100, bool)
    with pytest.raises(ValueError, match="canon_residual"):
        model.init(jax.random.PRNGKey(0), x, coords, valid)


def test_model_static_rounds_canon_pinned_scan_matches_loop():
    """canon + static_rounds pinned-round-0 scheme: layer subsets
    [0, 1+cycling] keep the canonical round free in every layer; scan and
    loop paths must agree, and the output must be finite with gradients."""
    import dataclasses

    from hept_tpu.models import HeptTransformer, TransformerConfig
    from hept_tpu.models.transformer import stack_layer_params

    rng = np.random.default_rng(31)
    n = 600
    cfg = TransformerConfig(
        in_dim=5, coords_dim=3, h_dim=8, num_heads=2, n_layers=2,
        block_size=50, n_hashes=2, num_regions=20, num_w_per_dist=4,
        padding_mode="replicate", scan_layers=False, qkv_post_sort=True,
        shared_sort=True, share_heads=True, static_keys="x0",
        static_rounds=3, canon_residual=True,
    )
    model = HeptTransformer(cfg)
    x = jnp.asarray(rng.normal(size=(n, 5)).astype(np.float32))
    coords = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    valid = jnp.asarray(np.ones(n, bool))
    variables = model.init(jax.random.PRNGKey(0), x, coords, valid)
    assert variables["constants"]["static_alpha"].shape[-1] == 3
    out_loop = model.apply(variables, x, coords, valid)
    assert bool(jnp.isfinite(out_loop).all())

    scan_model = HeptTransformer(dataclasses.replace(cfg, scan_layers=True))
    scan_vars = {
        "params": stack_layer_params(variables["params"], cfg.n_layers),
        "constants": stack_layer_params(variables["constants"], cfg.n_layers),
    }
    out_scan = scan_model.apply(scan_vars, x, coords, valid)
    np.testing.assert_allclose(
        np.asarray(out_scan), np.asarray(out_loop), rtol=1e-6, atol=1e-6
    )

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
