"""Transport groups (TransformerConfig.transport_groups): group-level plan
permutations move g points per gathered row, with the residual stream riding
round-0 sorted order (σ).

Exactness property: when every point is an exact duplicate pair (x AND
coords duplicated), the dup pair occupies two consecutive slots of every
round's sorted order, groups (g=2, σ-consecutive) coincide with the dup
pairs, and the group key (min over members) equals the member key — so
g=2 bucketing is IDENTICAL to g=1 bucketing and the model outputs must
match to f32-reassociation tolerance, forward and backward. The property
needs num_regions=1: region AND codes are RANK-based (quantile partition),
so with >1 region a quantile boundary can split a dup pair into different
region codes and legitimately different buckets — a property of the
reference bucketing, not of the grouped transport. On generic data,
grouping is a convergence-gated divergence (bucket composition coarsens);
here we check it runs, grads are finite, and padding stays inert.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hept_tpu.models import HeptTransformer, TransformerConfig

pytestmark = pytest.mark.quick


def _cfg(**kw):
    base = dict(
        in_dim=6, coords_dim=4, task="tracking", h_dim=8, num_heads=2,
        n_layers=2, block_size=16, n_hashes=3, num_regions=6,
        num_w_per_dist=3, padding_mode="replicate", attn_impl="xla",
        qkv_post_sort=True, shared_sort=True, share_heads=True,
        static_keys="x0", unsort_rows=True,
    )
    base.update(kw)
    return TransformerConfig(**base)


def _dup_event(n_pairs=64, seed=0):
    """Every point appears exactly twice (x and coords duplicated)."""
    rng = np.random.default_rng(seed)
    x1 = rng.standard_normal((n_pairs, 6)).astype(np.float32)
    c1 = rng.standard_normal((n_pairs, 4)).astype(np.float32)
    x = jnp.asarray(np.repeat(x1, 2, axis=0))
    coords = jnp.asarray(np.repeat(c1, 2, axis=0))
    valid = jnp.ones((2 * n_pairs,), bool)
    return x, coords, valid


def _rand_event(n=128, n_valid=None, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((n, 6)), jnp.float32)
    coords = jnp.asarray(rng.standard_normal((n, 4)), jnp.float32)
    valid = jnp.arange(n) < (n if n_valid is None else n_valid)
    return x, coords, valid


@pytest.mark.parametrize("pack", [False, True])
def test_groups_match_ungrouped_on_duplicated_pairs(pack):
    x, coords, valid = _dup_event()
    kw = dict(sort_pack=pack, unsort_pack=pack, num_regions=1)
    m0 = HeptTransformer(_cfg(**kw))
    m2 = HeptTransformer(_cfg(transport_groups=2, **kw))
    v = m0.init(jax.random.PRNGKey(0), x, coords, valid)

    def loss(m):
        def f(params):
            out = m.apply({"params": params, "constants": v["constants"]},
                          x, coords, valid)
            return (out ** 2).sum(), out

        return jax.value_and_grad(f, has_aux=True)(v["params"])

    (l0, o0), g0 = loss(m0)
    (l2, o2), g2 = loss(m2)
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o2),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(l0), float(l2), rtol=1e-4)
    # Grads under pack carry a DIFFERENT (strictly smaller) transport
    # rounding: the grouped combined [x|coords] gather moves cotangents in
    # exact f32 rows while the g=1 sort_pack path bf16-rounds them — same
    # buckets, same math, but cancellation-heavy small leaves (w_q/w_k)
    # shift by ~|terms|·2⁻⁸ elementwise. Compare elementwise when the
    # rounding profiles match (pack=False); compare direction + magnitude
    # per leaf when they differ.
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g2)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        if not pack:
            np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-5)
            continue
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na < 1e-6 and nb < 1e-6:
            continue
        cos = float((a * b).sum() / (na * nb + 1e-30))
        assert cos > 0.99, f"grad direction diverged: cos={cos}"
        # cancellation-heavy small leaves (w_q/w_k, norm ~2 vs out_linear
        # ~300) see up to a few % norm shift from the cotangent rounding
        # delta; real bucketing divergence would be order-1
        assert abs(na - nb) <= 0.08 * max(na, nb) + 1e-6, (na, nb)


@pytest.mark.parametrize("g", [2, 4])
def test_groups_run_with_static_rounds_and_scan(g):
    """Generic data: grouped plan + static_rounds sub-plan slicing + scan
    layers compile and produce finite outputs/grads."""
    x, coords, valid = _rand_event(seed=1)
    cfg = _cfg(transport_groups=g, static_rounds=6, scan_layers=True,
               sort_pack=True, unsort_pack=True, kernel_center=True)
    m = HeptTransformer(cfg)
    v = m.init(jax.random.PRNGKey(1), x, coords, valid)

    def f(params):
        out = m.apply({"params": params, "constants": v["constants"]},
                      x, coords, valid)
        return (out ** 2).sum()

    l, grads = jax.value_and_grad(f)(v["params"])
    assert np.isfinite(float(l))
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_groups_padding_inert():
    """Replicate-mode pads: valid-row outputs must not depend on pad slot
    content (same event padded two ways gives the same valid rows)."""
    n_valid = 96
    x, coords, valid = _rand_event(n=128, n_valid=n_valid, seed=2)
    cfg = _cfg(transport_groups=2)
    m = HeptTransformer(cfg)
    v = m.init(jax.random.PRNGKey(2), x, coords, valid)
    o1 = m.apply(v, x, coords, valid)
    x2 = x.at[n_valid:].set(7.5)
    c2 = coords.at[n_valid:].set(-3.25)
    o2 = m.apply(v, x2, c2, valid)
    np.testing.assert_allclose(np.asarray(o1[:n_valid]),
                               np.asarray(o2[:n_valid]),
                               rtol=1e-5, atol=1e-6)


def test_groups_flat_stacked_batch():
    """sort_events=2 (stacked flat batching) with grouped plans: per-event
    group permutations; valid outputs finite and batch rows independent."""
    from hept_tpu.models import make_flat_batched_apply

    x1, c1, v1 = _rand_event(seed=3)
    x2, c2, v2 = _rand_event(seed=4)
    x = jnp.stack([x1, x2])
    coords = jnp.stack([c1, c2])
    valid = jnp.stack([v1, v2])
    cfg = _cfg(transport_groups=2, sort_events=2)
    m = HeptTransformer(cfg)
    apply = make_flat_batched_apply(m)
    v = m.init(jax.random.PRNGKey(3), x1, c1, v1)
    out = apply(v, x, coords, valid)
    assert out.shape[0] == 2
    assert np.all(np.isfinite(np.asarray(out)))
