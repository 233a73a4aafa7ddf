"""unsort_rows: the row-major canonical unsort is a pure layout change —
same permutations, same per-element bf16 rounding (rounding is elementwise;
only the u32 pairing differs), same OR-combine order. Outputs must match the
sort-carry canon path to f32-reassociation tolerance, forward and backward.
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
        static_keys="x0", canon_residual=True,
    )
    base.update(kw)
    return TransformerConfig(**base)


def _event(n=128, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((n, 6)), jnp.float32)
    coords = jnp.asarray(rng.standard_normal((n, 4)), jnp.float32)
    valid = jnp.ones((n,), bool)
    return x, coords, valid


@pytest.mark.parametrize("pack", [False, True])
def test_unsort_rows_matches_sort_carry(pack):
    x, coords, valid = _event()
    kw = dict(sort_pack=pack, unsort_pack=pack)
    m0 = HeptTransformer(_cfg(unsort_rows=False, **kw))
    m1 = HeptTransformer(_cfg(unsort_rows=True, **kw))
    v = m0.init(jax.random.PRNGKey(0), x, coords, valid)

    def loss(m):
        def f(params):
            out = m.apply({"params": params, "constants": v["constants"]},
                          x, coords, valid)
            return (out ** 2).sum(), out

        return jax.value_and_grad(f, has_aux=True)(v["params"])

    (l0, o0), g0 = loss(m0)
    (l1, o1), g1 = loss(m1)
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_unsort_rows_single_hash():
    """c == 1: no gather at all; the row path must still match."""
    x, coords, valid = _event(seed=3)
    m0 = HeptTransformer(_cfg(unsort_rows=False, n_hashes=1))
    m1 = HeptTransformer(_cfg(unsort_rows=True, n_hashes=1))
    v = m0.init(jax.random.PRNGKey(0), x, coords, valid)
    o0 = m0.apply(v, x, coords, valid)
    o1 = m1.apply(v, x, coords, valid)
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1),
                               rtol=1e-5, atol=1e-6)


def test_unsort_rows_flat_batch():
    """rows x stacked flat batching (the bench 6k B>1 path): per-event sort
    rows feed the row gather; must match the sort-carry canon path."""
    from hept_tpu.models import make_flat_batched_apply

    n, b = 64, 2
    xs, cs, vs = zip(*[_event(n, seed=10 + i) for i in range(b)])
    x = jnp.concatenate(xs)
    coords = jnp.concatenate(cs)
    valid = jnp.concatenate(vs)
    m0 = HeptTransformer(_cfg(unsort_rows=False, sort_events=b, block_size=8,
                              num_regions=4))
    m1 = HeptTransformer(_cfg(unsort_rows=True, sort_events=b, block_size=8,
                              num_regions=4))
    f0 = make_flat_batched_apply(m0)
    f1 = make_flat_batched_apply(m1)
    xb = x.reshape(b, n, -1)
    cb = coords.reshape(b, n, -1)
    vb = valid.reshape(b, n)
    v = m0.init(jax.random.PRNGKey(2), xb[0], cb[0], vb[0])
    o0 = f0(v, xb, cb, vb)
    o1 = f1(v, xb, cb, vb)
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1),
                               rtol=1e-5, atol=1e-6)


def test_unsort_rows_with_static_rounds():
    """rows x static_rounds (the r9rv2 headline path): per-layer pinned-
    round-0 sub-plans feed the row gather; must match the sort-carry canon
    path forward and backward."""
    x, coords, valid = _event(seed=5)
    kw = dict(static_rounds=5, n_layers=2)  # 1 + 2*(3-1) pinned scheme
    m0 = HeptTransformer(_cfg(unsort_rows=False, **kw))
    m1 = HeptTransformer(_cfg(unsort_rows=True, **kw))
    v = m0.init(jax.random.PRNGKey(1), x, coords, valid)

    def loss(m):
        def f(params):
            out = m.apply({"params": params, "constants": v["constants"]},
                          x, coords, valid)
            return (out ** 2).sum(), out

        return jax.value_and_grad(f, has_aux=True)(v["params"])

    (l0, o0), g0 = loss(m0)
    (l1, o1), g1 = loss(m1)
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def _fwd_bwd_match(cfg_kw, seed, rtol_g=2e-4):
    x, coords, valid = _event(seed=seed)
    m0 = HeptTransformer(_cfg(unsort_rows=False, **cfg_kw))
    m1 = HeptTransformer(_cfg(unsort_rows=True, **cfg_kw))
    v = m0.init(jax.random.PRNGKey(seed), x, coords, valid)

    def loss(m):
        def f(params):
            out = m.apply({"params": params, "constants": v["constants"]},
                          x, coords, valid)
            return (out ** 2).sum(), out

        return jax.value_and_grad(f, has_aux=True)(v["params"])

    (l0, o0), g0 = loss(m0)
    (l1, o1), g1 = loss(m1)
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=rtol_g, atol=1e-5)


@pytest.mark.parametrize("pack", [False, True])
def test_unsort_rows_dynamic_share_heads(pack):
    """rows with DYNAMIC per-step keys under share_heads (no static plan):
    the inverse permutations come from an argsort of q_src; must match the
    sort-carry unsort forward and backward."""
    _fwd_bwd_match(dict(static_keys=False, canon_residual=False,
                        sort_pack=pack, unsort_pack=pack), seed=11)


def test_unsort_rows_dynamic_per_head():
    """rows on the reference-parity per-head pipeline (share_heads and
    shared_sort OFF, dynamic per-layer keys, f32 transport): each (round,
    head) row gathers by its own argsort(q_src) inverse — the exact lever
    the strict-parity bench mode rides (VERDICT r3 next #6)."""
    _fwd_bwd_match(dict(static_keys=False, canon_residual=False,
                        share_heads=False, shared_sort=False,
                        sort_pack=False, unsort_pack=False), seed=12)


def test_unsort_rows_dynamic_shared_sort():
    """rows with shared_sort but per-head hashing (q rides the k bucket
    order; per-head dynamic permutations)."""
    _fwd_bwd_match(dict(static_keys=False, canon_residual=False,
                        share_heads=False, shared_sort=True,
                        sort_pack=False, unsort_pack=False), seed=13)


def test_unsort_rows_dynamic_per_head_flat_batch():
    """per-head dynamic rows x stacked flat batching (sort_events > 1): the
    (c, h, n_ev) row ordering of q_src must line up with the output rows."""
    from hept_tpu.models import make_flat_batched_apply

    n, b = 64, 2
    xs, cs, vs = zip(*[_event(n, seed=20 + i) for i in range(b)])
    x = jnp.concatenate(xs)
    coords = jnp.concatenate(cs)
    valid = jnp.concatenate(vs)
    kw = dict(static_keys=False, canon_residual=False, share_heads=False,
              shared_sort=False, sort_events=b, block_size=8, num_regions=4)
    m0 = HeptTransformer(_cfg(unsort_rows=False, **kw))
    m1 = HeptTransformer(_cfg(unsort_rows=True, **kw))
    f0 = make_flat_batched_apply(m0)
    f1 = make_flat_batched_apply(m1)
    xb = x.reshape(b, n, -1)
    cb = coords.reshape(b, n, -1)
    vb = valid.reshape(b, n)
    v = m0.init(jax.random.PRNGKey(2), xb[0], cb[0], vb[0])
    o0 = f0(v, xb, cb, vb)
    o1 = f1(v, xb, cb, vb)
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("pack", [False, True])
def test_unsort_rows_non_canon(pack):
    """rows WITHOUT canon_residual (the nh2r8 headline stacks, where pinning
    round 0 would shrink the static-round union): every round gathers by its
    own inverse permutation; must match the sort-carry unsort forward and
    backward."""
    x, coords, valid = _event(seed=7)
    kw = dict(canon_residual=False, n_hashes=2, static_rounds=4,
              sort_pack=pack, unsort_pack=pack)
    m0 = HeptTransformer(_cfg(unsort_rows=False, **kw))
    m1 = HeptTransformer(_cfg(unsort_rows=True, **kw))
    v = m0.init(jax.random.PRNGKey(4), x, coords, valid)

    def loss(m):
        def f(params):
            out = m.apply({"params": params, "constants": v["constants"]},
                          x, coords, valid)
            return (out ** 2).sum(), out

        return jax.value_and_grad(f, has_aux=True)(v["params"])

    (l0, o0), g0 = loss(m0)
    (l1, o1), g1 = loss(m1)
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)
