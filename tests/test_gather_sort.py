"""gather_sort: the argsort + broadcast-source row-gather forward is a pure
transport change — same key orders, same placements, same per-element
rounding (f32 bitcast; bf16 pairs under sort_pack) as the payload-carrying
variadic sort it replaces. Outputs must match the sort-carry path to
f32-reassociation tolerance, forward and backward, in every dynamic-key
pipeline (per-head reference-parity, shared_sort, share_heads)."""

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
        qkv_post_sort=True, shared_sort=False, share_heads=False,
        static_keys=False, canon_residual=False,
    )
    base.update(kw)
    return TransformerConfig(**base)


def _event(n=128, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((n, 6)), jnp.float32)
    coords = jnp.asarray(rng.standard_normal((n, 4)), jnp.float32)
    valid = jnp.ones((n,), bool)
    return x, coords, valid


def _fwd_bwd_match(cfg_kw, seed, rtol_g=2e-4):
    x, coords, valid = _event(seed=seed)
    m0 = HeptTransformer(_cfg(gather_sort=False, **cfg_kw))
    m1 = HeptTransformer(_cfg(gather_sort=True, **cfg_kw))
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


def test_gather_sort_per_head():
    """the reference-parity per-head pipeline (separate q/k orders, f32
    transport) — the strict-parity bench mode's configuration."""
    _fwd_bwd_match({}, seed=21)


def test_gather_sort_per_head_rows():
    """gather_sort x unsort_rows: the full gathers-only parity step (no
    payload ever rides a lax.sort); the unsort reuses gather_sort's q-side
    inverse instead of re-argsorting."""
    _fwd_bwd_match(dict(unsort_rows=True), seed=22)


def test_gather_sort_shared_sort():
    _fwd_bwd_match(dict(shared_sort=True), seed=23)


def test_gather_sort_r2known_stack():
    """the r2known parity-accuracy stack's transport: shared_sort, bf16
    sort/unsort packing, f32 kernels, gather_sort x dynamic unsort_rows —
    the exact-lever combination whose timer moves the 0.9566 Pareto point."""
    _fwd_bwd_match(dict(shared_sort=True, sort_pack=True, unsort_pack=True,
                        unsort_rows=True), seed=27)


@pytest.mark.parametrize("pack", [False, True])
def test_gather_sort_share_heads(pack):
    _fwd_bwd_match(dict(share_heads=True, shared_sort=True,
                        sort_pack=pack, unsort_pack=pack), seed=24)


def test_gather_sort_share_heads_rows():
    _fwd_bwd_match(dict(share_heads=True, shared_sort=True,
                        unsort_rows=True), seed=25)


def test_gather_sort_static_plan_noop():
    """with a static plan the flag must be a no-op (the plan paths already
    gather): bitwise-equal outputs."""
    x, coords, valid = _event(seed=26)
    kw = dict(share_heads=True, shared_sort=True, static_keys="x0")
    m0 = HeptTransformer(_cfg(gather_sort=False, **kw))
    m1 = HeptTransformer(_cfg(gather_sort=True, **kw))
    v = m0.init(jax.random.PRNGKey(26), x, coords, valid)
    o0 = m0.apply(v, x, coords, valid)
    o1 = m1.apply(v, x, coords, valid)
    np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))


def test_gather_sort_per_head_flat_batch():
    """per-head gather_sort x stacked flat batching: broadcast-source rows
    (r % n_ev) must line up with the (c, h, n_ev) key-row ordering."""
    from hept_tpu.models import make_flat_batched_apply

    n, b = 64, 2
    xs, cs, vs = zip(*[_event(n, seed=30 + i) for i in range(b)])
    x = jnp.concatenate(xs)
    coords = jnp.concatenate(cs)
    valid = jnp.concatenate(vs)
    kw = dict(sort_events=b, block_size=8, num_regions=4)
    m0 = HeptTransformer(_cfg(gather_sort=False, **kw))
    m1 = HeptTransformer(_cfg(gather_sort=True, **kw))
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
