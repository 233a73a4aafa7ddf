"""kernel_center: per-bucket RPE centering.

1. In f32 the model output is unchanged (RBF logits -½|q̂-k̂|² are invariant
   under a common per-bucket shift of q̂ and k̂).
2. At large sqrt_w (the trained regime; scripts/diag_ckpt.py measured
   sqrt_w up to ~19 within 24 steps at 60k) bf16 kernels WITHOUT centering
   drown the bucket-local RPE differences in rounding noise; centering
   recovers f32-grade attention.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hept_tpu.models import HeptTransformer, TransformerConfig
from hept_tpu.ops.bucket_attn import bucket_rbf_attention_cols_xla

pytestmark = pytest.mark.quick


def _cfg(**kw):
    base = dict(
        in_dim=6, coords_dim=4, task="tracking", h_dim=8, num_heads=2,
        n_layers=2, block_size=16, n_hashes=2, num_regions=6,
        num_w_per_dist=3, padding_mode="replicate", attn_impl="xla",
        qkv_post_sort=True, shared_sort=True, share_heads=True,
        sort_pack=False,
    )
    base.update(kw)
    return TransformerConfig(**base)


def _event(n=128, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((n, 6)), jnp.float32)
    coords = jnp.asarray(rng.standard_normal((n, 4)), jnp.float32)
    valid = jnp.ones((n,), bool)
    return x, coords, valid


def test_center_f32_exact():
    """f32 + centering == f32 without, to fp-reassociation tolerance."""
    x, coords, valid = _event()
    m0 = HeptTransformer(_cfg(kernel_center=False))
    m1 = HeptTransformer(_cfg(kernel_center=True))
    v = m0.init(jax.random.PRNGKey(0), x, coords, valid)
    o0 = m0.apply(v, x, coords, valid)
    o1 = m1.apply(v, x, coords, valid)
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1),
                               rtol=2e-4, atol=2e-5)


def test_center_static_plan_f32_exact():
    """Same invariance through the static_keys/canon path (plan coords
    ride f32 when centering)."""
    x, coords, valid = _event()
    kw = dict(static_keys="x0", canon_residual=True, sort_pack=True,
              unsort_pack=True)
    m0 = HeptTransformer(_cfg(kernel_center=False, **kw))
    m1 = HeptTransformer(_cfg(kernel_center=True, **kw))
    v = m0.init(jax.random.PRNGKey(0), x, coords, valid)
    o0 = m0.apply(v, x, coords, valid)
    o1 = m1.apply(v, x, coords, valid)
    # centering also upgrades the plan's coord transport to f32 under
    # sort_pack, so tolerate the bf16-transport delta of the baseline
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1),
                               rtol=2e-2, atol=2e-3)


def test_center_rescues_bf16_at_large_sqrt_w():
    """Direct kernel-level check at trained-regime scales: q̂/k̂ whose RPE
    columns are sqrt_w * coord with sqrt_w = 16 and |coord| ~ 3. bf16
    rounding error on the raw values is ~sqrt_w*coord*2^-8 ~ 0.2, on the
    same order as the bucket-local differences; centered bf16 must land
    ~10x closer to the f32 result."""
    rng = np.random.default_rng(1)
    r, dx, cd, dv, bs, nb = 2, 4, 3, 4, 16, 4
    n = nb * bs
    sqrt_w = 16.0
    # bucket-local geometry: per bucket a far-away center + small spread
    centers = rng.uniform(-3, 3, (r, 1, nb, 1))
    local = rng.standard_normal((r, cd, nb, bs)) * 0.02
    coords = (centers + local).reshape(r, cd, n)
    xpart_q = rng.standard_normal((r, dx, n)).astype(np.float32) * 0.3
    xpart_k = rng.standard_normal((r, dx, n)).astype(np.float32) * 0.3
    rpe = (sqrt_w * coords).astype(np.float32)
    sq = jnp.asarray(np.concatenate([xpart_q, rpe], axis=1))
    sk = jnp.asarray(np.concatenate([xpart_k, rpe], axis=1))
    sv = jnp.asarray(rng.standard_normal((r, dv, n)), jnp.float32)

    def run(q, k, cast):
        qq = q.astype(jnp.bfloat16) if cast else q
        kk = k.astype(jnp.bfloat16) if cast else k
        den, so = bucket_rbf_attention_cols_xla(
            qq, kk, sv.astype(jnp.bfloat16) if cast else sv, bs
        )
        return np.asarray(so / den)

    golden = run(sq, sk, cast=False)

    # centered: subtract per-bucket mean of the shared rpe columns
    b = np.asarray(sq).reshape(r, dx + cd, nb, bs)
    mu = b.mean(axis=-1, keepdims=True)
    mu[:, :dx] = 0.0  # center only the rpe columns (as the model does)
    sq_c = jnp.asarray((b - mu).reshape(r, dx + cd, n))
    sk_c = jnp.asarray(
        (np.asarray(sk).reshape(r, dx + cd, nb, bs) - mu).reshape(r, dx + cd, n)
    )

    err_raw = np.abs(run(sq, sk, cast=True) - golden).max()
    err_centered = np.abs(run(sq_c, sk_c, cast=True) - golden).max()
    assert err_centered * 5 < err_raw, (err_centered, err_raw)
