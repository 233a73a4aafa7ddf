"""Pallas bucket-attention kernel vs the XLA golden path.

On CPU these run in interpreter mode with tiny shapes (the interpreter loops
the grid in Python, so sizes matter); the same kernel is exercised at real
sizes on TPU hardware by bench.py and the TPU-only test below.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from hept_tpu.ops import bucket_rbf_attention_xla
from hept_tpu.ops.bucket_attn_pallas import bucket_rbf_attention_pallas

ON_TPU = jax.default_backend() == "tpu"


def _ctx():
    if ON_TPU:
        import contextlib

        return contextlib.nullcontext()
    return pltpu.force_tpu_interpret_mode()


def _rand(key, shape):
    return jax.random.normal(key, shape, dtype=jnp.float32)


@pytest.mark.parametrize("bs", [8, 12])  # 12 exercises sublane padding
def test_forward_matches_xla(bs):
    g, d, dv = 2, 5, 4
    sq = _rand(jax.random.PRNGKey(0), (g, bs, d))
    sk = _rand(jax.random.PRNGKey(1), (g, bs, d))
    sv = _rand(jax.random.PRNGKey(2), (g, bs, dv))
    with _ctx():
        denom_p, so_p = bucket_rbf_attention_pallas(sq, sk, sv)
    denom_x, so_x = bucket_rbf_attention_xla(sq, sk, sv)
    np.testing.assert_allclose(np.asarray(denom_p), np.asarray(denom_x), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(so_p), np.asarray(so_x), rtol=1e-4, atol=1e-5)


def test_forward_leading_dims():
    c, h, nb, bs, d, dv = 2, 1, 2, 8, 5, 4
    sq = _rand(jax.random.PRNGKey(3), (c, h, nb, bs, d))
    sk = _rand(jax.random.PRNGKey(4), (c, h, nb, bs, d))
    sv = _rand(jax.random.PRNGKey(5), (c, h, nb, bs, dv))
    with _ctx():
        denom_p, so_p = bucket_rbf_attention_pallas(sq, sk, sv)
    denom_x, so_x = bucket_rbf_attention_xla(sq, sk, sv)
    assert denom_p.shape == denom_x.shape == (c, h, nb, bs, 1)
    np.testing.assert_allclose(np.asarray(so_p), np.asarray(so_x), rtol=1e-4, atol=1e-5)


def test_backward_matches_xla():
    g, bs, d, dv = 2, 8, 5, 4
    sq = _rand(jax.random.PRNGKey(6), (g, bs, d))
    sk = _rand(jax.random.PRNGKey(7), (g, bs, d))
    sv = _rand(jax.random.PRNGKey(8), (g, bs, dv))
    gd = _rand(jax.random.PRNGKey(9), (g, bs, 1))
    gs = _rand(jax.random.PRNGKey(10), (g, bs, dv))

    def loss(fn):
        def f(q, k, v):
            denom, so = fn(q, k, v)
            return jnp.sum(denom * gd) + jnp.sum(so * gs)

        return f

    with _ctx():
        grads_p = jax.grad(loss(bucket_rbf_attention_pallas), argnums=(0, 1, 2))(sq, sk, sv)
    grads_x = jax.grad(loss(bucket_rbf_attention_xla), argnums=(0, 1, 2))(sq, sk, sv)
    for gp, gx in zip(grads_p, grads_x):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(not ON_TPU, reason="real-size kernel check needs TPU")
def test_tpu_real_sizes():
    g, bs, d, dv = 48, 100, 31, 24
    sq = _rand(jax.random.PRNGKey(0), (g, bs, d))
    sk = _rand(jax.random.PRNGKey(1), (g, bs, d))
    sv = _rand(jax.random.PRNGKey(2), (g, bs, dv))
    denom_p, so_p = bucket_rbf_attention_pallas(sq, sk, sv)
    denom_x, so_x = bucket_rbf_attention_xla(sq, sk, sv)
    np.testing.assert_allclose(np.asarray(denom_p), np.asarray(denom_x), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(so_p), np.asarray(so_x), rtol=1e-4, atol=1e-5)


class TestColsKernels:
    """Column-major bucket-batched kernels vs the cols XLA golden path
    (interpret mode on CPU; real hardware via bench.py)."""

    def _data(self, r=4, d=6, dv=5, nb=10, bs=8):
        # nb=10 exercises the pad-to-multiple-of-8 bucket path (no divisor
        # of 10 is a multiple of 8)
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(7), 3)
        n = nb * bs
        return (
            _rand(k1, (r, d, n)),
            _rand(k2, (r, d, n)),
            _rand(k3, (r, dv, n)),
        )

    def test_fwd_matches_xla(self):
        from hept_tpu.ops.bucket_attn import bucket_rbf_attention_cols_xla
        from hept_tpu.ops.bucket_attn_pallas import (
            bucket_rbf_attention_cols_pallas,
        )

        sq, sk, sv = self._data()
        den_x, so_x = bucket_rbf_attention_cols_xla(sq, sk, sv, 8)
        with _ctx():
            den_p, so_p = bucket_rbf_attention_cols_pallas(sq, sk, sv, block_size=8)
        np.testing.assert_allclose(np.asarray(den_p), np.asarray(den_x), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(so_p), np.asarray(so_x), rtol=1e-5, atol=1e-6)

    def test_bwd_matches_xla(self):
        from hept_tpu.ops.bucket_attn import bucket_rbf_attention_cols_xla
        from hept_tpu.ops.bucket_attn_pallas import (
            bucket_rbf_attention_cols_pallas,
        )

        sq, sk, sv = self._data()

        def loss_x(sq, sk, sv):
            den, so = bucket_rbf_attention_cols_xla(sq, sk, sv, 8)
            return jnp.sum(so / den) + jnp.sum(jnp.log(den))

        def loss_p(sq, sk, sv):
            den, so = bucket_rbf_attention_cols_pallas(sq, sk, sv, block_size=8)
            return jnp.sum(so / den) + jnp.sum(jnp.log(den))

        g_x = jax.grad(loss_x, argnums=(0, 1, 2))(sq, sk, sv)
        with _ctx():
            g_p = jax.grad(loss_p, argnums=(0, 1, 2))(sq, sk, sv)
        for a, b, nm in zip(g_x, g_p, ("dq", "dk", "dv")):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5, err_msg=nm
            )


class TestColsKernelsBf16:
    """kernel_bf16 mode: bf16 operands, f32 accumulation, double-bf16 bias
    rows — must stay within bf16-rounding distance of the f32 path."""

    def _data(self, r=4, d=6, dv=5, nb=10, bs=8):
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(7), 3)
        n = nb * bs
        return (
            _rand(k1, (r, d, n)),
            _rand(k2, (r, d, n)),
            _rand(k3, (r, dv, n)),
        )

    def test_fwd_close_to_f32(self):
        from hept_tpu.ops.bucket_attn import bucket_rbf_attention_cols_xla
        from hept_tpu.ops.bucket_attn_pallas import (
            bucket_rbf_attention_cols_pallas,
        )

        sq, sk, sv = self._data()
        den_x, so_x = bucket_rbf_attention_cols_xla(sq, sk, sv, 8)
        b = jnp.bfloat16
        with _ctx():
            den_p, so_p = bucket_rbf_attention_cols_pallas(
                sq.astype(b), sk.astype(b), sv.astype(b), block_size=8)
        assert den_p.dtype == jnp.float32
        np.testing.assert_allclose(
            np.asarray(den_p), np.asarray(den_x), rtol=3e-2, atol=1e-2)
        np.testing.assert_allclose(
            np.asarray(so_p), np.asarray(so_x), rtol=5e-2, atol=3e-2)

    def test_bwd_close_to_f32(self):
        from hept_tpu.ops.bucket_attn import bucket_rbf_attention_cols_xla
        from hept_tpu.ops.bucket_attn_pallas import (
            bucket_rbf_attention_cols_pallas,
        )

        sq, sk, sv = self._data()

        def loss_x(sq, sk, sv):
            den, so = bucket_rbf_attention_cols_xla(sq, sk, sv, 8)
            return jnp.sum(so / den)

        def loss_p(sq, sk, sv):
            den, so = bucket_rbf_attention_cols_pallas(
                sq, sk, sv, block_size=8)
            return jnp.sum(so / den)

        b = jnp.bfloat16
        g_x = jax.grad(loss_x, argnums=(0, 1, 2))(sq, sk, sv)
        with _ctx():
            g_p = jax.grad(loss_p, argnums=(0, 1, 2))(
                sq.astype(b), sk.astype(b), sv.astype(b))
        for a, gp, nm in zip(g_x, g_p, ("dq", "dk", "dv")):
            assert gp.dtype == b, nm
            scale = np.abs(np.asarray(a)).max()
            np.testing.assert_allclose(
                np.asarray(gp, np.float32), np.asarray(a),
                rtol=6e-2, atol=6e-2 * scale, err_msg=nm,
            )

    def test_bwd_is_gradient_of_bf16_forward_at_scale(self):
        """Regression for the tracking-60k lr=1e-2 collapse (ROADMAP round-3
        bisect): with bf16 operands the backward must be (numerically) the
        AD gradient of the ACTUAL bf16 forward — the converging fullxla
        gradient — not a bf16-degraded approximation of it.

        The regime that exposed the old kernel: RPE-like rows with a large
        per-bucket common mode (sqrt_w·coord ~ 40 at trained sqrt_w scales,
        where the signal is sqrt_w·Δcoord = O(1)). The old bf16-operand
        backward (a) rounded the dlt cotangent to bf16 inside the dq/dk dots
        while summing the UNROUNDED dlt for the -row_sum·q term — breaking
        the Σ dl·(k−q) cancellation and leaving noise ∝ |k|·2⁻⁸ — and (b)
        carried the -½|q̂|² bias through hi/lo bf16 rows whose ~2⁻¹⁶ relative
        error is O(0.1) ABSOLUTE on the logits at |q̂|² ~ 10⁴, so the
        recomputed p disagreed with the forward's. Upcasting the residuals
        to f32 (bf16 products are exact in f32) removes both."""
        from hept_tpu.ops.bucket_attn import bucket_rbf_attention_cols_xla
        from hept_tpu.ops.bucket_attn_pallas import (
            bucket_rbf_attention_cols_pallas,
        )

        r, d_x, cd, dv, nb, bs = 2, 4, 3, 5, 4, 8
        n = nb * bs
        ks = jax.random.split(jax.random.PRNGKey(11), 5)
        common = jax.random.normal(ks[0], (r, cd, nb, 1)) * 40.0
        loc_q = jax.random.normal(ks[1], (r, cd, nb, bs))
        loc_k = jax.random.normal(ks[2], (r, cd, nb, bs))
        b = jnp.bfloat16
        sq = jnp.concatenate(
            [_rand(ks[3], (r, d_x, nb, bs)), common + loc_q], axis=1
        ).reshape(r, d_x + cd, n).astype(b)
        sk = jnp.concatenate(
            [_rand(ks[4], (r, d_x, nb, bs)), common + loc_k], axis=1
        ).reshape(r, d_x + cd, n).astype(b)
        sv = _rand(ks[0], (r, dv, n)).astype(b)

        def loss_x(sq, sk, sv):
            den, so = bucket_rbf_attention_cols_xla(sq, sk, sv, bs)
            return jnp.sum(so / den)

        def loss_p(sq, sk, sv):
            den, so = bucket_rbf_attention_cols_pallas(
                sq, sk, sv, block_size=bs, hybrid="hybrid")
            return jnp.sum(so / den)

        # Reference: the f32-accumulated gradient AT the bf16 point (bf16
        # values are exact in f32, so this is the gradient of the function
        # the bf16 forward actually computes, without XLA AD's own bf16
        # cotangent-accumulation rounding).
        g_ref = jax.grad(loss_x, argnums=(0, 1, 2))(
            sq.astype(jnp.float32), sk.astype(jnp.float32),
            sv.astype(jnp.float32))
        with _ctx():
            g_p = jax.grad(loss_p, argnums=(0, 1, 2))(sq, sk, sv)
        for a, gp, nm in zip(g_ref, g_p, ("dq", "dk", "dv")):
            a = np.asarray(a, np.float32)
            gp = np.asarray(gp, np.float32)
            # elementwise closeness relative to the gradient's overall scale
            # (the old kernel missed by ~10x the forward's own bf16 noise)
            scale = np.abs(a).max()
            np.testing.assert_allclose(
                gp, a, rtol=2e-2, atol=2e-2 * scale, err_msg=nm,
            )

    def test_slab2_matches_hybrid(self):
        """Flat-slab kernels (slab2: g consecutive buckets as one masked
        (S,S) dot on a contiguous lane slice, S = g·bs ≡ 0 mod 128) must
        match the per-bucket path forward and backward, f32 and bf16."""
        from hept_tpu.ops.bucket_attn_pallas import (
            _slab128_g,
            bucket_rbf_attention_cols_pallas,
        )

        r, d, dv, nb, bs = 2, 5, 4, 32, 8
        assert _slab128_g(nb, bs) >= 2
        n = nb * bs
        ks = jax.random.split(jax.random.PRNGKey(9), 3)
        for dt in (jnp.float32, jnp.bfloat16):
            sq = _rand(ks[0], (r, d, n)).astype(dt)
            sk = _rand(ks[1], (r, d, n)).astype(dt)
            sv = _rand(ks[2], (r, dv, n)).astype(dt)

            def make_loss(mode):
                def loss(sq, sk, sv):
                    den, so = bucket_rbf_attention_cols_pallas(
                        sq, sk, sv, block_size=bs, hybrid=mode)
                    return jnp.sum(so / den) + jnp.sum(jnp.log(den))
                return loss

            with _ctx():
                (l_ref, g_ref) = jax.value_and_grad(
                    make_loss("hybrid"), argnums=(0, 1, 2))(sq, sk, sv)
                (l_s, g_s) = jax.value_and_grad(
                    make_loss("slab2"), argnums=(0, 1, 2))(sq, sk, sv)
            tol = 1e-4 if dt == jnp.float32 else 2e-2
            np.testing.assert_allclose(float(l_s), float(l_ref), rtol=tol)
            for a, b, nm in zip(g_ref, g_s, ("dq", "dk", "dv")):
                a = np.asarray(a, np.float32)
                b = np.asarray(b, np.float32)
                scale = max(np.abs(a).max(), 1e-6)
                np.testing.assert_allclose(
                    b, a, rtol=tol, atol=tol * scale, err_msg=f"{dt} {nm}")

    def test_bwd_v2_matches_f32_upcast(self):
        """The bf16-operand v2 backward (_bwd_cols_kernel_v2: hi/lo dlt
        split, exact f32 bias broadcasts, ones-row-consistent sums) must
        track the f32-upcast backward to ~hi/lo representation error at the
        collapse regime — f32-grade gradients at bf16-MXU cost."""
        from hept_tpu.ops.bucket_attn_pallas import (
            bucket_rbf_attention_cols_pallas,
        )

        r, d_x, cd, dv, nb, bs = 2, 4, 3, 5, 4, 8
        n = nb * bs
        ks = jax.random.split(jax.random.PRNGKey(3), 5)
        common = jax.random.normal(ks[0], (r, cd, nb, 1)) * 40.0
        b = jnp.bfloat16
        sq = jnp.concatenate(
            [_rand(ks[3], (r, d_x, nb, bs)),
             common + jax.random.normal(ks[1], (r, cd, nb, bs))], axis=1
        ).reshape(r, d_x + cd, n).astype(b)
        sk = jnp.concatenate(
            [_rand(ks[4], (r, d_x, nb, bs)),
             common + jax.random.normal(ks[2], (r, cd, nb, bs))], axis=1
        ).reshape(r, d_x + cd, n).astype(b)
        sv = _rand(ks[0], (r, dv, n)).astype(b)

        def make_loss(mode):
            def loss(sq, sk, sv):
                den, so = bucket_rbf_attention_cols_pallas(
                    sq, sk, sv, block_size=bs, hybrid=mode)
                return jnp.sum(so / den)
            return loss

        with _ctx():
            g_f32 = jax.grad(make_loss("hybrid"), argnums=(0, 1, 2))(
                sq, sk, sv)
            g_v2 = jax.grad(make_loss("hybrid2"), argnums=(0, 1, 2))(
                sq, sk, sv)
        for a, gp, nm in zip(g_f32, g_v2, ("dq", "dk", "dv")):
            a = np.asarray(a, np.float32)
            gp = np.asarray(gp, np.float32)
            scale = np.abs(a).max()
            np.testing.assert_allclose(
                gp, a, rtol=5e-3, atol=5e-3 * scale, err_msg=nm,
            )

    def test_xla_cols_bf16_close(self):
        from hept_tpu.ops.bucket_attn import bucket_rbf_attention_cols_xla

        sq, sk, sv = self._data()
        den_x, so_x = bucket_rbf_attention_cols_xla(sq, sk, sv, 8)
        b = jnp.bfloat16
        den_b, so_b = bucket_rbf_attention_cols_xla(
            sq.astype(b), sk.astype(b), sv.astype(b), 8)
        assert den_b.dtype == jnp.float32
        np.testing.assert_allclose(
            np.asarray(den_b), np.asarray(den_x), rtol=3e-2, atol=1e-2)
        np.testing.assert_allclose(
            np.asarray(so_b), np.asarray(so_x), rtol=5e-2, atol=3e-2)


def test_model_kernel_bf16_close():
    """End-to-end: kernel_bf16 model output within mixed-precision tolerance
    of the f32-kernel model (same params/constants; XLA path on CPU)."""
    import dataclasses

    from hept_tpu.models import HeptTransformer, TransformerConfig

    cfg = TransformerConfig(
        in_dim=5, coords_dim=4, h_dim=8, num_heads=2, n_layers=2,
        block_size=16, n_hashes=2, num_regions=9, num_w_per_dist=3,
        padding_mode="replicate", qkv_post_sort=True, share_heads=True,
    )
    model = HeptTransformer(cfg)
    key = jax.random.PRNGKey(0)
    kx, kc, kp = jax.random.split(key, 3)
    x = jax.random.normal(kx, (64, cfg.in_dim))
    coords = jax.random.normal(kc, (64, cfg.coords_dim))
    valid = jnp.ones(64, dtype=bool)
    variables = model.init(kp, x, coords, valid)
    m2 = HeptTransformer(dataclasses.replace(cfg, kernel_bf16=True))
    o1 = np.asarray(model.apply(variables, x, coords, valid))
    o2 = np.asarray(m2.apply(variables, x, coords, valid))
    scale = np.abs(o1).max()
    np.testing.assert_allclose(o2, o1, rtol=5e-2, atol=2e-2 * scale)


def test_bitonic_sort_rows_interpret():
    """Pallas bitonic multi-operand sort (ops/sort_pallas.py, kept as a
    validated negative result) matches lax.sort(num_keys=2) exactly —
    interpret mode, small shapes, with ties and padding (n not a power of
    two)."""
    import numpy as np
    from jax.experimental.pallas import tpu as pltpu

    from hept_tpu.ops.sort_pallas import bitonic_sort_rows

    rng = np.random.default_rng(0)
    rows, n, ops = 2, 384, 4  # pads to 512
    keys = rng.standard_normal((rows, n)).astype(np.float32)
    keys[:, -30:] = 3.0e38  # +BIG tail like invalid rows
    keys[:, :40] = np.round(keys[:, :40], 1)  # interior ties
    pays = [
        rng.integers(0, 2**31, (rows, n), dtype=np.int64).astype(np.uint32)
        for _ in range(ops - 1)
    ] + [np.broadcast_to(np.arange(n, dtype=np.uint32), (rows, n)).copy()]

    with pltpu.force_tpu_interpret_mode():
        out = bitonic_sort_rows(
            jnp.asarray(keys), [jnp.asarray(p) for p in pays]
        )
    ref = jax.lax.sort(
        [jnp.asarray(keys), jnp.asarray(pays[-1])]
        + [jnp.asarray(p) for p in pays[:-1]],
        dimension=-1, num_keys=2, is_stable=False,
    )
    np.testing.assert_array_equal(np.asarray(out[-1]), np.asarray(ref[1]))
    for j in range(ops - 1):
        np.testing.assert_array_equal(np.asarray(out[j]), np.asarray(ref[2 + j]))


class TestSlabKernels:
    """Block-diagonal slab kernels (one masked (S, S) MXU dot per g buckets)
    vs the cols XLA golden path — f32 and bf16, fwd and bwd."""

    def _data(self, r=3, d=6, dv=5, nb=10, bs=8, seed=21):
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
        n = nb * bs
        return (
            _rand(k1, (r, d, n)),
            _rand(k2, (r, d, n)),
            _rand(k3, (r, dv, n)),
        )

    def test_fwd_matches_xla(self):
        from hept_tpu.ops.bucket_attn import bucket_rbf_attention_cols_xla
        from hept_tpu.ops.bucket_attn_pallas import (
            bucket_rbf_attention_cols_pallas,
        )

        # nb=10 not divisible by the slab group: exercises the n padding
        sq, sk, sv = self._data()
        den_x, so_x = bucket_rbf_attention_cols_xla(sq, sk, sv, 8)
        with _ctx():
            den_p, so_p = bucket_rbf_attention_cols_pallas(
                sq, sk, sv, block_size=8, hybrid="slab")
        np.testing.assert_allclose(np.asarray(den_p), np.asarray(den_x),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(so_p), np.asarray(so_x),
                                   rtol=1e-5, atol=1e-6)

    def test_bwd_matches_xla(self):
        from hept_tpu.ops.bucket_attn import bucket_rbf_attention_cols_xla
        from hept_tpu.ops.bucket_attn_pallas import (
            bucket_rbf_attention_cols_pallas,
        )

        sq, sk, sv = self._data(seed=22)

        def loss_x(sq, sk, sv):
            den, so = bucket_rbf_attention_cols_xla(sq, sk, sv, 8)
            return jnp.sum(so / den) + jnp.sum(jnp.log(den))

        def loss_p(sq, sk, sv):
            den, so = bucket_rbf_attention_cols_pallas(
                sq, sk, sv, block_size=8, hybrid="slab")
            return jnp.sum(so / den) + jnp.sum(jnp.log(den))

        g_x = jax.grad(loss_x, argnums=(0, 1, 2))(sq, sk, sv)
        with _ctx():
            g_p = jax.grad(loss_p, argnums=(0, 1, 2))(sq, sk, sv)
        for a, b, nm in zip(g_x, g_p, ("dq", "dk", "dv")):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5, err_msg=nm
            )

    def test_hybrid_slab_bwd_matches_xla(self):
        from hept_tpu.ops.bucket_attn import bucket_rbf_attention_cols_xla
        from hept_tpu.ops.bucket_attn_pallas import (
            bucket_rbf_attention_cols_pallas,
        )

        sq, sk, sv = self._data(seed=23)

        def loss_x(sq, sk, sv):
            den, so = bucket_rbf_attention_cols_xla(sq, sk, sv, 8)
            return jnp.sum(so / den)

        def loss_p(sq, sk, sv):
            den, so = bucket_rbf_attention_cols_pallas(
                sq, sk, sv, block_size=8, hybrid="hybrid_slab")
            return jnp.sum(so / den)

        g_x = jax.grad(loss_x, argnums=(0, 1, 2))(sq, sk, sv)
        with _ctx():
            g_p = jax.grad(loss_p, argnums=(0, 1, 2))(sq, sk, sv)
        for a, b, nm in zip(g_x, g_p, ("dq", "dk", "dv")):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5, err_msg=nm
            )

    def test_fwd_bf16_close_to_f32(self):
        from hept_tpu.ops.bucket_attn import bucket_rbf_attention_cols_xla
        from hept_tpu.ops.bucket_attn_pallas import (
            bucket_rbf_attention_cols_pallas,
        )

        sq, sk, sv = self._data(seed=24)
        den_x, so_x = bucket_rbf_attention_cols_xla(sq, sk, sv, 8)
        b = jnp.bfloat16
        with _ctx():
            den_p, so_p = bucket_rbf_attention_cols_pallas(
                sq.astype(b), sk.astype(b), sv.astype(b), block_size=8,
                hybrid="slab")
        assert den_p.dtype == jnp.float32
        np.testing.assert_allclose(
            np.asarray(den_p), np.asarray(den_x), rtol=3e-2, atol=1e-2)
        np.testing.assert_allclose(
            np.asarray(so_p), np.asarray(so_x), rtol=5e-2, atol=3e-2)


class TestLoopKernels:
    def test_loop_modes_match_hybrid(self):
        """fori_loop-scheduled kernels (hybrid2l: loop v2 backward; loop2:
        loop forward + loop v2 backward) must match the per-bucket hybrid
        path forward and backward. hybrid2l's backward is the EXACT v2 math
        under loop scheduling (shared `_bwd_v2_bucket` body); loop2's
        forward differs from the hybrid einsum forward only in the bias
        transport (exact f32 broadcasts vs augmented bf16 hi/lo rows)."""
        from hept_tpu.ops.bucket_attn_pallas import (
            _pick_group_loop,
            bucket_rbf_attention_cols_pallas,
        )

        r, d, dv, nb, bs = 2, 5, 4, 32, 8
        assert _pick_group_loop(nb, bs * (2 * d + 2 * dv + 1) * 4) > 8
        n = nb * bs
        ks = jax.random.split(jax.random.PRNGKey(11), 3)
        sq = _rand(ks[0], (r, d, n)).astype(jnp.bfloat16)
        sk = _rand(ks[1], (r, d, n)).astype(jnp.bfloat16)
        sv = _rand(ks[2], (r, dv, n)).astype(jnp.bfloat16)

        def make_loss(mode):
            def loss(sq, sk, sv):
                den, so = bucket_rbf_attention_cols_pallas(
                    sq, sk, sv, block_size=bs, hybrid=mode)
                return jnp.sum(so / den) + jnp.sum(jnp.log(den))
            return loss

        with _ctx():
            (l_ref, g_ref) = jax.value_and_grad(
                make_loss("hybrid2"), argnums=(0, 1, 2))(sq, sk, sv)
            (l_l, g_l) = jax.value_and_grad(
                make_loss("hybrid2l"), argnums=(0, 1, 2))(sq, sk, sv)
            (l_2, g_2) = jax.value_and_grad(
                make_loss("loop2"), argnums=(0, 1, 2))(sq, sk, sv)
        # hybrid2l: identical math to hybrid2 (scheduling only)
        np.testing.assert_allclose(float(l_l), float(l_ref), rtol=1e-6)
        for a, b, nm in zip(g_ref, g_l, ("dq", "dk", "dv")):
            np.testing.assert_allclose(
                np.asarray(b, np.float32), np.asarray(a, np.float32),
                rtol=1e-5, atol=1e-5, err_msg=f"hybrid2l {nm}")
        # loop2: forward bias transport differs at ~bf16² -> loose tol
        np.testing.assert_allclose(float(l_2), float(l_ref), rtol=2e-2)
        for a, b, nm in zip(g_ref, g_2, ("dq", "dk", "dv")):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            scale = max(np.abs(a).max(), 1e-6)
            np.testing.assert_allclose(
                b, a, rtol=2e-2, atol=2e-2 * scale, err_msg=f"loop2 {nm}")
