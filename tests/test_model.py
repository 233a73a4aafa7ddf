"""HeptTransformer model tests: shapes, grads, padding invariance, batching."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hept_tpu.models import HeptTransformer, TransformerConfig, make_batched_apply


def _make(cfg_kwargs=None, n=64, seed=0):
    cfg = TransformerConfig(
        in_dim=5,
        coords_dim=4,
        h_dim=8,
        num_heads=2,
        n_layers=2,
        block_size=16,
        n_hashes=2,
        num_regions=9,
        num_w_per_dist=3,
        **(cfg_kwargs or {}),
    )
    model = HeptTransformer(cfg)
    key = jax.random.PRNGKey(seed)
    kx, kc, kp = jax.random.split(key, 3)
    x = jax.random.normal(kx, (n, cfg.in_dim))
    coords = jax.random.normal(kc, (n, cfg.coords_dim))
    valid = jnp.ones(n, dtype=bool)
    variables = model.init(kp, x, coords, valid)
    return model, cfg, variables, x, coords, valid


class TestForward:
    def test_tracking_output_shape(self):
        model, cfg, variables, x, coords, valid = _make()
        out = model.apply(variables, x, coords, valid)
        assert out.shape == (64, cfg.h_dim // 2)
        assert np.isfinite(np.asarray(out)).all()

    def test_pileup_output_sigmoid(self):
        model, cfg, variables, x, coords, valid = _make({"task": "pileup"})
        # pileup: last feature column is integer PID in [0, 7)
        x = x.at[:, -1].set(jnp.arange(64) % 7)
        variables = model.init(jax.random.PRNGKey(1), x, coords, valid)
        out = model.apply(variables, x, coords, valid)
        assert out.shape == (64, 1)
        assert (np.asarray(out) >= 0).all() and (np.asarray(out) <= 1).all()

    def test_constants_collection_frozen_arrays(self):
        _, cfg, variables, *_ = _make()
        assert "constants" in variables
        flat = jax.tree_util.tree_leaves(variables["constants"])
        # regions + one alpha per layer
        assert len(flat) == 1 + cfg.n_layers


class TestPaddingModes:
    @pytest.mark.parametrize("mode", ["zero", "replicate"])
    def test_padded_event_runs_and_is_finite(self, mode):
        model, cfg, variables, x, coords, valid = _make({"padding_mode": mode})
        valid = jnp.arange(64) < 45  # ragged event in a 64-slot buffer
        out = model.apply(variables, x, coords, valid)
        assert np.isfinite(np.asarray(out)[:45]).all()

    def test_inert_padding_does_not_change_real_outputs(self):
        # Replicate mode: with n_valid a multiple of block_size there are no
        # replicas and no partial buckets, and region sizes derive from the
        # valid count — so a full-buffer event vs the same event + inert slots
        # must give identical real-row outputs. (Zero mode intentionally lacks
        # this invariance: the reference partitions the padded array.)
        mode = "replicate"
        model, cfg, variables, x, coords, valid = _make({"padding_mode": mode}, n=32)
        out_full = model.apply(variables, x, coords, valid)

        cfg2 = TransformerConfig(**{**cfg.__dict__})
        model2 = HeptTransformer(cfg2)
        x2 = jnp.concatenate([x, jnp.zeros((32, x.shape[1]))])
        c2 = jnp.concatenate([coords, jnp.zeros((32, coords.shape[1]))])
        v2 = jnp.arange(64) < 32
        out_pad = model2.apply(variables, x2, c2, v2)
        np.testing.assert_allclose(
            np.asarray(out_pad[:32]), np.asarray(out_full), rtol=2e-4, atol=1e-5
        )


class TestTraining:
    def test_grads_flow_and_constants_untouched(self):
        model, cfg, variables, x, coords, valid = _make()

        def loss_fn(params):
            out = model.apply(
                {"params": params, "constants": variables["constants"]},
                x, coords, valid,
            )
            return jnp.sum(out**2)

        grads = jax.grad(loss_fn)(variables["params"])
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
        nonzero = sum(float(np.abs(np.asarray(g)).sum()) > 0 for g in leaves)
        assert nonzero >= len(leaves) - 2  # norm biases may start at 0 grad

    def test_dropout_rng(self):
        model, cfg, variables, x, coords, valid = _make()
        out1 = model.apply(
            variables, x, coords, valid, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        out2 = model.apply(
            variables, x, coords, valid, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        assert np.abs(np.asarray(out1) - np.asarray(out2)).max() > 1e-6


class TestBatchedApply:
    def test_vmap_matches_loop(self):
        model, cfg, variables, x, coords, valid = _make()
        B = 3
        xs = jnp.stack([x, x * 0.5, x * 2.0])
        cs = jnp.stack([coords, coords + 1.0, coords - 1.0])
        vs = jnp.stack([valid, jnp.arange(64) < 48, jnp.arange(64) < 32])
        batched = make_batched_apply(model)
        out_b = batched(variables, xs, cs, vs)
        assert out_b.shape == (B, 64, cfg.h_dim // 2)
        for i in range(B):
            out_i = model.apply(variables, xs[i], cs[i], vs[i])
            n_i = int(vs[i].sum())
            np.testing.assert_allclose(
                np.asarray(out_b[i, :n_i]), np.asarray(out_i[:n_i]), rtol=1e-5, atol=1e-6
            )


class TestScanLayers:
    """scan_layers=True compiles one layer body; restacked loop params must
    reproduce loop outputs exactly (same math, different param layout)."""

    def test_scan_matches_loop(self):
        import dataclasses

        from hept_tpu.models.transformer import (
            stack_layer_params,
            unstack_layer_params,
        )

        model, cfg, variables, x, coords, valid = _make()
        scan_model = HeptTransformer(dataclasses.replace(cfg, scan_layers=True))
        scan_vars = {
            "params": stack_layer_params(variables["params"], cfg.n_layers),
            "constants": stack_layer_params(variables["constants"], cfg.n_layers),
        }
        out_loop = model.apply(variables, x, coords, valid)
        out_scan = scan_model.apply(scan_vars, x, coords, valid)
        np.testing.assert_allclose(
            np.asarray(out_scan), np.asarray(out_loop), rtol=1e-6, atol=1e-6
        )

        # roundtrip + scan-init structural match
        rt = unstack_layer_params(scan_vars["params"])
        chex_equal = jax.tree_util.tree_all(
            jax.tree_util.tree_map(
                lambda a, b: jnp.array_equal(a, b), rt, variables["params"]
            )
        )
        assert chex_equal
        si = jax.eval_shape(
            lambda: scan_model.init(jax.random.PRNGKey(0), x, coords, valid)
        )
        assert jax.tree_util.tree_structure(si["params"]) == \
            jax.tree_util.tree_structure(scan_vars["params"])

    def test_scan_grads_flow(self):
        model, cfg, variables, x, coords, valid = _make({"scan_layers": True})

        def loss_fn(params):
            out = model.apply(
                {"params": params, "constants": variables["constants"]},
                x, coords, valid,
            )
            return jnp.sum(out**2)

        g = jax.grad(loss_fn)(variables["params"])
        norms = [float(jnp.linalg.norm(a)) for a in jax.tree_util.tree_leaves(g)]
        assert all(np.isfinite(n) for n in norms)
        assert sum(n > 0 for n in norms) > len(norms) * 0.8

    def test_use_ckpt_matches_plain(self):
        """use_ckpt (nn.remat, reference transformer.py:138-140) is a pure
        memory/recompute trade: outputs and gradients must equal the
        non-remat loop exactly."""
        import dataclasses

        model, cfg, variables, x, coords, valid = _make()
        ck_model = HeptTransformer(dataclasses.replace(cfg, use_ckpt=True))

        out = model.apply(variables, x, coords, valid)
        out_ck = ck_model.apply(variables, x, coords, valid)
        np.testing.assert_allclose(
            np.asarray(out_ck), np.asarray(out), rtol=1e-6, atol=1e-6
        )

        def loss_fn(m):
            def f(params):
                o = m.apply(
                    {"params": params, "constants": variables["constants"]},
                    x, coords, valid,
                )
                return jnp.sum(o**2)
            return jax.grad(f)(variables["params"])

        g, g_ck = loss_fn(model), loss_fn(ck_model)
        for a, b in zip(jax.tree_util.tree_leaves(g),
                        jax.tree_util.tree_leaves(g_ck)):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-6
            )


class TestFlatBatching:
    """Flat batching (batch-index AND codes, reference example design) must
    reproduce per-event outputs: separate key ranges per event + per-event
    bucket alignment make the flat forward bucket-identical."""

    def test_flat_matches_per_event(self):
        from hept_tpu.models.transformer import make_flat_batched_apply

        model, cfg, variables, x0, c0, v0 = _make(
            {"padding_mode": "replicate"}, n=64, seed=0
        )
        k = jax.random.PRNGKey(9)
        x1 = jax.random.normal(k, x0.shape)
        c1 = jax.random.normal(jax.random.split(k)[0], c0.shape)
        x = jnp.stack([x0, x1]); c = jnp.stack([c0, c1])
        v = jnp.stack([v0, v0])

        flat = make_flat_batched_apply(model)
        out_flat = flat(variables, x, c, v)
        out0 = model.apply(variables, x0, c0, v0)
        out1 = model.apply(variables, x1, c1, v0)
        np.testing.assert_allclose(
            np.asarray(out_flat[0]), np.asarray(out0), rtol=2e-5, atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(out_flat[1]), np.asarray(out1), rtol=2e-5, atol=2e-5
        )

    def test_flat_grads_flow(self):
        from hept_tpu.models.transformer import make_flat_batched_apply

        model, cfg, variables, x0, c0, v0 = _make(
            {"padding_mode": "replicate", "scan_layers": True}, n=64, seed=1
        )
        x = jnp.stack([x0, x0 * 1.1]); c = jnp.stack([c0, c0])
        v = jnp.stack([v0, v0])
        flat = make_flat_batched_apply(model)

        def loss(params):
            out = flat({"params": params, "constants": variables["constants"]},
                       x, c, v)
            return jnp.sum(out ** 2)

        g = jax.grad(loss)(variables["params"])
        norms = [float(jnp.linalg.norm(a)) for a in jax.tree_util.tree_leaves(g)]
        assert all(np.isfinite(nm) for nm in norms)


class TestPostSortProjections:
    def test_qkv_post_sort_matches_default(self):
        """qkv_post_sort sorts [x|coords] and projects after the bucket sort
        (ops/bucket_attn.py hept_attention_core_xcols); the param tree is
        identical and outputs match the default path to fp32 reordering."""
        model, cfg, variables, x, coords, valid = _make(
            {"padding_mode": "replicate"}, n=64
        )
        import dataclasses

        cfg2 = dataclasses.replace(cfg, qkv_post_sort=True)
        model2 = HeptTransformer(cfg2)
        v2 = model2.init(jax.random.PRNGKey(0), x, coords, valid)
        # identical parameter trees (KernelOnly mirrors TorchLinear paths)
        assert jax.tree_util.tree_structure(variables) == \
            jax.tree_util.tree_structure(v2)
        for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(variables),
            jax.tree_util.tree_leaves_with_path(v2),
        ):
            assert a.shape == b.shape, pa

        out1 = model.apply(variables, x, coords, valid)
        out2 = model2.apply(variables, x, coords, valid)
        np.testing.assert_allclose(
            np.asarray(out1), np.asarray(out2), rtol=2e-4, atol=2e-5
        )

    def test_qkv_post_sort_grads(self):
        model, cfg, variables, x, coords, valid = _make(
            {"padding_mode": "replicate", "qkv_post_sort": True}, n=64
        )

        def loss(params):
            o = model.apply(
                {"params": params, "constants": variables["constants"]},
                x, coords, valid,
            )
            return jnp.sum(o ** 2)

        g = jax.grad(loss)(variables["params"])
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        # projection kernels receive gradient through the post-sort path
        gq = g["block_0"]["w_q"]["kernel"]
        assert float(jnp.abs(gq).max()) > 0


class TestSharedSort:
    def test_single_bucket_matches_separate(self):
        """With one bucket covering all points, q/k order is irrelevant —
        shared_sort must reproduce the separate-sorts output exactly (up to
        fp32 reordering)."""
        import dataclasses

        model, cfg, _, x, coords, valid = _make(
            {"padding_mode": "replicate", "qkv_post_sort": True}, n=64
        )
        cfg = dataclasses.replace(cfg, block_size=64, num_regions=1)
        model = HeptTransformer(cfg)
        variables = model.init(jax.random.PRNGKey(0), x, coords, valid)
        m2 = HeptTransformer(dataclasses.replace(cfg, shared_sort=True))
        o1 = np.asarray(model.apply(variables, x, coords, valid))
        o2 = np.asarray(m2.apply(variables, x, coords, valid))
        np.testing.assert_allclose(o1, o2, rtol=2e-4, atol=2e-5)

    def test_forward_and_grads_finite(self):
        model, cfg, variables, x, coords, valid = _make(
            {"padding_mode": "replicate", "qkv_post_sort": True,
             "shared_sort": True}, n=64
        )
        out = model.apply(variables, x, coords, valid)
        assert np.isfinite(np.asarray(out)).all()

        def loss(params):
            o = model.apply(
                {"params": params, "constants": variables["constants"]},
                x, coords, valid,
            )
            return jnp.sum(o ** 2)

        g = jax.grad(loss)(variables["params"])
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        gq = g["block_0"]["w_q"]["kernel"]
        assert float(jnp.abs(gq).max()) > 0

    def test_changes_bucketing_in_general(self):
        """With many regions the q buckets genuinely differ between the two
        modes (guards against shared_sort silently being a no-op)."""
        import dataclasses

        model, cfg, variables, x, coords, valid = _make(
            {"padding_mode": "replicate", "qkv_post_sort": True}, n=64
        )
        m2 = HeptTransformer(dataclasses.replace(cfg, shared_sort=True))
        o1 = np.asarray(model.apply(variables, x, coords, valid))
        o2 = np.asarray(m2.apply(variables, x, coords, valid))
        assert not np.allclose(o1, o2, rtol=1e-5, atol=1e-6)


class TestShareHeads:
    def test_single_bucket_matches_per_head(self):
        """With one bucket covering all points, bucket composition is
        independent of the hash — share_heads must reproduce the per-head
        post_sort output exactly (attention within a bucket is
        permutation-invariant)."""
        import dataclasses

        model, cfg, _, x, coords, valid = _make(
            {"padding_mode": "replicate", "qkv_post_sort": True}, n=64
        )
        cfg = dataclasses.replace(cfg, block_size=64, num_regions=1)
        model = HeptTransformer(cfg)
        variables = model.init(jax.random.PRNGKey(0), x, coords, valid)
        m2 = HeptTransformer(dataclasses.replace(cfg, share_heads=True))
        # param trees are identical; constants differ (shared alpha has a
        # head axis of 1) — reuse params, take m2's own constants.
        v2 = m2.init(jax.random.PRNGKey(0), x, coords, valid)
        assert v2["constants"]["block_0"]["attn"]["e2lsh_alpha"].shape[0] == 1
        o1 = np.asarray(model.apply(variables, x, coords, valid))
        o2 = np.asarray(
            m2.apply(
                {"params": variables["params"], "constants": v2["constants"]},
                x, coords, valid,
            )
        )
        np.testing.assert_allclose(o1, o2, rtol=2e-4, atol=2e-5)

    def test_forward_and_grads_finite(self):
        model, cfg, variables, x, coords, valid = _make(
            {"padding_mode": "replicate", "qkv_post_sort": True,
             "share_heads": True}, n=64
        )
        out = model.apply(variables, x, coords, valid)
        assert np.isfinite(np.asarray(out)).all()

        def loss(params):
            o = model.apply(
                {"params": params, "constants": variables["constants"]},
                x, coords, valid,
            )
            return jnp.sum(o ** 2)

        g = jax.grad(loss)(variables["params"])
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        gq = g["block_0"]["w_q"]["kernel"]
        assert float(jnp.abs(gq).max()) > 0

    def test_changes_bucketing_in_general(self):
        """With many regions the shared-grid buckets genuinely differ from
        the per-head grids (guards against share_heads being a no-op)."""
        import dataclasses

        model, cfg, variables, x, coords, valid = _make(
            {"padding_mode": "replicate", "qkv_post_sort": True}, n=64
        )
        m2 = HeptTransformer(dataclasses.replace(cfg, share_heads=True))
        v2 = m2.init(jax.random.PRNGKey(0), x, coords, valid)
        o1 = np.asarray(model.apply(variables, x, coords, valid))
        o2 = np.asarray(
            m2.apply(
                {"params": variables["params"], "constants": v2["constants"]},
                x, coords, valid,
            )
        )
        assert not np.allclose(o1, o2, rtol=1e-5, atol=1e-6)

    def test_flat_batch_matches_per_event(self):
        """share_heads composes with flat batching (batch-index AND codes
        slice to head 0 per hash round)."""
        from hept_tpu.models.transformer import make_flat_batched_apply

        model, cfg, variables, x0, c0, v0 = _make(
            {"padding_mode": "replicate", "qkv_post_sort": True,
             "share_heads": True}, n=64
        )
        k = jax.random.PRNGKey(9)
        x1 = jax.random.normal(k, x0.shape)
        c1 = jax.random.normal(jax.random.split(k)[0], c0.shape)
        x = jnp.stack([x0, x1]); c = jnp.stack([c0, c1])
        v = jnp.stack([v0, v0])
        flat = make_flat_batched_apply(model)
        out_flat = flat(variables, x, c, v)
        out0 = model.apply(variables, x0, c0, v0)
        out1 = model.apply(variables, x1, c1, v0)
        np.testing.assert_allclose(
            np.asarray(out_flat[0]), np.asarray(out0), rtol=2e-5, atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(out_flat[1]), np.asarray(out1), rtol=2e-5, atol=2e-5
        )


class TestStackedBatching:
    """sort_events > 1: events ride the bucket sorts as separate batch rows
    (linear in B, no batch codes) — must reproduce per-event outputs."""

    @pytest.mark.parametrize("extra", [
        {},  # per-head hashing
        {"shared_sort": True},
        {"share_heads": True},
    ])
    def test_matches_per_event(self, extra):
        import dataclasses

        from hept_tpu.models.transformer import make_flat_batched_apply

        model1, cfg, variables, x0, c0, v0 = _make(
            {"padding_mode": "replicate", "qkv_post_sort": True, **extra}, n=64
        )
        k = jax.random.PRNGKey(9)
        x1 = jax.random.normal(k, x0.shape)
        c1 = jax.random.normal(jax.random.split(k)[0], c0.shape)
        x = jnp.stack([x0, x1]); c = jnp.stack([c0, c1])
        v = jnp.stack([v0, v0])

        m2 = HeptTransformer(dataclasses.replace(cfg, sort_events=2))
        flat = make_flat_batched_apply(m2)
        out_flat = flat(variables, x, c, v)
        out0 = model1.apply(variables, x0, c0, v0)
        out1 = model1.apply(variables, x1, c1, v0)
        np.testing.assert_allclose(
            np.asarray(out_flat[0]), np.asarray(out0), rtol=2e-5, atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(out_flat[1]), np.asarray(out1), rtol=2e-5, atol=2e-5
        )

    def test_grads_flow(self):
        import dataclasses

        from hept_tpu.models.transformer import make_flat_batched_apply

        _, cfg, variables, x0, c0, v0 = _make(
            {"padding_mode": "replicate", "qkv_post_sort": True,
             "share_heads": True, "scan_layers": True}, n=64
        )
        m2 = HeptTransformer(dataclasses.replace(cfg, sort_events=2))
        x = jnp.stack([x0, x0 * 1.1]); c = jnp.stack([c0, c0])
        v = jnp.stack([v0, v0])
        flat = make_flat_batched_apply(m2)

        def loss(params):
            out = flat({"params": params, "constants": variables["constants"]},
                       x, c, v)
            return jnp.sum(out ** 2)

        g = jax.grad(loss)(variables["params"])
        norms = [float(jnp.linalg.norm(a)) for a in jax.tree_util.tree_leaves(g)]
        assert all(np.isfinite(nm) for nm in norms)
        assert sum(norms) > 0


def test_unsort_pack_close_to_f32():
    """unsort_pack moves the OR-combine accumulands as bf16 pairs; outputs
    must stay within bf16-rounding distance of the f32 unsort."""
    import dataclasses

    model, cfg, variables, x, coords, valid = _make(
        {"padding_mode": "replicate", "sort_pack": True}, n=64
    )
    m2 = HeptTransformer(dataclasses.replace(cfg, unsort_pack=True))
    o1 = np.asarray(model.apply(variables, x, coords, valid))
    o2 = np.asarray(m2.apply(variables, x, coords, valid))
    scale = np.abs(o1).max()
    assert np.abs(o1 - o2).max() < 0.02 * scale
    assert np.isfinite(o2).all()
