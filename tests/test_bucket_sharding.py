"""Bucket-axis intra-event sharding (parallel/bp.py) == single-device core.

The prototype shards the SORTED point axis (whole buckets) of a
share_heads-style HEPT attention layer over a "buckets" mesh axis
(SURVEY §2.9 stretch SP; VERDICT r3 next #8). Correctness bar: forward and
gradients must match `hept_attention_core_xcols(share_heads=True)` on the
virtual 8-device CPU mesh — sharding must be a pure layout change.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hept_tpu.ops.bucket_attn import hept_attention_core_xcols
from hept_tpu.parallel.bp import make_bucket_sharded_attention
from hept_tpu.parallel.mesh import make_mesh


def _inputs(seed=7, h=4, d_model=16, d=16, cd=3, c=2, n=1024):
    rng = np.random.default_rng(seed)
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
    return x_cols, coords_cols, wq, wk, wv, sqrt_w, alpha, codes


BLOCK = 32  # n=1024 = 8 shards x 4 buckets x 32


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh (conftest)")
    return make_mesh(8, ("buckets",), (8,))


def _reference(args):
    return hept_attention_core_xcols(
        *args[:8], None, None,
        block_size=BLOCK, impl="xla", sort_pack=False,
        shared_sort=True, share_heads=True,
    )


def test_bucket_sharded_forward_matches_single_device(mesh):
    args = _inputs()
    want = _reference(args)
    fn = make_bucket_sharded_attention(mesh, "buckets", block_size=BLOCK)
    got = jax.jit(lambda *a: fn(*a, None))(*args)
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6
    )


def test_bucket_sharded_forward_with_invalid_rows(mesh):
    args = _inputs(seed=11)
    n = args[0].shape[-1]
    invalid = jnp.asarray(
        (np.arange(n) >= n - 64)  # one whole trailing block invalid
    )
    want = hept_attention_core_xcols(
        *args[:8], invalid, None,
        block_size=BLOCK, impl="xla", sort_pack=False,
        shared_sort=True, share_heads=True,
    )
    fn = make_bucket_sharded_attention(mesh, "buckets", block_size=BLOCK)
    got = jax.jit(lambda *a: fn(*a, invalid))(*args)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6
    )


def test_bucket_sharded_grads_match_single_device(mesh):
    args = _inputs(seed=23)
    fn = make_bucket_sharded_attention(mesh, "buckets", block_size=BLOCK)
    w = jnp.asarray(
        np.random.default_rng(5).normal(
            size=(args[2].shape[0], args[2].shape[2], args[0].shape[-1])
        ).astype(np.float32)
    )

    # differentiate wrt the hot differentiable inputs: activations, coords,
    # projections and the RPE scales
    def loss_sharded(x, coords, wq, wk, wv, sw):
        return (w * fn(x, coords, wq, wk, wv, sw, *args[6:8], None)).sum()

    def loss_ref(x, coords, wq, wk, wv, sw):
        o = hept_attention_core_xcols(
            x, coords, wq, wk, wv, sw, *args[6:8], None, None,
            block_size=BLOCK, impl="xla", sort_pack=False,
            shared_sort=True, share_heads=True,
        )
        return (w * o).sum()

    diff_args = args[:6]
    g_sh = jax.jit(jax.grad(loss_sharded, argnums=tuple(range(6))))(*diff_args)
    g_rf = jax.jit(jax.grad(loss_ref, argnums=tuple(range(6))))(*diff_args)
    for a, b in zip(g_sh, g_rf):
        # psum/slab accumulation reorders f32 sums vs the single-device
        # pipeline; measured agreement is ~6e-7 relative to the grad scale
        scale = max(1e-3, float(np.abs(np.asarray(b)).max()))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=2e-5 * scale
        )


def test_bucket_sharded_distributed_transport_forward(mesh):
    """transport="distributed": only the comparator sort is replicated; the
    payload rides capped all_to_alls (parallel/dsort.py). Must equal the
    single-device core like the replicated transport does."""
    args = _inputs(seed=31)
    want = _reference(args)
    fn = make_bucket_sharded_attention(
        mesh, "buckets", block_size=BLOCK, transport="distributed",
        cap_factor=4.0,
    )
    got = jax.jit(lambda *a: fn(*a, None))(*args)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6
    )


def test_bucket_sharded_distributed_overflow_poisons(mesh):
    """A cell-cap overflow must POISON the output (NaN), never silently
    mis-route: cap_factor≈0 forces cap=1 and certain overflow."""
    args = _inputs(seed=31)
    fn = make_bucket_sharded_attention(
        mesh, "buckets", block_size=BLOCK, transport="distributed",
        cap_factor=1e-6,
    )
    got = jax.jit(lambda *a: fn(*a, None))(*args)
    assert np.isnan(np.asarray(got)).all()


def test_bucket_sharded_distributed_grads(mesh):
    args = _inputs(seed=23)
    fn = make_bucket_sharded_attention(
        mesh, "buckets", block_size=BLOCK, transport="distributed",
        cap_factor=4.0,
    )
    w = jnp.asarray(
        np.random.default_rng(5).normal(
            size=(args[2].shape[0], args[2].shape[2], args[0].shape[-1])
        ).astype(np.float32)
    )

    def loss_sharded(x, coords, wq, wk, wv, sw):
        return (w * fn(x, coords, wq, wk, wv, sw, *args[6:8], None)).sum()

    def loss_ref(x, coords, wq, wk, wv, sw):
        o = hept_attention_core_xcols(
            x, coords, wq, wk, wv, sw, *args[6:8], None, None,
            block_size=BLOCK, impl="xla", sort_pack=False,
            shared_sort=True, share_heads=True,
        )
        return (w * o).sum()

    diff_args = args[:6]
    g_sh = jax.jit(jax.grad(loss_sharded, argnums=tuple(range(6))))(*diff_args)
    g_rf = jax.jit(jax.grad(loss_ref, argnums=tuple(range(6))))(*diff_args)
    for a, b in zip(g_sh, g_rf):
        scale = max(1e-3, float(np.abs(np.asarray(b)).max()))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=2e-5 * scale
        )


class TestModelLevelBucketSP:
    """VERDICT r4 #7: bucket-axis SP as a MODEL capability — the full
    4-layer HeptTransformer + InfoNCE train step under a ("data",
    "buckets") 2-D mesh must equal the single-device step."""

    @pytest.fixture(scope="class")
    def setup(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-device CPU mesh (conftest)")
        from hept_tpu.data.batching import pack_events
        from hept_tpu.data.synthetic import synthetic_tracking_event
        from hept_tpu.models import HeptTransformer, TransformerConfig
        from hept_tpu.parallel.dp import make_single_device_train_step
        from hept_tpu.train.config import ExperimentConfig
        from hept_tpu.train.optim import make_optimizer
        from hept_tpu.train.state import TrainState
        from hept_tpu.train.trainer import make_loss_fn, make_model_apply

        rng = np.random.default_rng(0)
        events = [
            synthetic_tracking_event(rng, n_points=160) for _ in range(2)
        ]
        # n_max divides by bucket_shards (4) x block_size (16)
        batch = pack_events(events, block_size=16, n_max=192, e_max=4096)
        cfg = TransformerConfig(
            in_dim=events[0].x.shape[1],
            coords_dim=events[0].coords.shape[1],
            task="tracking", h_dim=8, num_heads=2, n_layers=4,
            block_size=16, n_hashes=2, num_regions=9, num_w_per_dist=3,
            dropout=0.0, padding_mode="replicate", attn_impl="xla",
            scan_layers=True, qkv_post_sort=True, shared_sort=True,
            share_heads=True,
        )
        model = HeptTransformer(cfg)
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.asarray(batch["x"][0]),
            jnp.asarray(batch["coords"][0]),
            jnp.asarray(batch["valid"][0]),
        )
        loss_fn = make_loss_fn(ExperimentConfig(task="tracking"))
        tx = make_optimizer("adam", lr=1e-3)

        def fresh_state():
            return TrainState.create(variables, tx, jax.random.PRNGKey(1))

        ref_step = make_single_device_train_step(
            make_model_apply(model), loss_fn, tx
        )
        _, ref_metrics = ref_step(
            fresh_state(), jax.tree_util.tree_map(jnp.asarray, batch)
        )
        return dict(
            cfg=cfg, batch=batch, loss_fn=loss_fn, tx=tx,
            fresh_state=fresh_state,
            ref_loss=float(ref_metrics["loss"]),
            ref_gnorm=float(ref_metrics["grad_norm"]),
        )

    @pytest.mark.parametrize("transport", ["replicated", "distributed"])
    def test_full_model_train_step_matches_single_device(
        self, setup, transport
    ):
        from hept_tpu.models import HeptTransformer
        from hept_tpu.parallel.bp import make_bucket_train_step

        mesh = make_mesh(8, ("data", "buckets"), (2, 4))
        step = make_bucket_train_step(
            HeptTransformer, setup["cfg"], setup["loss_fn"], setup["tx"],
            mesh, transport=transport, cap_factor=4.0,
        )
        _, metrics = step(
            setup["fresh_state"](),
            jax.tree_util.tree_map(jnp.asarray, setup["batch"]),
        )
        loss = float(metrics["loss"])
        gnorm = float(metrics["grad_norm"])
        assert np.isfinite(loss)
        np.testing.assert_allclose(loss, setup["ref_loss"], rtol=1e-5)
        np.testing.assert_allclose(gnorm, setup["ref_gnorm"], rtol=1e-4)
