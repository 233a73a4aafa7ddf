"""Multi-device tests on the virtual 8-CPU mesh: DP train step + head-sharded
attention + graft-entry dryrun."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def test_dp_train_step_runs_and_matches_single_device():
    import numpy as np
    import optax

    from hept_tpu.data.batching import pack_events
    from hept_tpu.data.synthetic import synthetic_tracking_event
    from hept_tpu.models import HeptTransformer, TransformerConfig
    from hept_tpu.parallel.dp import make_dp_train_step, shard_batch
    from hept_tpu.parallel.mesh import make_mesh
    from hept_tpu.train.config import ExperimentConfig
    from hept_tpu.train.optim import make_optimizer
    from hept_tpu.train.state import TrainState
    from hept_tpu.train.trainer import make_loss_fn, make_model_apply

    rng = np.random.default_rng(0)
    events = [synthetic_tracking_event(rng, n_points=96) for _ in range(8)]
    batch = pack_events(events, block_size=16, n_max=112, e_max=2048)

    cfg = TransformerConfig(
        in_dim=events[0].x.shape[1], coords_dim=events[0].coords.shape[1],
        task="tracking", h_dim=8, num_heads=2, n_layers=1, block_size=16,
        n_hashes=2, num_regions=9, num_w_per_dist=3, padding_mode="replicate",
    )
    model = HeptTransformer(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(batch["x"][0]), jnp.asarray(batch["coords"][0]),
        jnp.asarray(batch["valid"][0]),
    )
    exp = ExperimentConfig(task="tracking")
    tx = make_optimizer("adam", lr=1e-3)
    loss_fn = make_loss_fn(exp)
    model_apply = make_model_apply(model)

    results = {}
    for n_dev in (1, 8):
        mesh = make_mesh(n_dev)
        state = TrainState.create(variables, tx, jax.random.PRNGKey(1))
        step = make_dp_train_step(model_apply, loss_fn, tx, mesh, donate=False)
        sb = shard_batch(batch, mesh)
        state, metrics = step(state, sb)
        results[n_dev] = (float(metrics["loss"]), state.params)

    assert np.isfinite(results[1][0])
    np.testing.assert_allclose(results[1][0], results[8][0], rtol=1e-5)
    # parameter updates agree between 1-device and 8-device execution
    for a, b in zip(
        jax.tree_util.tree_leaves(results[1][1]),
        jax.tree_util.tree_leaves(results[8][1]),
    ):
        # cross-device psum reduction order differs from the single-device
        # sum; adam's rsqrt amplifies the fp32 noise slightly
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-5)


def test_head_sharded_attention_matches_single_device():
    from hept_tpu.core import e2lsh_init
    from hept_tpu.ops import hept_attention_core
    from hept_tpu.parallel.mesh import make_mesh
    from hept_tpu.parallel.sp import head_sharded_attention
    from jax.sharding import Mesh

    h, n, d, dv, c, bs = 8, 64, 5, 4, 2, 16
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (h, n, d))
    k = jax.random.normal(kk, (h, n, d))
    v = jax.random.normal(kv, (h, n, dv))
    alpha = e2lsh_init(jax.random.PRNGKey(1), h, d, c)
    codes = jax.random.randint(jax.random.PRNGKey(2), (c, h, n), 0, 4).astype(jnp.float32)
    invalid = jnp.zeros(n, dtype=bool)

    expected = hept_attention_core(q, k, v, alpha, codes, invalid, block_size=bs)

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("heads",))
    sharded = head_sharded_attention(mesh, "heads", block_size=bs)
    got = sharded(q, k, v, alpha, codes, invalid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-4, atol=1e-5)


def test_graft_dryrun():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_tp_head_sharded_train_step_matches_dp():
    """DP × head-TP (2x4 mesh) must produce the same loss and parameter
    update as plain 8-way DP / single device (VERDICT next #8: trains via
    config'd mesh alone; dropout off here for determinism)."""
    import numpy as np

    from hept_tpu.data.batching import pack_events
    from hept_tpu.data.synthetic import synthetic_tracking_event
    from hept_tpu.models import HeptTransformer, TransformerConfig
    from hept_tpu.parallel.dp import make_dp_train_step, shard_batch
    from hept_tpu.parallel.mesh import make_mesh
    from hept_tpu.parallel.tp import make_tp_train_step, shard_batch_2d
    from hept_tpu.train.config import ExperimentConfig
    from hept_tpu.train.optim import make_optimizer
    from hept_tpu.train.state import TrainState
    from hept_tpu.train.trainer import make_loss_fn, make_model_apply

    rng = np.random.default_rng(0)
    events = [synthetic_tracking_event(rng, n_points=96) for _ in range(2)]
    batch = pack_events(events, block_size=16, n_max=112, e_max=2048)

    cfg = TransformerConfig(
        in_dim=events[0].x.shape[1], coords_dim=events[0].coords.shape[1],
        task="tracking", h_dim=8, num_heads=4, n_layers=2, block_size=16,
        n_hashes=2, num_regions=9, num_w_per_dist=3, padding_mode="replicate",
        dropout=0.0,
    )
    model = HeptTransformer(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(batch["x"][0]), jnp.asarray(batch["coords"][0]),
        jnp.asarray(batch["valid"][0]),
    )
    exp = ExperimentConfig(task="tracking")
    # SGD: updates are linear in the grads, so fp-reordering noise is not
    # amplified (adam's rsqrt blows up near-zero grad elements) and the
    # DP-vs-TP comparison can be tight.
    import optax

    tx = optax.sgd(1e-2)
    loss_fn = make_loss_fn(exp)

    # baseline: 2-way DP
    mesh_dp = make_mesh(2)
    state = TrainState.create(variables, tx, jax.random.PRNGKey(1))
    dp_step = make_dp_train_step(
        make_model_apply(model), loss_fn, tx, mesh_dp, donate=False
    )
    dp_state, dp_metrics = dp_step(state, shard_batch(batch, mesh_dp))

    # DP x TP: 2 data shards x 4 head shards
    mesh = make_mesh(8, ("data", "heads"), (2, 4))
    state = TrainState.create(variables, tx, jax.random.PRNGKey(1))
    tp_step = make_tp_train_step(
        HeptTransformer, cfg, loss_fn, tx, mesh, variables
    )
    tp_state, tp_metrics = tp_step(state, shard_batch_2d(batch, mesh))

    np.testing.assert_allclose(
        float(dp_metrics["loss"]), float(tp_metrics["loss"]), rtol=1e-5
    )
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(dp_state.params),
        jax.tree_util.tree_leaves_with_path(tp_state.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6,
            err_msg=f"{pa}",
        )


def test_tp_hash_and_head_sharded_matches_dp():
    """DP x hash-TP x head-TP on a (2,2,2) mesh matches 2-way DP — including
    events whose size is NOT a block multiple (replication pads must use the
    shard-invariant global hash-0/head-0 code plan)."""
    import numpy as np
    import optax

    from hept_tpu.data.batching import pack_events
    from hept_tpu.data.synthetic import synthetic_tracking_event
    from hept_tpu.parallel.dp import make_dp_train_step, shard_batch
    from hept_tpu.parallel.mesh import make_mesh
    from hept_tpu.parallel.tp import make_tp_train_step, shard_batch_2d
    from hept_tpu.models import HeptTransformer, TransformerConfig
    from hept_tpu.train.config import ExperimentConfig
    from hept_tpu.train.state import TrainState
    from hept_tpu.train.trainer import make_loss_fn, make_model_apply

    rng = np.random.default_rng(0)
    # 90 and 75 points with block 16: replication pads are REAL replicas
    events = [synthetic_tracking_event(rng, n_points=n) for n in (90, 75)]
    batch = pack_events(events, block_size=16, n_max=96, e_max=2048)

    cfg = TransformerConfig(
        in_dim=events[0].x.shape[1], coords_dim=events[0].coords.shape[1],
        task="tracking", h_dim=8, num_heads=4, n_layers=2, block_size=16,
        n_hashes=2, num_regions=9, num_w_per_dist=3, padding_mode="replicate",
        dropout=0.0,
    )
    model = HeptTransformer(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(batch["x"][0]), jnp.asarray(batch["coords"][0]),
        jnp.asarray(batch["valid"][0]),
    )
    exp = ExperimentConfig(task="tracking")
    import optax

    tx = optax.sgd(1e-2)
    loss_fn = make_loss_fn(exp)

    mesh_dp = make_mesh(2)
    state = TrainState.create(variables, tx, jax.random.PRNGKey(1))
    dp_step = make_dp_train_step(
        make_model_apply(model), loss_fn, tx, mesh_dp, donate=False
    )
    dp_state, dp_metrics = dp_step(state, shard_batch(batch, mesh_dp))

    mesh = make_mesh(8, ("data", "hashes", "heads"), (2, 2, 2))
    state = TrainState.create(variables, tx, jax.random.PRNGKey(1))
    tp_step = make_tp_train_step(
        HeptTransformer, cfg, loss_fn, tx, mesh, variables,
        head_axis="heads", hash_axis="hashes",
    )
    tp_state, tp_metrics = tp_step(state, shard_batch_2d(batch, mesh))

    np.testing.assert_allclose(
        float(dp_metrics["loss"]), float(tp_metrics["loss"]), rtol=1e-5
    )
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(dp_state.params),
        jax.tree_util.tree_leaves_with_path(tp_state.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6,
            err_msg=f"{pa}",
        )
