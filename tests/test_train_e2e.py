"""End-to-end train-to-metric smoke tests on micro synthetic datasets."""

import numpy as np
import pytest

from hept_tpu.data.datasets import make_synthetic_pileup, make_synthetic_tracking
from hept_tpu.train.config import ExperimentConfig
from hept_tpu.train.trainer import run_one_seed

TINY_MODEL = dict(
    block_size=16,
    n_hashes=2,
    num_regions=9,
    num_heads=2,
    h_dim=8,
    n_layers=2,
    num_w_per_dist=3,
)


def test_tracking_e2e(tmp_path):
    ds = make_synthetic_tracking(n_events=8, n_points=128, seed=0)
    cfg = ExperimentConfig(
        task="tracking",
        model_kwargs=TINY_MODEL,
        optimizer_kwargs={"lr": 1e-3},
        num_epochs=2,
        batch_size=2,
        main_metric="accuracy@0.9",
        mode="max",
        log_dir=str(tmp_path),
        attn_impl="xla",
    )
    res = run_one_seed(cfg, dataset=ds)
    assert np.isfinite(res["loss"])
    for key in ("accuracy@0.9", "precision@0.9", "recall@0.9", "accuracy@0"):
        assert 0.0 <= res[key] <= 1.0


def test_eval_shape_check_passes_on_healthy_model(tmp_path, capsys):
    """The opt-in end-of-run shape cross-check (re-eval at perturbed n_max/
    e_max) must agree with the same-shapes re-eval on a healthy backend —
    padding is inert. Guards the detector for shape-specific wrong-results
    in compiled eval programs (ROADMAP round 4 'RE-DIAGNOSED')."""
    ds = make_synthetic_tracking(n_events=8, n_points=128, seed=0)
    cfg = ExperimentConfig(
        task="tracking",
        model_kwargs=TINY_MODEL,
        optimizer_kwargs={"lr": 1e-3},
        num_epochs=2,
        batch_size=2,
        main_metric="accuracy@0.9",
        mode="max",
        log_dir=str(tmp_path),
        attn_impl="xla",
        eval_shape_check=True,
    )
    res = run_one_seed(cfg, dataset=ds)
    assert np.isfinite(res["loss"])
    out = capsys.readouterr().out
    assert "shape cross-check ok" in out
    assert "shape cross-check failed" not in out


def test_eval_chunking_metric_equivalence(tmp_path):
    """evaluate() with the lax.map'ed chunked eval step (eval_chunk=3 over
    7 batches: two full chunks + a size-1 remainder) must produce the SAME
    metrics as per-batch eval — chunking is a dispatch optimization only
    (VERDICT r3 #9)."""
    import jax.numpy as jnp

    from hept_tpu.data.batching import pack_events
    from hept_tpu.train.trainer import (
        build_model, evaluate, make_model_apply,
    )

    ds = make_synthetic_tracking(n_events=10, n_points=96, seed=3)
    res = {}
    for chunk in (1, 3):
        cfg = ExperimentConfig(
            task="tracking",
            model_kwargs=TINY_MODEL,
            batch_size=1,
            main_metric="accuracy@0.9",
            log_dir=str(tmp_path),
            attn_impl="xla",
            eval_chunk=chunk,
        )
        model, model_cfg = build_model(cfg, ds.in_dim, ds.coords_dim)
        model_apply = make_model_apply(model, model_cfg)
        ev0 = ds.train[0]
        b0 = pack_events([ev0], 16, n_max=96, e_max=4096)
        import jax

        variables = model.init(
            jax.random.PRNGKey(0), jnp.asarray(b0["x"][0]),
            jnp.asarray(b0["coords"][0]), jnp.asarray(b0["valid"][0]),
        )
        ds._eval_batch_cache = {}  # isolate runs
        res[chunk] = evaluate(cfg, model_apply, variables, ds, "train",
                              16, 96, 4096)
    for k in res[1]:
        np.testing.assert_allclose(res[3][k], res[1][k], rtol=1e-6,
                                   err_msg=k)


def test_eval_split_programs_metric_equivalence(tmp_path):
    """eval_split_programs (separate fwd / loss+metric jits — the fused-
    program corruption-class mitigation, config.py) must produce the SAME
    metrics as the fused eval, for both per-batch and chunked eval."""
    import jax
    import jax.numpy as jnp

    from hept_tpu.data.batching import pack_events
    from hept_tpu.train.trainer import (
        build_model, evaluate, make_model_apply,
    )

    ds = make_synthetic_tracking(n_events=7, n_points=96, seed=5)
    res = {}
    for split_programs in (False, True):
        for chunk in (1, 3):
            cfg = ExperimentConfig(
                task="tracking",
                model_kwargs=TINY_MODEL,
                batch_size=1,
                main_metric="accuracy@0.9",
                log_dir=str(tmp_path),
                attn_impl="xla",
                eval_chunk=chunk,
                eval_split_programs=split_programs,
            )
            model, model_cfg = build_model(cfg, ds.in_dim, ds.coords_dim)
            model_apply = make_model_apply(model, model_cfg)
            ev0 = ds.train[0]
            b0 = pack_events([ev0], 16, n_max=96, e_max=4096)
            variables = model.init(
                jax.random.PRNGKey(0), jnp.asarray(b0["x"][0]),
                jnp.asarray(b0["coords"][0]), jnp.asarray(b0["valid"][0]),
            )
            ds._eval_batch_cache = {}
            res[(split_programs, chunk)] = evaluate(
                cfg, model_apply, variables, ds, "train", 16, 96, 4096)
    base = res[(False, 1)]
    for key, r in res.items():
        for k in base:
            np.testing.assert_allclose(r[k], base[k], rtol=1e-6,
                                       err_msg=f"{key} {k}")


def test_pileup_e2e(tmp_path):
    ds = make_synthetic_pileup(n_events=8, n_points=128, seed=0)
    cfg = ExperimentConfig(
        task="pileup",
        model_kwargs=TINY_MODEL,
        loss_name="focal",
        optimizer_kwargs={"lr": 1e-3},
        lr_scheduler_name="impatient",
        lr_scheduler_metric="loss",
        num_epochs=2,
        batch_size=2,
        main_metric="auc",
        mode="max",
        log_dir=str(tmp_path),
        attn_impl="xla",
    )
    res = run_one_seed(cfg, dataset=ds)
    assert np.isfinite(res["loss"])
    assert 0.0 <= res["auc"] <= 1.0
    assert 0.0 <= res["roc"] <= 1.0


def test_training_reduces_loss(tmp_path):
    # a few more epochs on one batch: train loss must drop measurably
    import jax
    import jax.numpy as jnp
    import optax

    from hept_tpu.data.batching import pack_events
    from hept_tpu.models import HeptTransformer, TransformerConfig
    from hept_tpu.train.losses import infonce_loss
    from hept_tpu.data.synthetic import synthetic_tracking_event

    rng = np.random.default_rng(1)
    ev = synthetic_tracking_event(rng, n_points=128)
    b = pack_events([ev], block_size=16)
    cfg = TransformerConfig(
        in_dim=ev.x.shape[1], coords_dim=ev.coords.shape[1], task="tracking",
        **TINY_MODEL,
    )
    model = HeptTransformer(cfg)
    x, c, v = (jnp.asarray(b[k][0]) for k in ("x", "coords", "valid"))
    pairs, pm = jnp.asarray(b["pairs"][0]), jnp.asarray(b["pair_mask"][0])
    cid, rec, pts = (
        jnp.asarray(b[k][0]) for k in ("cluster_ids", "recons", "pts")
    )
    variables = model.init(jax.random.PRNGKey(0), x, c, v)
    tx = optax.adam(1e-3)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, opt_state):
        def loss_of(p):
            out = model.apply({"params": p, "constants": variables["constants"]}, x, c, v)
            return infonce_loss(out, pairs, pm, cid, rec, pts)

        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params = variables["params"]
    losses = []
    for _ in range(30):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9, losses


def test_tracking_e2e_head_sharded(tmp_path):
    """shard_heads in the config alone trains DP x TP on the virtual 8-device
    mesh (2 data shards x 2 head shards here; VERDICT next #8)."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    ds = make_synthetic_tracking(n_events=8, n_points=128, seed=0)
    cfg = ExperimentConfig(
        task="tracking",
        model_kwargs=TINY_MODEL,
        optimizer_kwargs={"lr": 1e-3},
        num_epochs=1,
        batch_size=2,
        n_devices=4,
        shard_heads=2,
        main_metric="accuracy@0.9",
        mode="max",
        log_dir=str(tmp_path),
        attn_impl="xla",
    )
    res = run_one_seed(cfg, dataset=ds)
    assert np.isfinite(res["loss"])
    assert 0.0 <= res["accuracy@0.9"] <= 1.0


def test_eval_shape_check_fails_on_nan_perturbed_metric(tmp_path, capsys,
                                                        monkeypatch):
    """abs(nan - x) > tol is False — a NaN metric at the perturbed shapes
    must FAIL the cross-check, not print 'ok' (review finding r4)."""
    import hept_tpu.train.trainer as trainer_mod

    ds = make_synthetic_tracking(n_events=8, n_points=128, seed=0)
    real_eval = trainer_mod.evaluate

    def fake_eval(cfg, model_apply, variables, dataset, split, block_size,
                  n_max, e_max, **kw):
        out = real_eval(cfg, model_apply, variables, dataset, split,
                        block_size, n_max, e_max, **kw)
        if kw.get("eval_step") is None and split == "test":
            # the perturbed-shape re-eval is the only test eval issued
            # without the prebuilt eval_step — poison it
            return {k: float("nan") for k in out}
        return out

    monkeypatch.setattr(trainer_mod, "evaluate", fake_eval)
    cfg = ExperimentConfig(
        task="tracking",
        model_kwargs=TINY_MODEL,
        optimizer_kwargs={"lr": 1e-3},
        num_epochs=1,
        batch_size=2,
        main_metric="accuracy@0.9",
        mode="max",
        log_dir=str(tmp_path),
        attn_impl="xla",
        eval_shape_check=True,
    )
    run_one_seed(cfg, dataset=ds)
    out = capsys.readouterr().out
    assert "shape cross-check failed" in out
    assert "shape cross-check ok" not in out
