"""Trainer-level smoke tests across model families (configs load + 1 epoch)."""

import numpy as np
import pytest

from hept_tpu.data.datasets import make_synthetic_tracking
from hept_tpu.train.config import ExperimentConfig
from hept_tpu.train.trainer import run_one_seed


def _cfg(model_name, model_kwargs, tmp_path):
    return ExperimentConfig(
        task="tracking",
        model_name=model_name,
        model_kwargs=model_kwargs,
        optimizer_kwargs={"lr": 1e-3},
        num_epochs=1,
        batch_size=2,
        main_metric="accuracy@0.9",
        mode="max",
        log_dir=str(tmp_path),
        attn_impl="xla",
    )


@pytest.fixture(scope="module")
def ds():
    return make_synthetic_tracking(n_events=6, n_points=96, seed=0)


TRANS_KW = dict(num_heads=2, h_dim=8, n_layers=1, num_w_per_dist=4)


@pytest.mark.parametrize(
    "model_name,extra",
    [
        ("trans_performer", {"nb_features": 16, "pe_type": "learned"}),
        ("trans_smyrf", {"bucket_size": 16, "n_hashes": 2, "pe_type": "learned"}),
        ("trans_pct", {"pe_type": "none", "knn_k": 4}),
        ("gnn_gcn", {"hidden_dim": 16, "out_dim": 8, "num_layers": 1}),
        ("gnn_gravnet", {"hidden_dim": 16, "out_dim": 8, "num_layers": 1, "k": 4, "knn_dim": 3}),
    ],
)
def test_one_epoch(model_name, extra, ds, tmp_path):
    kwargs = dict(extra)
    if model_name.startswith("trans_"):
        kwargs.update(TRANS_KW)
        kwargs.setdefault("block_size", 16)
    cfg = _cfg(model_name, kwargs, tmp_path)
    res = run_one_seed(cfg, dataset=ds)
    assert np.isfinite(res["loss"]), res
    assert 0.0 <= res["accuracy@0.9"] <= 1.0


def test_all_yaml_configs_load():
    from pathlib import Path

    from hept_tpu.train.config import load_config

    cfg_dir = Path(__file__).parent.parent / "hept_tpu" / "configs"
    files = sorted(cfg_dir.rglob("*.yaml"))
    # 24 reference-mirroring configs + 2 TPU fast-stack profiles (hept_fast)
    # + the OR1 speed-max profile (hept_turbo) + the accuracy-first profile
    # (hept_acc: nh2r8bs512cv2r, 0.9513 ± 0.005 @ 102.0 ms) + the
    # accuracy-max profile (hept_max: r12bs512cv2r, 0.9662 @ 147.9 ms —
    # BASELINE.md round 5)
    assert len(files) == 29
    for f in files:
        cfg = load_config(f)
        assert cfg.model_name
        # model config construction must succeed for transformer variants
        if cfg.model_name.startswith("trans_"):
            mc = cfg.model_config(in_dim=15, coords_dim=6)
            assert mc.h_dim > 0
        if f.stem.endswith("_fast"):
            mc = cfg.model_config(in_dim=15, coords_dim=6)
            # fast profiles must encode the validated headline stack
            assert mc.static_keys == "x0" and mc.static_rounds == 8
            assert mc.kernel_bf16 and mc.kernel_center and mc.share_heads
            assert mc.unsort_rows
        if f.stem.endswith("_turbo"):
            mc = cfg.model_config(in_dim=15, coords_dim=6)
            # OR1 speed-max: one round per layer, 4-round union
            assert mc.n_hashes == 1 and mc.static_rounds == 4
            assert mc.static_keys == "x0" and mc.unsort_rows
        if f.stem.endswith("_acc"):
            mc = cfg.model_config(in_dim=15, coords_dim=6)
            # accuracy-first (round 5): nh2 8-round union at 512-pt slab
            # buckets (nh2r8bs512cv2r — BASELINE.md round-5)
            assert mc.n_hashes == 2 and mc.static_rounds == 8
            assert mc.block_size == 512 and cfg.attn_impl == "slab2"
            assert mc.kernel_center and mc.unsort_rows
        if f.stem.endswith("_max"):
            mc = cfg.model_config(in_dim=15, coords_dim=6)
            # accuracy-max (round 5): 12-round union at OR3, bs512
            # (r12bs512cv2r)
            assert mc.n_hashes == 3 and mc.static_rounds == 12
            assert mc.block_size == 512 and cfg.attn_impl == "slab2"
            assert mc.kernel_center and mc.unsort_rows
