"""Measured accuracy delta for the knn_k divergence (PARITY.md).

Reference GNN/pct datasets precompute knn_graph(k=60)
(/root/reference/src/datasets/tracking.py transform); our in-jit build
defaults to knn_k=16. This A/B trains the GCN baseline on synthetic
tracking at k=16 vs k=60 (same seed/data/epochs) and reports acc@0.9, so
PARITY.md can state the delta instead of just flagging it.

Run (CPU): python scripts/validate_knn_k.py
"""
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

from hept_tpu.data.datasets import make_synthetic_tracking
from hept_tpu.train.config import ExperimentConfig
from hept_tpu.train.trainer import run_one_seed

ds = make_synthetic_tracking(n_events=24, n_points=1000, seed=0)

# graph_k is the GNN factory's key for the in-jit kNN degree
# (train/trainer.py build_model); hidden_dim=16 / 4 epochs keep the synthetic
# task un-saturated so a graph-degree effect is visible.
for k in (16, 60):
    cfg = ExperimentConfig(
        task="tracking",
        model_name="gnn_gcn",
        model_kwargs=dict(hidden_dim=16, num_layers=4, graph_k=k),
        optimizer_kwargs={"lr": 1e-3},
        num_epochs=4,
        batch_size=1,
        main_metric="accuracy@0.9",
        mode="max",
        log_dir=f"/tmp/knnk_{k}",
        attn_impl="xla",
        seed=0,
    )
    res = run_one_seed(cfg, dataset=ds)
    print(f"graph_k={k}: acc@0.9={res['accuracy@0.9']:.4f} "
          f"loss={res['loss']:.4f}", flush=True)
