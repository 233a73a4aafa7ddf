"""Convergence validation: unsort_pack='fp8' (e4m3 numerator transport in
the OR-accumuland unsort, both directions incl. cotangents) vs bf16,
synthetic tracking on TPU."""
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from hept_tpu.data.datasets import make_synthetic_tracking
from hept_tpu.train.config import ExperimentConfig
from hept_tpu.train.trainer import run_one_seed

ds = make_synthetic_tracking(n_events=12, n_points=6000, seed=0)

for tag, up in (("fp8_unsort", "fp8"), ("bf16_unsort", True)):
    cfg = ExperimentConfig(
        task="tracking",
        model_kwargs=dict(
            block_size=100, n_hashes=3, num_regions=150, num_heads=8,
            h_dim=24, n_layers=4, num_w_per_dist=10, sort_pack=True,
            sort_ops=8, qkv_post_sort=True, scan_layers=True,
            unsort_pack=up, share_heads=True, kernel_bf16=True,
        ),
        optimizer_kwargs={"lr": 1e-3},
        num_epochs=12,
        batch_size=1,
        batch_mode="flat",
        n_devices=1,
        main_metric="accuracy@0.9",
        mode="max",
        log_dir="/tmp/fp8_unsort_val",
        attn_impl="hybrid",
    )
    res = run_one_seed(cfg, dataset=ds)
    print(f"RESULT {tag}: acc@0.9={res['accuracy@0.9']:.4f} "
          f"recall@0.9={res['recall@0.9']:.4f} loss={res['loss']:.4f}",
          flush=True)
