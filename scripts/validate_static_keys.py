"""Convergence validation: static_keys (layer-invariant bucket hashes,
permutation-gather reorders) vs the kernel_bf16 round-3 baseline, synthetic
tracking on TPU.

Gate for enabling static_keys in bench/entry: final accuracy@0.9 within
noise (~0.002) of the kernel_bf16 stack (acc@0.9 0.9424,
validate_kernel_bf16.py). Both the "x0" (encoder-output hash) and "coords"
(pure geometric hash) variants run; whichever passes closest wins.
"""
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from hept_tpu.data.datasets import make_synthetic_tracking
from hept_tpu.train.config import ExperimentConfig
from hept_tpu.train.trainer import run_one_seed

ds = make_synthetic_tracking(n_events=12, n_points=6000, seed=0)

variants = sys.argv[1:] or ["x0", "coords", "base"]

for tag in variants:
    extra = {} if tag == "base" else {"static_keys": tag}
    cfg = ExperimentConfig(
        task="tracking",
        model_kwargs=dict(
            block_size=100, n_hashes=3, num_regions=150, num_heads=8,
            h_dim=24, n_layers=4, num_w_per_dist=10, sort_pack=True,
            sort_ops=8, qkv_post_sort=True, scan_layers=True,
            unsort_pack=True, shared_sort=True, share_heads=True,
            kernel_bf16=True, **extra,
        ),
        optimizer_kwargs={"lr": 1e-3},
        num_epochs=12,
        batch_size=1,
        batch_mode="flat",
        n_devices=1,
        main_metric="accuracy@0.9",
        mode="max",
        log_dir="/tmp/static_keys_val",
        attn_impl="pallas",
    )
    res = run_one_seed(cfg, dataset=ds)
    print(f"RESULT {tag}: acc@0.9={res['accuracy@0.9']:.4f} "
          f"recall@0.9={res['recall@0.9']:.4f} loss={res['loss']:.4f}",
          flush=True)
