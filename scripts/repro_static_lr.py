"""CPU reproduction of the static_keys 60k/lr=1e-2 divergence at small scale.

The 60k demo diverges with static_keys (x0 collapses, coords NaNs) at
lr=1e-2 while the 6k validation at lr=1e-3 passed. This sweeps
(variant, lr, n_points) on CPU to find the smallest reproduction and test
the mechanism hypotheses cheaply.

Run: python scripts/repro_static_lr.py [variant:lr:n ...]
  e.g. python scripts/repro_static_lr.py base:1e-2:6000 x0:1e-2:6000
"""
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

from hept_tpu.data.datasets import make_synthetic_tracking
from hept_tpu.train.config import ExperimentConfig
from hept_tpu.train.trainer import run_one_seed

specs = sys.argv[1:] or ["base:1e-2:6000", "x0:1e-2:6000"]

_ds_cache = {}

for spec in specs:
    tag, lr_s, n_s = spec.split(":")
    lr, n = float(lr_s), int(n_s)
    if n not in _ds_cache:
        _ds_cache[n] = make_synthetic_tracking(
            n_events=8, n_points=n, seed=0, avg_track_size=8,
            pairs_per_point=16,
        )
    # tag grammar: base | <variant>[hK][rN][bM][+canon],
    # e.g. x0, x0b8, x0r6, x0r6b4, x0h2r8, coordsb4+canon
    extra = {}
    t = tag
    if t.endswith("+canon"):
        extra["canon_residual"] = True
        t = t[: -len("+canon")]
    if t != "base":
        if "b" in t and t.rsplit("b", 1)[1].isdigit():
            t, bins = t.rsplit("b", 1)
            extra["static_and_bins"] = int(bins)
        if "r" in t and t.rsplit("r", 1)[1].isdigit():
            t, rounds = t.rsplit("r", 1)
            extra["static_rounds"] = int(rounds)
        if "h" in t and t.rsplit("h", 1)[1].isdigit():
            t, nh = t.rsplit("h", 1)
            extra["n_hashes"] = int(nh)
        extra["static_keys"] = t
    cfg = ExperimentConfig(
        task="tracking",
        model_kwargs={
            **dict(
                block_size=100, n_hashes=3, num_regions=150, num_heads=8,
                h_dim=24, n_layers=4, num_w_per_dist=10, sort_pack=True,
                sort_ops=8, qkv_post_sort=True, scan_layers=True,
                unsort_pack=True, shared_sort=True, share_heads=True,
                kernel_bf16=True,
            ),
            **extra,  # may override base keys (e.g. n_hashes via hK)
        },
        optimizer_kwargs={"lr": lr},
        num_epochs=10,
        batch_size=1,
        batch_mode="flat",
        n_devices=1,
        main_metric="accuracy@0.9",
        mode="max",
        log_dir=f"/tmp/repro_{tag}_{lr_s}_{n}",
        attn_impl="xla",
    )
    res = run_one_seed(cfg, dataset=_ds_cache[n])
    print(f"RESULT {spec}: acc@0.9={res['accuracy@0.9']:.4f} "
          f"loss={res['loss']:.4f}", flush=True)
