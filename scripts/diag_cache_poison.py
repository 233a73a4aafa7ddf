"""Discriminate a POISONED persistent-compile-cache entry as the r12cv2r
corruption mechanism.

Evidence so far: all three r12cv2r seeds (0/1/42) report acc@0.9 ~0.10-0.15
in-loop AND through the end-of-run restored-checkpoint re-eval, while the
SAME checkpoints score 0.94-0.95 on CPU and on TPU in scripts/diag_tpu_eval
(which sizes n_max/e_max from ONE event, i.e. compiles at DIFFERENT static
shapes). The demo processes all share one persistent compile cache
(/root/.cache/jaxcache) and one HLO key (10-event sizing): if that cached
executable is bad, every process reloads the same wrong program — fitting
the healthy-checkpoint / deterministic-garbage / every-seed signature.

This script evaluates the corrupted run's checkpoint at the DEMO's exact
static shapes (n_max/e_max sized over the full 10-event dataset, demo
pair_aug_p headroom included), with the compile cache pointed at argv[3]:
  - pass /root/.cache/jaxcache -> expected ~0.15 if the entry is poisoned
  - pass a FRESH empty dir      -> expected ~0.94 (fresh compile)
Matching expectations prove cache poisoning; both legs agreeing at 0.94
refutes it (and points back at in-process state).

Usage: python scripts/diag_cache_poison.py <run_dir> <variant> <cache_dir>
"""
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import os

import jax

# The axon TPU plugin overrides the JAX_PLATFORMS env var; force the
# backend through jax.config when requested (CPU discriminator leg).
if os.environ.get("HEPT_DIAG_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["HEPT_DIAG_PLATFORM"])
jax.config.update("jax_compilation_cache_dir", sys.argv[3])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import orbax.checkpoint as ocp

from train_60k_demo import VARIANTS

from hept_tpu.data.batching import processed_pair_len
from hept_tpu.data.datasets import make_synthetic_tracking
from hept_tpu.train.config import ExperimentConfig
from hept_tpu.train.trainer import (
    _ceil,
    build_model,
    evaluate,
    make_model_apply,
)

run_dir = Path(sys.argv[1])
variant = sys.argv[2]

ckpt_root = next(run_dir.glob("**/ckpt"))
mgr = ocp.CheckpointManager(ckpt_root.absolute())
step = sorted(mgr.all_steps())[-1]
ckptr = ocp.PyTreeCheckpointer()
path = ckpt_root / str(step) / "default"
meta = ckptr.metadata(path).item_metadata
restore_args = jax.tree_util.tree_map(
    lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta
)
restored = ckptr.restore(
    path, args=ocp.args.PyTreeRestore(restore_args=restore_args)
)
variables = {"params": restored["params"], "constants": restored["constants"]}
print(f"restored step {step}; backend={jax.default_backend()}; "
      f"cache={sys.argv[3]}", flush=True)

ds = make_synthetic_tracking(n_events=10, n_points=60_000, seed=0,
                             avg_track_size=8, pairs_per_point=16)

vk = dict(VARIANTS[variant])
attn_impl = vk.pop("_attn_impl", "hybrid")
vk.pop("_clip", None)
vk.pop("_lr", None)
mk = {
    **dict(block_size=100, n_hashes=3, num_regions=150, num_heads=8,
           h_dim=24, n_layers=4, num_w_per_dist=10, sort_pack=True,
           sort_ops=8, qkv_post_sort=True, scan_layers=True,
           unsort_pack=True, shared_sort=True, share_heads=True,
           kernel_bf16=True),
    **vk,
}
cfg = ExperimentConfig(
    task="tracking", seed=0, model_kwargs=mk, batch_size=1,
    batch_mode="flat", main_metric="accuracy@0.9", mode="max",
    log_dir="/tmp/diag_cache", attn_impl=attn_impl, eval_chunk=1,
)

# EXACT run_one_seed sizing (trainer.py:349-384): 10-event dataset,
# windowed pair headroom with the demo's pair_aug_p.
bs = mk["block_size"]
n_max = _ceil(max(ev.n for s in ("train", "valid", "test")
                  for ev in getattr(ds, s)), bs)
e_max = max(processed_pair_len(ev.pairs, ev.n, 128)
            for s in ("train", "valid", "test") for ev in getattr(ds, s))
e_max += 2 * int(e_max * cfg.pair_aug_p / 2)
e_max = _ceil(e_max + max(256, e_max // 16), 128)
print(f"demo shapes: n_max={n_max} e_max={e_max}", flush=True)

model, mc = build_model(cfg, ds.in_dim, ds.coords_dim)
model_apply = make_model_apply(model, mc, batch_mode="flat")
for split in ("valid", "test"):
    r = evaluate(cfg, model_apply, variables, ds, split, bs, n_max, e_max)
    print(f"TPU {split}: acc@0.9={r['accuracy@0.9']:.4f} "
          f"loss={r['loss']:.4f}", flush=True)
