"""Discriminate the r12cv2r seed-0/1 60k collapse (runs/r4): memorization
vs numeric-path divergence vs eval bug.

Loads the collapsed run's best checkpoint (params trained ON TPU with the
hybrid2/rows r12 stack) and CPU-evaluates the SAME eval pipeline on one
TRAIN event and one VALID event:
  train good / valid bad -> true generalization collapse (the model
      memorized the 8 train events; train loss was honest)
  both bad               -> the CPU forward disagrees with the TPU training
      forward for this config (numeric-path divergence)
  both good              -> TPU-side eval bug
Usage: python scripts/diag_r12_collapse.py <run_dir> [variant=r12cv2r]
"""
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache_cpu")

import numpy as np
import orbax.checkpoint as ocp

from train_60k_demo import VARIANTS

from hept_tpu.data.datasets import make_synthetic_tracking, SplitDataset
from hept_tpu.train.config import ExperimentConfig
from hept_tpu.train.trainer import build_model, evaluate, make_model_apply

run_dir = Path(sys.argv[1])
variant = sys.argv[2] if len(sys.argv) > 2 else "r12cv2r"
ckpt_root = next(run_dir.glob("**/ckpt"))
mgr = ocp.CheckpointManager(ckpt_root.absolute())
step = sorted(mgr.all_steps())[-1]
ckptr = ocp.PyTreeCheckpointer()
path = ckpt_root / str(step) / "default"
meta = ckptr.metadata(path).item_metadata
restore_args = jax.tree_util.tree_map(
    lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta
)
restored = ckptr.restore(path, args=ocp.args.PyTreeRestore(restore_args=restore_args))
variables = {"params": restored["params"], "constants": restored["constants"]}
print(f"restored step {step} from {run_dir}", flush=True)

ds = make_synthetic_tracking(n_events=10, n_points=60_000, seed=0,
                             avg_track_size=8, pairs_per_point=16)

vk = dict(VARIANTS[variant])
attn_impl = vk.pop("_attn_impl", "hybrid")
vk.pop("_clip", None)
vk.pop("_lr", None)
cfg = ExperimentConfig(
    task="tracking", seed=0,
    model_kwargs={
        **dict(block_size=100, n_hashes=3, num_regions=150, num_heads=8,
               h_dim=24, n_layers=4, num_w_per_dist=10, sort_pack=True,
               sort_ops=8, qkv_post_sort=True, scan_layers=True,
               unsort_pack=True, shared_sort=True, share_heads=True,
               kernel_bf16=True),
        **vk,
    },
    batch_size=1, batch_mode="flat", main_metric="accuracy@0.9", mode="max",
    log_dir="/tmp/diag_r12", attn_impl="xla",  # CPU forward
)
model, mc = build_model(cfg, ds.in_dim, ds.coords_dim)
model_apply = make_model_apply(model, mc, batch_mode="flat")

def _ceil(n, m):
    return ((n + m - 1) // m) * m


# one-event pseudo-splits (full-split eval at 60k on CPU is too slow);
# e_max sized like the trainer (processed windowed pair lengths)
from hept_tpu.data.batching import processed_pair_len

bs = cfg.model_kwargs["block_size"]
for name, ev in (("train[0]", ds.train[0]), ("valid[0]", ds.valid[0])):
    sub = SplitDataset(train=[ev], valid=[ev], test=[ev],
                       in_dim=ds.in_dim, coords_dim=ds.coords_dim)
    e_max = _ceil(processed_pair_len(ev.pairs, ev.n, 128) + 256, 128)
    r = evaluate(cfg, model_apply, variables, sub, "test", bs,
                 _ceil(ev.n, bs), e_max)
    print(f"{name}: acc@0.9={r['accuracy@0.9']:.4f} loss={r['loss']:.4f}",
          flush=True)
