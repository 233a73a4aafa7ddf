"""Minimal repro for the r12cv2r eval corruption: padding-shape invariance.

The corrupted demos evaluate at 10-event sizing (n_max=58300,
e_max=1356544); diag_tpu_eval at one-event sizing scores the same
checkpoint 0.9453.  Padding is supposed to be inert: the forward output on
VALID points must not depend on n_max/e_max.  This script runs the eval
forward on ONE valid-split event at both sizings with IDENTICAL params and
compares the valid-point embeddings + the retrieval metric.

  - big-vs-small outputs diverge  -> the padding/plan path is shape-buggy
       (bisect with flag overrides below)
  - outputs match everywhere      -> the corruption needs the full split /
       other state; look elsewhere

Params: random init by default (layout bugs show at any params); pass a
run_dir as argv[2] to use the trained checkpoint instead.

Usage:
  [JAX_PLATFORMS=cpu] python scripts/repro_shape_eval.py <variant> [run_dir]
      [flag=value ...]   # overrides merged into model_kwargs
"""
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax
import jax.numpy as jnp
import numpy as np

from train_60k_demo import VARIANTS

from hept_tpu.data.batching import pack_events, processed_pair_len
from hept_tpu.data.datasets import make_synthetic_tracking
from hept_tpu.train.config import ExperimentConfig
from hept_tpu.train.trainer import (
    _ceil,
    build_model,
    evaluate,
    make_model_apply,
)
from hept_tpu.train.metrics import tracking_metrics_batch

variant = sys.argv[1] if len(sys.argv) > 1 else "r12cv2r"
run_dir = None
overrides = {}
for a in sys.argv[2:]:
    if "=" in a:
        k, v = a.split("=", 1)
        try:
            v = int(v)
        except ValueError:
            try:
                v = float(v)
            except ValueError:
                v = {"True": True, "False": False}.get(v, v)
        overrides[k] = v
    else:
        run_dir = Path(a)

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
    **overrides,
}
cfg = ExperimentConfig(
    task="tracking", seed=0, model_kwargs=mk, batch_size=1,
    batch_mode="flat", main_metric="accuracy@0.9", mode="max",
    log_dir="/tmp/repro_shape", attn_impl=attn_impl, eval_chunk=1,
)

ds = make_synthetic_tracking(n_events=10, n_points=60_000, seed=0,
                             avg_track_size=8, pairs_per_point=16)
ev = ds.valid[0]
bs = mk["block_size"]

# sizing A: one-event (diag_tpu_eval-style)
nA = _ceil(ev.n, bs)
eA = _ceil(processed_pair_len(ev.pairs, ev.n, 128) + 256, 128)
# sizing B: the demo's exact 10-event sizing (pair_aug headroom included)
nB = _ceil(max(e.n for s in ("train", "valid", "test")
               for e in getattr(ds, s)), bs)
eB = max(processed_pair_len(e.pairs, e.n, 128)
         for s in ("train", "valid", "test") for e in getattr(ds, s))
eB += 2 * int(eB * cfg.pair_aug_p / 2)
eB = _ceil(eB + max(256, eB // 16), 128)
print(f"event n={ev.n}; A: n_max={nA} e_max={eA}; B: n_max={nB} e_max={eB}",
      flush=True)

model, mc = build_model(cfg, ds.in_dim, ds.coords_dim)
model_apply = make_model_apply(model, mc, batch_mode="flat")

if run_dir is not None:
    import orbax.checkpoint as ocp
    ckpt_root = next(run_dir.glob("**/ckpt"))
    mgr = ocp.CheckpointManager(ckpt_root.absolute())
    step = sorted(mgr.all_steps())[-1]
    ckptr = ocp.PyTreeCheckpointer()
    path = ckpt_root / str(step) / "default"
    meta = ckptr.metadata(path).item_metadata
    restore_args = jax.tree_util.tree_map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta)
    restored = ckptr.restore(
        path, args=ocp.args.PyTreeRestore(restore_args=restore_args))
    variables = {"params": restored["params"],
                 "constants": restored["constants"]}
    print(f"params: checkpoint step {step}", flush=True)
else:
    b0 = pack_events([ev], bs, n_max=nA, e_max=eA, window_pairs=128)
    variables = model.init(jax.random.PRNGKey(0),
                           jax.tree_util.tree_map(jnp.asarray, b0))
    print("params: random init", flush=True)

outs = {}
for tag, (nm, em) in {"A": (nA, eA), "B": (nB, eB)}.items():
    b = pack_events([ev], bs, n_max=nm, e_max=em, window_pairs=128)
    jb = jax.tree_util.tree_map(jnp.asarray, b)
    out = jax.jit(model_apply)(variables, jb)
    tm = tracking_metrics_batch(out, jb["cluster_ids"], jb["recons"],
                                jb["pts"], jb["valid"])
    acc = float(np.asarray(tm)[..., 2, 0].mean())
    o = np.asarray(out)[np.asarray(b["valid"], bool)]
    outs[tag] = o
    print(f"{tag}: out[valid] shape={o.shape} norm={np.linalg.norm(o):.4f} "
          f"acc@0.9={acc:.4f}", flush=True)

a, b_ = outs["A"], outs["B"]
ad = np.abs(a - b_)
rel = ad.max() / (np.abs(a).max() + 1e-12)
print(f"max abs diff={ad.max():.6g} max rel={rel:.6g} "
      f"mean abs={ad.mean():.6g}", flush=True)
print("VERDICT:", "DIVERGES" if rel > 1e-2 else "matches", flush=True)
