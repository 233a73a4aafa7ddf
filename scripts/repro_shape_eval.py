"""Minimal repro + isolation for the r12cv2r eval corruption.

Established so far (runs/r4): the r12cv2r demos' in-loop eval reports
acc@0.9 ~0.15 at the 10-event demo sizing (n_max=58300, e_max=1356544) on
TPU, deterministically (fresh compile cache reproduces, diag_cache_*), while
the SAME checkpoint + config + shapes on CPU scores 0.89
(diag_cpu_demoshapes.log) and one-event sizing on TPU scores 0.9453
(diag_tpu_eval.log). So the TPU-compiled program is wrong at those exact
static shapes for this config.

The eval jit fuses forward + loss + retrieval metric into ONE program, but
the forward never consumes e_max (pairs only feed the loss). This script
isolates where the corruption lives by running, at each sizing:

  leg "evalstep":  the production fused eval body (make_eval_step) ->
                   loss + acc — reproduces the corruption if present;
  leg "fwd":       jit(model_apply) alone -> valid-point embeddings,
                   compared across sizings (padding must be inert);

over sizings A=(nA,eA) one-event, B=(nB,eB) demo, AB=(nA,eB), BA=(nB,eA) —
the mixed sizings attribute the trigger to n_max vs e_max.

Params: random init by default; pass a run_dir to use a trained checkpoint
(the corruption may need trained weight magnitudes).

Usage:
  [HEPT_DIAG_PLATFORM=cpu] python scripts/repro_shape_eval.py <variant>
      [run_dir] [flag=value ...]    # overrides merged into model_kwargs
"""
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import dataclasses
import os

import jax

# The axon TPU plugin overrides the JAX_PLATFORMS env var; force the
# backend through jax.config when requested.
if os.environ.get("HEPT_DIAG_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["HEPT_DIAG_PLATFORM"])
if os.environ.get("HEPT_REPRO_CACHE", "1") != "0":
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from train_60k_demo import VARIANTS

from hept_tpu.data.batching import pack_events, processed_pair_len
from hept_tpu.data.datasets import make_synthetic_tracking
from hept_tpu.train.config import ExperimentConfig
from hept_tpu.train.trainer import (
    _ceil,
    _init_model,
    build_model,
    make_eval_step,
    make_model_apply,
)

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

ds = make_synthetic_tracking(
    n_events=10, n_points=int(os.environ.get("HEPT_REPRO_N", 60_000)),
    seed=0, avg_track_size=8, pairs_per_point=16)
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
print(f"backend={jax.default_backend()} variant={variant} "
      f"overrides={overrides}", flush=True)
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
    variables = _init_model(
        model, mc, jax.random.PRNGKey(0),
        jax.tree_util.tree_map(jnp.asarray, b0))
    print("params: random init", flush=True)

sizings = {"A": (nA, eA), "B": (nB, eB), "AB": (nA, eB), "BA": (nB, eA)}
batches = {}
for tag, (nm, em) in sizings.items():
    b = pack_events([ev], bs, n_max=nm, e_max=em, window_pairs=128)
    batches[tag] = jax.tree_util.tree_map(jnp.asarray, b)

# leg 1: the production fused eval step (forward + loss + metric, one jit)
eval_step = make_eval_step(cfg, model_apply, chunk=1)
for tag, jb in batches.items():
    loss, tm = eval_step(1)(variables, jb)
    tm = np.asarray(tm)
    print(f"evalstep {tag} (n={sizings[tag][0]} e={sizings[tag][1]}): "
          f"loss={float(loss):.4f} acc@0.9={tm[..., 2, 0].mean():.4f} "
          f"recall@0.9={tm[..., 2, 2].mean():.4f}", flush=True)

# leg 2: forward only, padding invariance of valid-point embeddings
outs = {}
fwd = jax.jit(lambda v, jb: model_apply(v, jb))
for tag in ("A", "B"):
    jb = batches[tag]
    out = fwd(variables, jb)
    o = np.asarray(out)
    vmask = np.asarray(jb["valid"], bool)
    outs[tag] = o[vmask] if o.shape[:vmask.ndim] == vmask.shape else o[0][vmask[0]]
    print(f"fwd {tag}: out[valid] shape={outs[tag].shape} "
          f"norm={np.linalg.norm(outs[tag]):.4f}", flush=True)

a, b_ = outs["A"], outs["B"]
ad = np.abs(a - b_)
rel = float(ad.max() / (np.abs(a).max() + 1e-12))
print(f"fwd A-vs-B: max abs diff={ad.max():.6g} max rel={rel:.6g} "
      f"frac rows >1e-2={np.mean((ad.max(axis=-1) > 1e-2)):.4f}", flush=True)
print("FWD VERDICT:", "DIVERGES" if rel > 1e-2 else "matches", flush=True)

# leg 3 (opt-in sweep): HEPT_REPRO_NMAXES="58300,58400,..." — for each
# n_max (e_max fixed at eA) run (a) the fused evalstep, (b) a fused
# forward+loss WITHOUT the metric, (c) the split-programs evalstep, and
# (d) fused-vs-alone forward embedding diff. Attribution axes: which
# n_max values trigger (58300 = 583 buckets, ODD, vs 50200 = 502 EVEN),
# and whether the metric subgraph must be in the program to trigger.
sweep = os.environ.get("HEPT_REPRO_NMAXES", "")
if sweep:
    loss_fn = __import__("hept_tpu.train.trainer", fromlist=["make_loss_fn"]
                         ).make_loss_fn(cfg)
    cfg_split = dataclasses.replace(cfg, eval_split_programs=True) \
        if hasattr(cfg, "eval_split_programs") else cfg
    eval_step_split = make_eval_step(cfg_split, model_apply, chunk=1)
    fused_lossonly = jax.jit(
        lambda v, jb: loss_fn(model_apply(v, jb), jb))
    # trivial-consumer fusion: if even fwd+sum flips the forward's value
    # at the bad n_max, the minimal XLA repro needs no loss/metric at all
    fused_fwdsum = jax.jit(
        lambda v, jb: (model_apply(v, jb)
                       * jnp.where(jb["valid"][..., None], 1.0, 0.0)).sum())
    fwd_alone = jax.jit(lambda v, jb: model_apply(v, jb))
    for nm_s in sweep.split(","):
        nm = int(nm_s)
        b = pack_events([ev], bs, n_max=nm, e_max=eA, window_pairs=128)
        jb = jax.tree_util.tree_map(jnp.asarray, b)
        loss, tm = eval_step(1)(variables, jb)
        tm = np.asarray(tm)
        l2 = float(fused_lossonly(variables, jb))
        fs = float(fused_fwdsum(variables, jb))
        loss_s, tm_s = eval_step_split(1)(variables, jb)
        tm_s = np.asarray(tm_s)
        print(
            f"sweep n_max={nm} (nb={nm // bs}{'odd' if (nm // bs) % 2 else 'even'}): "
            f"fused loss={float(loss):.4f} acc={tm[..., 2, 0].mean():.4f} | "
            f"lossonly={l2:.4f} | fwdsum={fs:.4f} | "
            f"split loss={float(loss_s):.4f} acc={tm_s[..., 2, 0].mean():.4f}",
            flush=True,
        )
