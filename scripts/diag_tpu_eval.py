"""TPU A/B for the r12cv2r eval corruption (runs/r4 collapse finding).

The collapsed r12cv2r seed-0 demo reported valid/test acc@0.9 ~0.1 on TPU,
but CPU re-evaluation of its best checkpoint scores 0.941/0.945
(scripts/diag_r12_collapse.py) — the TPU-side eval, not the model, is
broken for this config. This probe loads the same checkpoint ON THE TPU
and evaluates valid[0] three ways:
  chunk=1   plain per-batch jit eval (the round-3-equivalent path)
  chunk=8   the new lax.map'ed eval (a size-1 group -> lax.map over 1)
  fwd-only  the raw forward + metric OUTSIDE evaluate(), minimal pipeline
Expected: whichever leg reproduces ~0.1 is the broken path; CPU reference
is 0.9454 / loss 0.0107.

Usage: python scripts/diag_tpu_eval.py <run_dir> [variant=r12cv2r]
"""
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from train_60k_demo import VARIANTS

from hept_tpu.data.batching import pack_events, processed_pair_len
from hept_tpu.data.datasets import SplitDataset, make_synthetic_tracking
from hept_tpu.train.config import ExperimentConfig
from hept_tpu.train.metrics import tracking_metrics_batch
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
print(f"restored step {step}; backend={jax.default_backend()}", flush=True)

ds = make_synthetic_tracking(n_events=10, n_points=60_000, seed=0,
                             avg_track_size=8, pairs_per_point=16)
ev = ds.valid[0]

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


def _ceil(n, m):
    return ((n + m - 1) // m) * m


bs = mk["block_size"]
n_max = _ceil(ev.n, bs)
e_max = _ceil(processed_pair_len(ev.pairs, ev.n, 128) + 256, 128)
sub = SplitDataset(train=[ev], valid=[ev], test=[ev],
                   in_dim=ds.in_dim, coords_dim=ds.coords_dim)

for chunk in (1, 8):
    cfg = ExperimentConfig(
        task="tracking", seed=0, model_kwargs=mk, batch_size=1,
        batch_mode="flat", main_metric="accuracy@0.9", mode="max",
        log_dir="/tmp/diag_tpu_eval", attn_impl=attn_impl, eval_chunk=chunk,
    )
    model, mc = build_model(cfg, ds.in_dim, ds.coords_dim)
    model_apply = make_model_apply(model, mc, batch_mode="flat")
    sub._eval_batch_cache = {}
    r = evaluate(cfg, model_apply, variables, sub, "test", bs, n_max, e_max)
    print(f"TPU chunk={chunk}: acc@0.9={r['accuracy@0.9']:.4f} "
          f"loss={r['loss']:.4f}", flush=True)

# minimal pipeline: raw forward + metric, no evaluate() machinery
cfg = ExperimentConfig(
    task="tracking", seed=0, model_kwargs=mk, batch_size=1,
    batch_mode="flat", main_metric="accuracy@0.9", mode="max",
    log_dir="/tmp/diag_tpu_eval", attn_impl=attn_impl,
)
model, mc = build_model(cfg, ds.in_dim, ds.coords_dim)
b = pack_events([ev], bs, n_max=n_max, e_max=e_max, window_pairs=128)
x, c, v = (jnp.asarray(b[k][0]) for k in ("x", "coords", "valid"))


@jax.jit
def fwd_metric(variables, x, c, v, cid, rec, pts, val):
    out = model.apply(variables, x, c, v)
    return tracking_metrics_batch(out[None], cid, rec, pts, val)


tm = fwd_metric(
    variables, x, c, v, jnp.asarray(b["cluster_ids"]),
    jnp.asarray(b["recons"]), jnp.asarray(b["pts"]), jnp.asarray(b["valid"]),
)
tm = np.asarray(tm)
print(f"TPU fwd-only: acc@0.9={tm[0, 2, 0]:.4f}", flush=True)
