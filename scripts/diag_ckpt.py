"""Post-hoc mechanism attribution for the 60k divergence: load a demo run's
orbax checkpoints (best + latest) and report the scales that expose the two
suspect mechanisms:
  * kernel_bf16 cancellation: sqrt_w = sqrt(2*sum_k exp(sum_d W)) grows with
    training; RBF logits are computed as q.k - |q|^2/2 - |k|^2/2, a
    difference of terms that scale as (sqrt_w * coord)^2 — bf16's 2^-8
    relative rounding on the operands destroys the small difference once
    sqrt_w is large.
  * generic blowup: per-layer param norms best vs latest.

Usage: python scripts/diag_ckpt.py /tmp/train60k_r2stack
"""
import sys

sys.path.insert(0, "/root/repo")
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")  # env var alone is overridden by
# the sitecustomize axon registration; keep diagnostics off the TPU
import numpy as np

run_dir = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/train60k")
ckpt_root = next(run_dir.glob("**/ckpt"))

import orbax.checkpoint as ocp

mgr = ocp.CheckpointManager(ckpt_root.absolute())
steps = sorted(mgr.all_steps())
print(f"{run_dir}: checkpoint steps {steps}")


def sqrt_w_stats(params, num_w_per_dist=10, coords_dim=6, h=8, d=24):
    w_rpe = np.asarray(params["blocks"]["block"]["w_rpe"])  # (L, h*d, rpe_in)
    L = w_rpe.shape[0]
    out = []
    for l in range(L):
        w = w_rpe[l].reshape(h, d, coords_dim - 1, num_w_per_dist)
        qw = np.exp(np.minimum(w.sum(axis=1), 50.0)).sum(axis=-1)  # (h, r)
        sw = np.sqrt(2.0 * np.concatenate([qw[:, :1], qw], axis=-1))
        out.append((float(sw.min()), float(sw.max())))
    return out


def tree_norms(tree, prefix=""):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    rows = []
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        arr = np.asarray(leaf)
        rows.append((name, float(np.abs(arr).max()), float(np.linalg.norm(arr))))
    return rows


def restore_numpy(step):
    """Restore to host numpy regardless of the save-time device shardings
    (checkpoints were written on the TPU; diagnostics run on CPU)."""
    ckptr = ocp.PyTreeCheckpointer()
    path = ckpt_root / str(step) / "default"
    meta = ckptr.metadata(path)
    tree = meta.item_metadata  # ArrayMetadata leaves, full tree structure
    restore_args = jax.tree_util.tree_map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree
    )
    return ckptr.restore(path, args=ocp.args.PyTreeRestore(restore_args=restore_args))


for step in steps:
    restored = restore_numpy(step)
    params = restored["params"] if "params" in restored else restored.params
    print(f"\n== step {step} ==")
    try:
        for l, (lo, hi) in enumerate(sqrt_w_stats(params)):
            print(f"  layer {l}: sqrt_w in [{lo:.3g}, {hi:.3g}]")
    except Exception as e:
        print(f"  sqrt_w stats failed: {e}")
    rows = tree_norms(params)
    rows.sort(key=lambda r: -r[1])
    print("  largest |param|max:")
    for name, mx, nrm in rows[:8]:
        print(f"    {name:<60s} max={mx:10.4g} l2={nrm:10.4g}")
