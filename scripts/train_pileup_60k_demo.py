"""Train the pileup fast config on synthetic 60k-point events to a real AP
curve on TPU — the pileup co-workload's end-to-end evidence run (reference
src/pileup_trainer.py:90-169: focal loss, plateau scheduler, per-batch
AP/ROC/F1 on neutral points), mirroring scripts/train_60k_demo.py."""
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from hept_tpu.data.datasets import make_synthetic_pileup
from hept_tpu.train.config import ExperimentConfig
from hept_tpu.train.trainer import run_one_seed

ds = make_synthetic_pileup(n_events=10, n_points=60_000, seed=0)

variant = sys.argv[1] if len(sys.argv) > 1 else "r2"
seed = int(sys.argv[2]) if len(sys.argv) > 2 else 42
model_kwargs = dict(
    block_size=100, n_hashes=3, num_regions=140, num_heads=8,
    h_dim=24, n_layers=4, num_w_per_dist=10, sort_pack=True,
    sort_ops=8, qkv_post_sort=True, scan_layers=True,
    unsort_pack=True, shared_sort=True, share_heads=True,
    kernel_bf16=True, static_keys="x0", canon_residual=True,
)
attn_impl = "hybrid"
if variant == "headline":
    # the round-3 tracking speed stack (nh2r8cv2): OR width 2, 8-round
    # static union, per-bucket RPE centering, v2 bf16 backward
    model_kwargs.update(n_hashes=2, static_rounds=8, kernel_center=True,
                        canon_residual=False)
    attn_impl = "hybrid2"
elif variant == "acc":
    # the round-4 hept_acc composition (r12bs128cv2r) on pileup: 12-round
    # union x OR3, bs128 slab2 kernels, center, row unsort
    model_kwargs.update(block_size=128, static_rounds=12, kernel_center=True,
                        unsort_rows=True, canon_residual=False)
    attn_impl = "slab2"
elif variant == "bs512":
    # round-5 big-bucket arm (nh2r8bs512cv2r) on pileup: nh2-level
    # transport at better-than-acc-arm union recall (runs/r5/probe_bs.log)
    model_kwargs.update(n_hashes=2, static_rounds=8, block_size=512,
                        kernel_center=True, unsort_rows=True,
                        canon_residual=False)
    attn_impl = "slab2"

cfg = ExperimentConfig(
    task="pileup",
    seed=seed,
    model_kwargs=model_kwargs,
    loss_name="focal",
    optimizer_kwargs={"lr": 1e-3},
    lr_scheduler_name="impatient",  # ReduceLROnPlateau (factor .5, patience 20)
    lr_scheduler_kwargs={"factor": 0.5, "patience": 20},
    num_epochs=25,
    batch_size=1,
    batch_mode="flat",
    n_devices=1,
    main_metric="auc",
    mode="max",
    log_dir="/tmp/train_pileup60k",
    attn_impl=attn_impl,
    eval_shape_check=True,
)
res = run_one_seed(cfg, dataset=ds)
print(f"RESULT pileup-60k [{variant} seed={seed}]: " + " ".join(
    f"{k}={v:.4f}" for k, v in sorted(res.items())
), flush=True)
