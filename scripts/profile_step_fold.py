"""Step-time measurement: fold_unsort on the static_keys stack.

With static_keys landed the od unsort is the step's wall (~10.4 ms x 8
fwd+bwd applications = ~80 ms of the 187 ms step). fold_unsort folds all
heads' [num|denom] columns into ONE c-row unsort call (3 comparator rows,
~100 packed operands) instead of broadcasting the shared permutation to
c*h rows. Numerically identical (same permutation application, same bf16
pack); the only cost is a one-time XLA sort compile that scales ~linearly
in operand count (cached persistently).

Run: python scripts/profile_step_fold.py [base fold]
"""
import sys

sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from hept_tpu.data.batching import pack_events
from hept_tpu.data.synthetic import synthetic_tracking_event
from hept_tpu.models import HeptTransformer, TransformerConfig
from hept_tpu.train.losses import infonce_loss
from hept_tpu.train.optim import make_optimizer
from hept_tpu.train.state import TrainState

N = 60_000
rng = np.random.default_rng(0)
ev = synthetic_tracking_event(rng, n_points=N, avg_track_size=8, pairs_per_point=16)
batch = pack_events([ev], block_size=100, window_pairs=128)
keys = ("x", "coords", "valid", "pairs", "pair_mask", "cluster_ids", "recons",
        "pts", "pair_rev", "pair_weight", "pair_neg")
bt = {k: jnp.asarray(batch[k][0]) for k in keys}

BASE = dict(
    in_dim=ev.x.shape[1], coords_dim=ev.coords.shape[1], task="tracking",
    h_dim=24, num_heads=8, n_layers=4, block_size=100, n_hashes=3,
    num_regions=150, num_w_per_dist=10, padding_mode="replicate",
    attn_impl="hybrid", scan_layers=True, sort_pack=True, sort_ops=8,
    qkv_post_sort=True, unsort_pack=True, shared_sort=True, share_heads=True,
    kernel_bf16=True, static_keys="x0",
)

tx = make_optimizer("adam", lr=1e-2)


def run(tag, **extra):
    cfg = TransformerConfig(**{**BASE, **extra})
    model = HeptTransformer(cfg)
    t0 = time.perf_counter()
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), bt["x"], bt["coords"], bt["valid"])
    jax.block_until_ready(variables)
    print(f"{tag}: init compile {time.perf_counter() - t0:.0f}s", flush=True)
    state = TrainState.create(variables, tx, jax.random.PRNGKey(1))

    @jax.jit
    def train_step(state, bt):
        def loss_of(p):
            out = model.apply({"params": p, "constants": state.constants},
                              bt["x"], bt["coords"], bt["valid"])
            return infonce_loss(out, bt["pairs"], bt["pair_mask"],
                                bt["cluster_ids"], bt["recons"], bt["pts"],
                                windowed_pairs=True, pair_rev=bt["pair_rev"],
                                pair_weight=bt["pair_weight"],
                                pair_neg=bt["pair_neg"])
        loss, grads = jax.value_and_grad(loss_of)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        p = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=p,
                             opt_state=opt_state), loss

    t0 = time.perf_counter()
    state, loss = train_step(state, bt)
    l0 = float(loss)
    tc = time.perf_counter() - t0
    for _ in range(2):
        state, loss = train_step(state, bt)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(15):
        state, loss = train_step(state, bt)
    lN = float(loss)
    dt = (time.perf_counter() - t0) / 15 * 1e3
    print(f"{tag:<10s} step {dt:7.1f} ms  loss0 {l0:.4f} lossN {lN:.4f}  "
          f"(step compile {tc:.0f}s)", flush=True)


for tag in (sys.argv[1:] or ["fold"]):
    extra = {"fold_unsort": True} if tag == "fold" else {}
    run(tag, **extra)
