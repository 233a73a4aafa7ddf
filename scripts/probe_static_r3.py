"""Measure the static_keys train step at tracking-60k vs the round-3
baseline (share_heads + kernel_bf16, 200 ms)."""
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


def fence(x):
    return float(jnp.asarray(x, jnp.float32).ravel()[0])


def timeit(tag, f, *args, iters=15):
    t0 = time.perf_counter()
    out = f(*args)
    fence(jax.tree_util.tree_leaves(out)[0])
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    fence(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{tag:<56s} {dt:8.2f} ms (compile {tc:.0f}s)", flush=True)
    return dt


def run(tag, static_keys):
    cfg = TransformerConfig(
        in_dim=ev.x.shape[1], coords_dim=ev.coords.shape[1], task="tracking",
        h_dim=24, num_heads=8, n_layers=4, block_size=100, n_hashes=3,
        num_regions=150, num_w_per_dist=10, padding_mode="replicate",
        attn_impl="hybrid", scan_layers=True, sort_pack=True, sort_ops=8,
        qkv_post_sort=True, unsort_pack=True, shared_sort=True,
        share_heads=True, kernel_bf16=True, static_keys=static_keys,
    )
    model = HeptTransformer(cfg)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), bt["x"], bt["coords"], bt["valid"]
    )
    jax.block_until_ready(variables)
    tx = make_optimizer("adam", lr=1e-2)
    state = TrainState.create(variables, tx, jax.random.PRNGKey(1))

    @jax.jit
    def fwd(p, c, bt):
        return model.apply(
            {"params": p, "constants": c}, bt["x"], bt["coords"], bt["valid"]
        )

    timeit(f"{tag} fwd", fwd, state.params, state.constants, bt)

    @jax.jit
    def train_step(state, bt):
        def loss_of(p):
            out = model.apply(
                {"params": p, "constants": state.constants},
                bt["x"], bt["coords"], bt["valid"],
            )
            return infonce_loss(
                out, bt["pairs"], bt["pair_mask"], bt["cluster_ids"],
                bt["recons"], bt["pts"], windowed_pairs=True,
                pair_rev=bt["pair_rev"], pair_weight=bt["pair_weight"],
                pair_neg=bt["pair_neg"],
            )

        loss, grads = jax.value_and_grad(loss_of)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        p = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=p,
                             opt_state=opt_state), loss

    timeit(f"{tag} train step", train_step, state, bt)


which = sys.argv[1:] or ["x0", "coords", "base"]
for tag in which:
    run(tag, False if tag == "base" else tag)
