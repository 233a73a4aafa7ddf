"""Full train-step timing after the round-2 kernel + post-sort changes."""
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
batch = pack_events([ev], block_size=100)
keys = ("x", "coords", "valid", "pairs", "pair_mask", "cluster_ids", "recons", "pts")
bt = {k: jnp.asarray(batch[k][0]) for k in keys}


def fence(x):
    return float(jnp.asarray(x, jnp.float32).ravel()[0])


def run(tag, **kw):
    cfg = TransformerConfig(
        in_dim=ev.x.shape[1], coords_dim=ev.coords.shape[1], task="tracking",
        h_dim=24, num_heads=8, n_layers=4, block_size=100, n_hashes=3,
        num_regions=150, num_w_per_dist=10, padding_mode="replicate",
        attn_impl="pallas", scan_layers=True, sort_pack=True, sort_ops=8, **kw,
    )
    model = HeptTransformer(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), bt["x"], bt["coords"], bt["valid"])
    jax.block_until_ready(variables)
    tx = make_optimizer("adam", lr=1e-2)
    state = TrainState.create(variables, tx, jax.random.PRNGKey(1))

    @jax.jit
    def train_step(state, bt):
        def loss_of(p):
            out = model.apply({"params": p, "constants": state.constants},
                              bt["x"], bt["coords"], bt["valid"])
            return infonce_loss(out, bt["pairs"], bt["pair_mask"],
                                bt["cluster_ids"], bt["recons"], bt["pts"])
        loss, grads = jax.value_and_grad(loss_of)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        p = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=p, opt_state=opt_state), loss

    t0 = time.perf_counter()
    state, loss = train_step(state, bt)
    fence(loss)
    t_compile = time.perf_counter() - t0
    for _ in range(2):
        state, loss = train_step(state, bt)
    fence(loss)
    t0 = time.perf_counter()
    for _ in range(15):
        state, loss = train_step(state, bt)
    final = fence(loss)
    dt = (time.perf_counter() - t0) / 15 * 1e3

    @jax.jit
    def fwd(p, c, bt):
        return model.apply({"params": p, "constants": c}, bt["x"], bt["coords"], bt["valid"])
    out = fwd(state.params, state.constants, bt)
    fence(out.sum())
    t0 = time.perf_counter()
    for _ in range(15):
        out = fwd(state.params, state.constants, bt)
    fence(out.sum())
    fwd_ms = (time.perf_counter() - t0) / 15 * 1e3
    print(f"{tag:<30s} step {dt:7.1f} ms  fwd {fwd_ms:7.1f} ms  loss {final:.4f} "
          f"(compile {t_compile:.0f}s)", flush=True)


run("new kernels, pre-sort qkv")
run("new kernels + post-sort qkv", qkv_post_sort=True)
print("done", flush=True)
