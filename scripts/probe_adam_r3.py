"""Why does the adam update cost 11 ms (profile_step_r3)? The model has only
~0.5M params. Suspects: per-leaf op dispatch (many small fused kernels) vs
one fused update over a flattened vector."""
import sys

sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from hept_tpu.train.optim import make_optimizer


def fence(v):
    return float(jnp.asarray(v, jnp.float32).ravel()[0])


def timeit(tag, f, *args, iters=30):
    out = f(*args)
    fence(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    fence(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{tag:<56s} {dt:8.2f} ms", flush=True)
    return dt


# build the real param tree from the bench model
from hept_tpu.data.synthetic import synthetic_tracking_event
from hept_tpu.models import HeptTransformer, TransformerConfig

rng = np.random.default_rng(0)
ev = synthetic_tracking_event(rng, n_points=60_000, avg_track_size=8,
                              pairs_per_point=16)
cfg = TransformerConfig(
    in_dim=ev.x.shape[1], coords_dim=ev.coords.shape[1], task="tracking",
    h_dim=24, num_heads=8, n_layers=4, block_size=100, n_hashes=3,
    num_regions=150, num_w_per_dist=10, padding_mode="replicate",
    scan_layers=True,
)
model = HeptTransformer(cfg)
variables = jax.jit(model.init)(
    jax.random.PRNGKey(0), jnp.asarray(ev.x), jnp.asarray(ev.coords),
    jnp.asarray(ev.valid)
)
params = variables["params"]
leaves = jax.tree_util.tree_leaves(params)
n_leaves = len(leaves)
n_params = sum(l.size for l in leaves)
print(f"{n_leaves} leaves, {n_params:,} params")

grads = jax.tree_util.tree_map(lambda p: p * 1e-3, params)

tx = make_optimizer("adam", lr=1e-2)
opt_state = jax.jit(tx.init)(params)


@jax.jit
def upd(params, grads, opt_state):
    updates, new_state = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), new_state


timeit("current adam (inject_hyperparams chain)", upd, params, grads, opt_state)

tx2 = optax.adam(1e-2)
opt2 = jax.jit(tx2.init)(params)


@jax.jit
def upd2(params, grads, opt_state):
    updates, new_state = tx2.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), new_state


timeit("plain optax.adam on tree", upd2, params, grads, opt2)

# fused: one flat vector
flat, unravel = jax.flatten_util.ravel_pytree(params)
gflat, _ = jax.flatten_util.ravel_pytree(grads)
opt3 = jax.jit(tx2.init)(flat)


@jax.jit
def upd3(flat, gflat, opt_state):
    updates, new_state = tx2.update(gflat, opt_state, flat)
    return optax.apply_updates(flat, updates), new_state


timeit("optax.adam on one flat vector", upd3, flat, gflat, opt3)


@jax.jit
def upd4(params, grads, opt_state):
    gflat, _ = jax.flatten_util.ravel_pytree(grads)
    updates, new_state = tx2.update(gflat, opt_state, gflat)
    # unravel back to tree and apply
    return optax.apply_updates(params, unravel(updates)), new_state


timeit("flatten-in-jit + adam + unravel", upd4, params, grads, opt3)
