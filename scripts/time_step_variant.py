"""Time the full tracking-60k train step for one demo variant.

Usage: python scripts/time_step_variant.py [variant] [iters]
  variant: a key of train_60k_demo.VARIANTS (full, r2stack, r6, nh2r8, ...)
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
import optax

from train_60k_demo import VARIANTS  # single source of truth for the arms

from hept_tpu.data.batching import pack_events
from hept_tpu.data.synthetic import synthetic_tracking_event
from hept_tpu.models import HeptTransformer, TransformerConfig
from hept_tpu.train.losses import infonce_loss
from hept_tpu.train.optim import make_optimizer
from hept_tpu.train.state import TrainState

variant = sys.argv[1] if len(sys.argv) > 1 else "full"
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 20
N = 60_000

rng = np.random.default_rng(0)
ev = synthetic_tracking_event(rng, n_points=N, avg_track_size=8,
                              pairs_per_point=16)
_bs = VARIANTS.get(sys.argv[1] if len(sys.argv) > 1 else "full",
                   {}).get("block_size", 100)
from hept_tpu.data.batching import slab_friendly_n

batch = pack_events([ev], block_size=_bs, n_max=slab_friendly_n(N, _bs),
                    window_pairs=128)
keys = ("x", "coords", "valid", "pairs", "pair_mask", "cluster_ids", "recons",
        "pts", "pair_rev", "pair_weight", "pair_neg")
bt = {k: jnp.asarray(batch[k][0]) for k in keys}

vk = dict(VARIANTS[variant])
attn_impl = vk.pop("_attn_impl", "hybrid")
vk.pop("_clip", None)  # optimizer-level keys: irrelevant for step timing
vk.pop("_lr", None)
cfg = TransformerConfig(
    in_dim=ev.x.shape[1], coords_dim=ev.coords.shape[1], task="tracking",
    **{
        **dict(
            block_size=100, n_hashes=3, num_regions=150, num_heads=8,
            h_dim=24, n_layers=4, num_w_per_dist=10, sort_pack=True,
            sort_ops=8, qkv_post_sort=True, scan_layers=True,
            unsort_pack=True, shared_sort=True, share_heads=True,
            kernel_bf16=True, padding_mode="replicate", attn_impl=attn_impl,
        ),
        **vk,
    },
)
model = HeptTransformer(cfg)
tx = make_optimizer("adam", lr=1e-2)
variables = jax.jit(model.init)(
    jax.random.PRNGKey(0), bt["x"], bt["coords"], bt["valid"]
)
jax.block_until_ready(variables)
state = TrainState.create(variables, tx, jax.random.PRNGKey(1))


@jax.jit
def step(state, bt):
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
    params = optax.apply_updates(state.params, updates)
    return state.replace(step=state.step + 1, params=params,
                         opt_state=opt_state), loss


t0 = time.perf_counter()
state, loss = step(state, bt)
print(f"[{variant}] compile+first: {time.perf_counter()-t0:.1f}s "
      f"loss={float(loss):.4f}", flush=True)
for _ in range(3):
    state, loss = step(state, bt)
float(loss)  # host-read fence
t0 = time.perf_counter()
for _ in range(ITERS):
    state, loss = step(state, bt)
final = float(loss)
dt = (time.perf_counter() - t0) / ITERS
print(f"STEP_MS {variant} {dt*1e3:.2f} pts/s {N/dt:,.0f} loss {final:.4f}",
      flush=True)
