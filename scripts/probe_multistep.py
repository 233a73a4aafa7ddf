"""Probe: does per-call dispatch cost real step time, and does a K-step
lax.scan train loop amortize it?

The queue22/23 decompositions attributed ~11 ms of the 96 ms headline step
to "adam, mostly per-call dispatch" and ~28 ms to encoder/head/AD plumbing
(VERDICT r3 weak #5 / next #4). Through the remote TPU tunnel each jit call
is a network round trip; if those gaps are launch overhead rather than
device compute, scanning K steps inside ONE jit call (the idiomatic JAX
training loop at scale) collapses them by 1/K.

Measures, on the headline stack (nh2r8cv2r):
  single      per-step time of the usual one-call train step
  single_don  same with donate_argnums (in-place state update)
  scanK       per-step time of lax.scan over K stacked batches (one call)

Run: python scripts/probe_multistep.py [K=8] [iters=10]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
import optax

from train_60k_demo import VARIANTS

from hept_tpu.data.batching import pack_events
from hept_tpu.data.synthetic import synthetic_tracking_event
from hept_tpu.models import HeptTransformer, TransformerConfig
from hept_tpu.train.losses import infonce_loss
from hept_tpu.train.optim import make_optimizer
from hept_tpu.train.state import TrainState

K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
N = 60_000

rng = np.random.default_rng(0)
ev = synthetic_tracking_event(rng, n_points=N, avg_track_size=8,
                              pairs_per_point=16)
batch = pack_events([ev], block_size=100, window_pairs=128)
keys = ("x", "coords", "valid", "pairs", "pair_mask", "cluster_ids", "recons",
        "pts", "pair_rev", "pair_weight", "pair_neg")
bt = {k: jnp.asarray(batch[k][0]) for k in keys}

vk = dict(VARIANTS["nh2r8cv2r"])
impl = vk.pop("_attn_impl", "hybrid")
cfg = TransformerConfig(
    in_dim=ev.x.shape[1], coords_dim=ev.coords.shape[1], task="tracking",
    **{
        **dict(block_size=100, n_hashes=3, num_regions=150, num_heads=8,
               h_dim=24, n_layers=4, num_w_per_dist=10, sort_pack=True,
               sort_ops=8, qkv_post_sort=True, scan_layers=True,
               unsort_pack=True, shared_sort=True, share_heads=True,
               kernel_bf16=True, padding_mode="replicate", attn_impl=impl),
        **vk,
    },
)
model = HeptTransformer(cfg)
tx = make_optimizer("adam", lr=1e-2)
variables = jax.jit(model.init)(
    jax.random.PRNGKey(0), bt["x"], bt["coords"], bt["valid"]
)
jax.block_until_ready(variables)
state0 = TrainState.create(variables, tx, jax.random.PRNGKey(1))


def step_logic(state, b):
    def loss_of(p):
        out = model.apply(
            {"params": p, "constants": state.constants},
            b["x"], b["coords"], b["valid"],
        )
        return infonce_loss(
            out, b["pairs"], b["pair_mask"], b["cluster_ids"], b["recons"],
            b["pts"], windowed_pairs=True, pair_rev=b["pair_rev"],
            pair_weight=b["pair_weight"], pair_neg=b["pair_neg"],
        )

    loss, grads = jax.value_and_grad(loss_of)(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return state.replace(step=state.step + 1, params=params,
                         opt_state=opt_state), loss


step1 = jax.jit(step_logic)
step1_don = jax.jit(step_logic, donate_argnums=(0,))


@jax.jit
def stepK(state, bts):  # bts leaves have leading K axis
    return jax.lax.scan(step_logic, state, bts)


def timeit(tag, fn, *args, per=1, iters=ITERS, donate=False):
    if donate:  # donated inputs die per call: chain the returned state
        st = jax.device_put(jax.tree_util.tree_map(jnp.asarray, args[0]))
        st, l = fn(st, *args[1:])
        jax.block_until_ready(st)
        float(l)
        t0 = time.perf_counter()
        for _ in range(iters):
            st, l = fn(st, *args[1:])
        float(l)
        dt = (time.perf_counter() - t0) / iters / per * 1e3
        print(f"{tag:<12s} {dt:7.2f} ms/step", flush=True)
        return dt
    s = fn(*args)
    jax.block_until_ready(s)
    for _ in range(2):
        s = fn(*args)
    l = s[1]
    float(l.reshape(-1)[0] if hasattr(l, "reshape") else l)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(*args)
    l = s[1]
    float(jnp.asarray(l).reshape(-1)[-1])
    dt = (time.perf_counter() - t0) / iters / per * 1e3
    print(f"{tag:<12s} {dt:7.2f} ms/step", flush=True)
    return dt


t1 = timeit("single", step1, state0, bt)
btK = jax.tree_util.tree_map(
    lambda a: jnp.broadcast_to(a[None], (K,) + a.shape), bt
)
btK = jax.device_put(btK)  # materialize the K copies (honest HBM traffic)
jax.block_until_ready(btK)
tK = timeit(f"scan{K}", stepK, state0, btK, per=K)
td = timeit("single_don", step1_don, state0, bt, donate=True)
print(f"\nsingle {t1:.2f}  scan{K} {tK:.2f}  donate {td:.2f}  "
      f"dispatch+launch estimate = {t1 - tK:.2f} ms/step")
