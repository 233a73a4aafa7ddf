"""Why is B=2 flat batching superlinear at 60k on the rows headline?

bench warm (queue13, nh2r8cv2): B=1 125.2 ms, B=2 300.1 ms — 1.20x per
event even with stacked per-event sorts (sort_events=2, linear-by-design).
This probe decomposes the B=2 step the same way profile_step_decomp does
for B=1, plus a fwd-only A/B of the suspects:

  fwd_b2          flat forward, sort_events=2
  fwd_b1          per-event forward (x2 for the linear expectation)
  loss_b2         the 2-event unrolled windowed InfoNCE on fixed embeddings
  grad_b2 / full  value_and_grad / + adam

Run ON TPU: python scripts/probe_b2_superlinear.py [variant]
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

from train_60k_demo import VARIANTS

from hept_tpu.data.batching import pack_events
from hept_tpu.data.synthetic import synthetic_tracking_event
from hept_tpu.models import (HeptTransformer, TransformerConfig,
                             make_flat_batched_apply)
from hept_tpu.train.losses import infonce_loss
from hept_tpu.train.optim import make_optimizer
from hept_tpu.train.state import TrainState

variant = sys.argv[1] if len(sys.argv) > 1 else "nh2r8cv2r"
ITERS = 10
N = 60_000
B = 2

rng = np.random.default_rng(0)
events = [synthetic_tracking_event(rng, n_points=N, avg_track_size=8,
                                   pairs_per_point=16) for _ in range(B)]
vk = dict(VARIANTS[variant])
attn_impl = vk.pop("_attn_impl", "hybrid")
vk.pop("_clip", None)
vk.pop("_lr", None)
bs = vk.get("block_size", 100)
batch = pack_events(events, block_size=bs, window_pairs=128)
keys = ("x", "coords", "valid", "pairs", "pair_mask", "cluster_ids", "recons",
        "pts", "pair_rev", "pair_weight", "pair_neg")
bt = {k: jnp.asarray(batch[k]) for k in keys}

base = dict(
    in_dim=events[0].x.shape[1], coords_dim=events[0].coords.shape[1],
    task="tracking", h_dim=24, num_heads=8, n_layers=4, block_size=100,
    n_hashes=3, num_regions=150, num_w_per_dist=10,
    padding_mode="replicate", attn_impl=attn_impl, scan_layers=True,
    sort_pack=True, sort_ops=8, qkv_post_sort=True, unsort_pack=True,
    shared_sort=True, share_heads=True, kernel_bf16=True,
)
base.update(vk)

cfg1 = TransformerConfig(**base)
cfg2 = TransformerConfig(**{**base, "sort_events": B})
m1 = HeptTransformer(cfg1)
m2 = HeptTransformer(cfg2)
flat2 = make_flat_batched_apply(m2)

v1 = jax.jit(m1.init)(jax.random.PRNGKey(0), bt["x"][0], bt["coords"][0],
                      bt["valid"][0])
jax.block_until_ready(v1)


def timed(fn, *args, iters=ITERS, warm=3):
    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(warm - 1):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    # host-read fence: the tunnel backend can lie through block_until_ready
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf))
    return (time.perf_counter() - t0) / iters * 1e3


@jax.jit
def fwd1(v, x, c, val):
    return m1.apply(v, x, c, val)


@jax.jit
def fwd2(v, x, c, val):
    return flat2(v, x, c, val)


t_f1 = timed(fwd1, v1, bt["x"][0], bt["coords"][0], bt["valid"][0])
t_f2 = timed(fwd2, v1, bt["x"], bt["coords"], bt["valid"])
print(f"fwd B=1 {t_f1:8.2f} ms   (linear B=2 expectation {2 * t_f1:8.2f})")
print(f"fwd B=2 {t_f2:8.2f} ms   superlinearity {t_f2 / (2 * t_f1):.3f}x")

emb = fwd2(v1, bt["x"], bt["coords"], bt["valid"])
emb = jax.block_until_ready(emb)


def loss_of_emb(e):
    ls = [
        infonce_loss(e[i], bt["pairs"][i], bt["pair_mask"][i],
                     bt["cluster_ids"][i], bt["recons"][i], bt["pts"][i],
                     windowed_pairs=True, pair_rev=bt["pair_rev"][i],
                     pair_weight=bt["pair_weight"][i],
                     pair_neg=bt["pair_neg"][i])
        for i in range(B)
    ]
    return sum(ls) / len(ls)


t_lf = timed(jax.jit(loss_of_emb), emb)
t_lfb = timed(jax.jit(jax.grad(loss_of_emb)), emb)
print(f"loss fwd  B=2 {t_lf:8.2f} ms")
print(f"loss f+b  B=2 {t_lfb:8.2f} ms")

tx = make_optimizer("adam", lr=1e-2)
state = TrainState.create(v1, tx, jax.random.PRNGKey(1))


def make_full():
    import optax

    @jax.jit
    def step(s, b):
        def loss_of(p):
            out = flat2({"params": p, "constants": s.constants},
                        b["x"], b["coords"], b["valid"])
            return loss_of_emb(out)

        loss, grads = jax.value_and_grad(loss_of)(s.params)
        updates, opt = tx.update(grads, s.opt_state, s.params)
        return s.replace(step=s.step + 1,
                         params=optax.apply_updates(s.params, updates),
                         opt_state=opt), loss

    return step


step = make_full()
s, l = step(state, bt)
float(l)
for _ in range(2):
    s, l = step(s, bt)
float(l)
t0 = time.perf_counter()
for _ in range(ITERS):
    s, l = step(s, bt)
float(l)
t_full = (time.perf_counter() - t0) / ITERS * 1e3
print(f"full step B=2 {t_full:8.2f} ms  "
      f"({t_full / B:.1f} ms/event; B=1 headline ~95.6)")
