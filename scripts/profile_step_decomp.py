"""Component decomposition of the canon-stack train step at tracking-60k.

Measures nested sub-pipelines so the differences isolate components:
  full      = fwd + bwd + adam update      (the bench step)
  grad      = fwd + bwd (value_and_grad, no optimizer)
  value     = fwd + loss (no grad)
  fwd       = model apply only
  loss_fb   = windowed InfoNCE fwd+bwd on a FIXED embedding
  plan      = encoder + static plan build only
adam = full - grad; bwd = grad - value; loss fwd ~= value - fwd.

Run: python scripts/profile_step_decomp.py [variant]
  variant: a key of train_60k_demo.VARIANTS (default: the hardcoded canon
  stack below; e.g. fullrv2, r9rv2, nh2r8)
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

_base = dict(
    in_dim=ev.x.shape[1], coords_dim=ev.coords.shape[1], task="tracking",
    h_dim=24, num_heads=8, n_layers=4, block_size=100, n_hashes=3,
    num_regions=150, num_w_per_dist=10, padding_mode="replicate",
    attn_impl="hybrid", scan_layers=True, sort_pack=True, sort_ops=8,
    qkv_post_sort=True, unsort_pack=True, shared_sort=True, share_heads=True,
    kernel_bf16=True,
)
if len(sys.argv) > 1:
    sys.path.insert(0, "/root/repo/scripts")
    from train_60k_demo import VARIANTS

    # the variant dict is the single source of truth for the fast-mode
    # stack — base carries NO static/canon flags (a nh1/nh2 variant without
    # canon_residual must not inherit one; queue23 crash)
    vk = dict(VARIANTS[sys.argv[1]])
    _base["attn_impl"] = vk.pop("_attn_impl", "hybrid")
    vk.pop("_clip", None)
    vk.pop("_lr", None)
    _base.update(vk)
    print(f"variant {sys.argv[1]}: {vk}", flush=True)
else:
    _base.update(static_keys="x0", canon_residual=True)

batch = pack_events([ev], block_size=_base["block_size"], window_pairs=128)
keys = ("x", "coords", "valid", "pairs", "pair_mask", "cluster_ids", "recons",
        "pts", "pair_rev", "pair_weight", "pair_neg")
bt = {k: jnp.asarray(batch[k][0]) for k in keys}
cfg = TransformerConfig(**_base)
model = HeptTransformer(cfg)
tx = make_optimizer("adam", lr=1e-2)
variables = jax.jit(model.init)(
    jax.random.PRNGKey(0), bt["x"], bt["coords"], bt["valid"])
jax.block_until_ready(variables)
state = TrainState.create(variables, tx, jax.random.PRNGKey(1))


def loss_of(p, constants, bt):
    out = model.apply({"params": p, "constants": constants},
                      bt["x"], bt["coords"], bt["valid"])
    return infonce_loss(out, bt["pairs"], bt["pair_mask"],
                        bt["cluster_ids"], bt["recons"], bt["pts"],
                        windowed_pairs=True, pair_rev=bt["pair_rev"],
                        pair_weight=bt["pair_weight"], pair_neg=bt["pair_neg"])


@jax.jit
def step_full(state, bt):
    loss, grads = jax.value_and_grad(loss_of)(state.params, state.constants, bt)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    p = optax.apply_updates(state.params, updates)
    return state.replace(step=state.step + 1, params=p,
                         opt_state=opt_state), loss


@jax.jit
def step_grad(state, bt):
    loss, grads = jax.value_and_grad(loss_of)(state.params, state.constants, bt)
    # consume grads with a cheap reduction so nothing is DCE'd
    s = sum(jnp.vdot(g, g) for g in jax.tree_util.tree_leaves(grads))
    return loss + 0.0 * s


@jax.jit
def step_value(state, bt):
    return loss_of(state.params, state.constants, bt)


@jax.jit
def step_fwd(state, bt):
    out = model.apply({"params": state.params, "constants": state.constants},
                      bt["x"], bt["coords"], bt["valid"])
    return out.sum()


out_fixed = jax.jit(
    lambda s, bt: model.apply({"params": s.params, "constants": s.constants},
                              bt["x"], bt["coords"], bt["valid"])
)(state, bt)
jax.block_until_ready(out_fixed)


@jax.jit
def step_loss_fb(out, bt):
    def f(o):
        return infonce_loss(o, bt["pairs"], bt["pair_mask"],
                            bt["cluster_ids"], bt["recons"], bt["pts"],
                            windowed_pairs=True, pair_rev=bt["pair_rev"],
                            pair_weight=bt["pair_weight"],
                            pair_neg=bt["pair_neg"])
    l, g = jax.value_and_grad(f)(out)
    return l + 0.0 * jnp.vdot(g, g)


def timeit(tag, fn, *args, iters=15):
    r = fn(*args)
    jax.block_until_ready(r)
    fence = (lambda x: float(x[1]) if isinstance(x, tuple) else float(
        jnp.asarray(x).reshape(-1)[0]))
    fence(r)
    for _ in range(2):
        r = fn(*args)
    fence(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    fence(r)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{tag:<10s} {dt:7.2f} ms", flush=True)
    return dt


t_full = timeit("full", step_full, state, bt)
t_grad = timeit("grad", step_grad, state, bt)
t_value = timeit("value", step_value, state, bt)
t_fwd = timeit("fwd", step_fwd, state, bt)
t_loss = timeit("loss_fb", step_loss_fb, out_fixed, bt)

print(f"\nadam+update = {t_full - t_grad:6.2f} ms")
print(f"model bwd   = {t_grad - t_value:6.2f} ms (incl. loss bwd)")
print(f"loss fwd    = {t_value - t_fwd:6.2f} ms")
print(f"model fwd   = {t_fwd:6.2f} ms")
print(f"loss fwd+bwd standalone = {t_loss:6.2f} ms")
