"""Round-3 decomposition of the share_heads train step (240 ms entry):
where do the ms go, and what is the unexplained backward residue (VERDICT
r2 #4)?"""
import sys

sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from hept_tpu.core.buckets import grouped_sort_carry
from hept_tpu.data.batching import pack_events
from hept_tpu.data.synthetic import synthetic_tracking_event
from hept_tpu.models import HeptTransformer, TransformerConfig
from hept_tpu.ops.bucket_attn import hept_attention_core_xcols
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
n = bt["x"].shape[0]


def fence(x):
    return float(jnp.asarray(x, jnp.float32).ravel()[0])


def timeit(tag, f, *args, iters=10):
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


CORE = dict(block_size=100, impl="hybrid", sort_pack=True, sort_ops=8,
            unsort_pack=True, share_heads=True)

cfg = TransformerConfig(
    in_dim=ev.x.shape[1], coords_dim=ev.coords.shape[1], task="tracking",
    h_dim=24, num_heads=8, n_layers=4, block_size=100, n_hashes=3,
    num_regions=150, num_w_per_dist=10, padding_mode="replicate",
    attn_impl="hybrid", scan_layers=True, sort_pack=True, sort_ops=8,
    qkv_post_sort=True, unsort_pack=True, share_heads=True,
)
model = HeptTransformer(cfg)
variables = jax.jit(model.init)(jax.random.PRNGKey(0), bt["x"], bt["coords"], bt["valid"])
jax.block_until_ready(variables)
tx = make_optimizer("adam", lr=1e-2)
state = TrainState.create(variables, tx, jax.random.PRNGKey(1))


@jax.jit
def fwd(p, c, bt):
    return model.apply({"params": p, "constants": c}, bt["x"], bt["coords"], bt["valid"])

t_fwd = timeit("model fwd", fwd, state.params, state.constants, bt)


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
    return state.replace(step=state.step + 1, params=p, opt_state=opt_state), loss

t_step = timeit("train step (fwd+bwd+adam, windowed loss)", train_step, state, bt)


@jax.jit
def fwd_bwd(p, c, bt):
    def f(p):
        out = model.apply({"params": p, "constants": c}, bt["x"], bt["coords"], bt["valid"])
        return (out * out).sum()
    return jax.value_and_grad(f)(p)

t_fb = timeit("model fwd+bwd (sq loss)", fwd_bwd, state.params, state.constants, bt)

out0 = fwd(state.params, state.constants, bt)
jax.block_until_ready(out0)


@jax.jit
def loss_fb(out, bt):
    def f(out):
        return infonce_loss(out, bt["pairs"], bt["pair_mask"],
                            bt["cluster_ids"], bt["recons"], bt["pts"],
                            windowed_pairs=True, pair_rev=bt["pair_rev"],
                            pair_weight=bt["pair_weight"],
                            pair_neg=bt["pair_neg"])
    return jax.value_and_grad(f)(out)

t_loss = timeit("windowed infonce fwd+bwd", loss_fb, out0, bt)

_, grads0 = fwd_bwd(state.params, state.constants, bt)
jax.block_until_ready(grads0)


@jax.jit
def adam_only(state, grads):
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    p = optax.apply_updates(state.params, updates)
    return state.replace(params=p, opt_state=opt_state)

t_adam = timeit("adam update alone", adam_only, state, grads0)

# attention core alone (share_heads + hybrid)
c_, h_, dm, d_ = cfg.n_hashes, cfg.num_heads, cfg.h_dim, cfg.h_dim
cd = ev.coords.shape[1]
ks = jax.random.split(jax.random.PRNGKey(2), 10)
x_cols = jax.random.normal(ks[0], (dm, n), jnp.float32)
coords_cols = jax.random.normal(ks[1], (cd, n), jnp.float32)
wq = jax.random.normal(ks[2], (h_, dm, d_), jnp.float32) * 0.1
wk = jax.random.normal(ks[3], (h_, dm, d_), jnp.float32) * 0.1
wv = jax.random.normal(ks[4], (h_, dm, d_), jnp.float32) * 0.1
sqrt_w = jnp.abs(jax.random.normal(ks[5], (h_, cd))) + 1.0
alpha = jax.random.normal(ks[6], (1, d_ + cd, c_), jnp.float32)
codes = jax.random.randint(ks[7], (c_, h_, n), 0, 300).astype(jnp.float32)

core = jax.jit(lambda *a: hept_attention_core_xcols(*a, **CORE))
t_core = timeit("core fwd (1 layer, share_heads+hybrid)", core,
                x_cols, coords_cols, wq, wk, wv, sqrt_w, alpha, codes)


@jax.jit
def core_fb(x_cols, coords_cols, wq, wk, wv, sqrt_w, alpha, codes):
    def f(x_cols, wq, wk, wv):
        o = hept_attention_core_xcols(
            x_cols, coords_cols, wq, wk, wv, sqrt_w, alpha, codes, **CORE)
        return (o * o).sum()
    return jax.value_and_grad(f, argnums=(0, 1, 2, 3))(x_cols, wq, wk, wv)

t_core_fb = timeit("core fwd+bwd (1 layer, share_heads+hybrid)", core_fb,
                   x_cols, coords_cols, wq, wk, wv, sqrt_w, alpha, codes)

# sorts alone at the share_heads shapes
kk3 = jax.random.normal(ks[8], (c_, 1, n), jnp.float32)
xc = jnp.concatenate([x_cols, coords_cols], axis=0)[None]  # (1, 30, n)
od = jax.random.normal(ks[9], (c_, h_, d_ + 1, n), jnp.float32)
perm = jnp.asarray(
    np.stack([np.stack([np.random.permutation(n) for _ in range(h_)])
              for _ in range(c_)]).astype(np.int32))


@jax.jit
def sorts_fwd(kk3, xc, od, perm):
    (sxk,), _ = grouped_sort_carry([kk3], [xc], pack=True, n_ops=8)
    (u,), _ = grouped_sort_carry([perm], [od], pack=True, n_ops=8)
    return sxk.sum() + u.sum()

t_sorts = timeit("layer sorts fwd (share_heads sort + unsort)", sorts_fwd,
                 kk3, xc, od, perm)

# x-sort alone and unsort alone
@jax.jit
def xsort_only(kk3, xc):
    (sxk,), _ = grouped_sort_carry([kk3], [xc], pack=True, n_ops=8)
    return sxk.sum()

t_xsort = timeit("x-sort alone (3 rows, 16 ops)", xsort_only, kk3, xc)


@jax.jit
def unsort_only(od, perm):
    (u,), _ = grouped_sort_carry([perm], [od], pack=True, n_ops=8)
    return u.sum()

t_unsort = timeit("unsort alone (24 rows, 13 ops)", unsort_only, od, perm)

# kernel alone (hybrid: XLA fwd + pallas bwd) at the r=24 shapes
from hept_tpu.ops.bucket_attn_pallas import bucket_rbf_attention_cols_pallas

r = c_ * h_
sq = jax.random.normal(ks[0], (r, dm + cd, n), jnp.float32)
sk = jax.random.normal(ks[1], (r, dm + cd, n), jnp.float32)
sv = jax.random.normal(ks[2], (r, dm, n), jnp.float32)

kern = jax.jit(lambda a, b, c2: bucket_rbf_attention_cols_pallas(
    a, b, c2, block_size=100, hybrid=True))
t_kern = timeit("bucket kernel fwd (hybrid=XLA einsum)", kern, sq, sk, sv)


@jax.jit
def kern_fb(sq, sk, sv):
    def f(sq, sk, sv):
        denom, so = bucket_rbf_attention_cols_pallas(
            sq, sk, sv, block_size=100, hybrid=True)
        return so.sum() + denom.sum()
    return jax.value_and_grad(f, argnums=(0, 1, 2))(sq, sk, sv)

t_kern_fb = timeit("bucket kernel fwd+bwd (hybrid)", kern_fb, sq, sk, sv)

print("\nsummary:", flush=True)
print(f"  step {t_step:.1f} | fwd {t_fwd:.1f} | fb {t_fb:.1f} | loss {t_loss:.1f}"
      f" | adam {t_adam:.1f}", flush=True)
print(f"  per-layer: core {t_core:.1f} fb {t_core_fb:.1f} | sorts(fwd) {t_sorts:.1f}"
      f" (xsort {t_xsort:.1f} + unsort {t_unsort:.1f}) | kernel {t_kern:.1f}"
      f" fb {t_kern_fb:.1f}", flush=True)
print(f"  4x core_fb = {4 * t_core_fb:.1f}; fb - 4x core_fb (encoder/head/AD) = "
      f"{t_fb - 4 * t_core_fb:.1f}; step - fb - loss - adam = "
      f"{t_step - t_fb - t_loss - t_adam:.1f}", flush=True)
