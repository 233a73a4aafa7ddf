"""Round-2 step decomposition: where do the 830 ms go, component by component.

Every timing is fenced by a host scalar read (the remote backend's
block_until_ready can return early)."""
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
from hept_tpu.core.buckets import grouped_sort_carry

N = 60_000
rng = np.random.default_rng(0)
ev = synthetic_tracking_event(rng, n_points=N, avg_track_size=8, pairs_per_point=16)
batch = pack_events([ev], block_size=100)
keys = ("x", "coords", "valid", "pairs", "pair_mask", "cluster_ids", "recons", "pts")
bt = {k: jnp.asarray(batch[k][0]) for k in keys}

cfg = TransformerConfig(
    in_dim=ev.x.shape[1], coords_dim=ev.coords.shape[1], task="tracking",
    h_dim=24, num_heads=8, n_layers=4, block_size=100, n_hashes=3,
    num_regions=150, num_w_per_dist=10, padding_mode="replicate",
    attn_impl="pallas", scan_layers=True, sort_pack=True, sort_ops=8,
)
model = HeptTransformer(cfg)
variables = jax.jit(model.init)(jax.random.PRNGKey(0), bt["x"], bt["coords"], bt["valid"])
jax.block_until_ready(variables)
tx = make_optimizer("adam", lr=1e-2)
state = TrainState.create(variables, tx, jax.random.PRNGKey(1))
params, constants = state.params, state.constants


def fence(x):
    return float(jnp.asarray(x, jnp.float32).ravel()[0])


def timeit(tag, f, *args, iters=10):
    t_c0 = time.perf_counter()
    out = f(*args)
    fence(jax.tree_util.tree_leaves(out)[0])
    t_compile = time.perf_counter() - t_c0
    out = f(*args)
    fence(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    fence(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{tag:<42s} {dt:9.2f} ms   (compile {t_compile:.0f}s)", flush=True)
    return dt


def apply_model(p, bt):
    return model.apply({"params": p, "constants": constants},
                       bt["x"], bt["coords"], bt["valid"])


# --- 1. forward only
fwd = jax.jit(apply_model)
timeit("fwd", fwd, params, bt)

# --- 2. fwd+bwd with sum loss (no InfoNCE): isolates model AD cost
@jax.jit
def grad_sum(p, bt):
    return jax.grad(lambda p: apply_model(p, bt).sum())(p)
timeit("fwd+bwd (sum loss)", grad_sum, params, bt)

# --- 3. fwd+bwd with InfoNCE
@jax.jit
def grad_nce(p, bt):
    def loss_of(p):
        out = apply_model(p, bt)
        return infonce_loss(out, bt["pairs"], bt["pair_mask"],
                            bt["cluster_ids"], bt["recons"], bt["pts"])
    return jax.grad(loss_of)(p)
timeit("fwd+bwd (InfoNCE)", grad_nce, params, bt)

# --- 4. full train step
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

def step_fn(state, bt):
    s2, loss = train_step(state, bt)
    return loss
timeit("train step (full)", step_fn, state, bt)

# --- 5. InfoNCE alone fwd + bwd at real pair counts
out0 = fwd(params, bt)
@jax.jit
def nce_only(out):
    return infonce_loss(out, bt["pairs"], bt["pair_mask"],
                        bt["cluster_ids"], bt["recons"], bt["pts"])
timeit("InfoNCE fwd", nce_only, out0)
@jax.jit
def nce_grad(out):
    return jax.grad(lambda o: infonce_loss(o, bt["pairs"], bt["pair_mask"],
                    bt["cluster_ids"], bt["recons"], bt["pts"]))(out)
timeit("InfoNCE fwd+bwd", nce_grad, out0)
print("pairs shape:", batch["pairs"].shape, flush=True)

# --- 6. sort microbenches at real shapes (c=3,h=8,n=60000)
c, h, n = 3, 8, N
d_hash, dv = 24 + 6, 24
kq = jnp.asarray(rng.standard_normal((c, h, n)), jnp.float32)
kk = jnp.asarray(rng.standard_normal((c, h, n)), jnp.float32)
qhat = jnp.asarray(rng.standard_normal((h, d_hash, n)), jnp.float32)
kv = jnp.asarray(rng.standard_normal((h, d_hash + dv, n)), jnp.float32)
src = jnp.asarray(
    np.stack([np.stack([rng.permutation(n) for _ in range(h)]) for _ in range(c)]).astype(np.int32))
od = jnp.asarray(rng.standard_normal((c, h, dv + 1, n)), jnp.float32)

@jax.jit
def fwd_sort(kq, kk, qhat, kv):
    (sq, skv), (qs, ks) = grouped_sort_carry([kq, kk], [qhat, kv], pack=True, n_ops=8)
    return sq.sum() + skv.sum()
timeit("fwd merged sort (84 cols, packed)", fwd_sort, kq, kk, qhat, kv)

@jax.jit
def unsort_one(src, od):
    (u,), _ = grouped_sort_carry([src], [od], pack=False, n_ops=8)
    return u.sum()
timeit("unsort (25 cols f32)", unsort_one, src, od)

@jax.jit
def fwd_sort_vjp(kq, kk, qhat, kv):
    def f(qhat, kv):
        (sq, skv), _ = grouped_sort_carry([kq, kk], [qhat, kv], pack=True, n_ops=8)
        return sq.sum() + skv.sum()
    return jax.grad(f, argnums=(0, 1))(qhat, kv)[0]
timeit("fwd merged sort +VJP", fwd_sort_vjp, kq, kk, qhat, kv)

# narrow restructured sort: x(24)+coords(6) = 30 cols per order
xc = jnp.asarray(rng.standard_normal((h, 30, n)), jnp.float32)
@jax.jit
def fwd_sort_narrow(kq, kk, xc):
    (sq, skv), _ = grouped_sort_carry([kq, kk], [xc, xc], pack=True, n_ops=8)
    return sq.sum() + skv.sum()
timeit("fwd sort narrow (2x30 cols, packed)", fwd_sort_narrow, kq, kk, xc)

# keys+iota only sort (what a rank-only sort would cost)
@jax.jit
def key_sort(kq, kk):
    empty = jnp.zeros((h, 2, n), jnp.float32)
    (a, b), (s1, s2) = grouped_sort_carry([kq, kk], [empty, empty], pack=True, n_ops=1)
    return s1.sum() + s2.sum()
timeit("key+iota sort only", key_sort, kq, kk)

# --- 7. bucket kernel alone (pallas) at real shapes
from hept_tpu.ops.bucket_attn_pallas import bucket_rbf_attention_cols_pallas
sq = jnp.asarray(rng.standard_normal((c * h, d_hash, n)), jnp.float32)
sk = jnp.asarray(rng.standard_normal((c * h, d_hash, n)), jnp.float32)
sv = jnp.asarray(rng.standard_normal((c * h, dv, n)), jnp.float32)
@jax.jit
def kern_only(sq, sk, sv):
    denom, so = bucket_rbf_attention_cols_pallas(sq, sk, sv, block_size=100)
    return so.sum() + denom.sum()
timeit("bucket kernel fwd", kern_only, sq, sk, sv)
@jax.jit
def kern_vjp(sq, sk, sv):
    def f(sq, sk, sv):
        denom, so = bucket_rbf_attention_cols_pallas(sq, sk, sv, block_size=100)
        return so.sum() + denom.sum()
    return jax.grad(f, argnums=(0, 1, 2))(sq, sk, sv)[0]
timeit("bucket kernel fwd+bwd", kern_vjp, sq, sk, sv)
print("done", flush=True)
