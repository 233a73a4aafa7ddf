"""Round-3 decomposition: where does the 469 ms step go after the variadic
sort rewrite (sorts ~5.6 ms/layer per probe_variadic_sort.py)?

Times, at the exact bench shapes/flags (60k event, pallas, sort_pack,
unsort_pack, qkv_post_sort, scan_layers):
  - model fwd / train step / loss-only step (as in bench)
  - xcols attention core alone: fwd, fwd+bwd
  - the two grouped_sort_carry calls alone: fwd, fwd+bwd
  - pallas bucket kernel alone at sorted shapes: fwd, fwd+bwd
  - projections/hash einsums alone
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
batch = pack_events([ev], block_size=100)
keys = ("x", "coords", "valid", "pairs", "pair_mask", "cluster_ids", "recons", "pts")
bt = {k: jnp.asarray(batch[k][0]) for k in keys}
n = bt["x"].shape[0]
print(f"padded n = {n}", flush=True)


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


cfg = TransformerConfig(
    in_dim=ev.x.shape[1], coords_dim=ev.coords.shape[1], task="tracking",
    h_dim=24, num_heads=8, n_layers=4, block_size=100, n_hashes=3,
    num_regions=150, num_w_per_dist=10, padding_mode="replicate",
    attn_impl="pallas", scan_layers=True, sort_pack=True, sort_ops=8,
    qkv_post_sort=True, unsort_pack=True,
)
model = HeptTransformer(cfg)
variables = jax.jit(model.init)(jax.random.PRNGKey(0), bt["x"], bt["coords"], bt["valid"])
jax.block_until_ready(variables)
tx = make_optimizer("adam", lr=1e-2)
state = TrainState.create(variables, tx, jax.random.PRNGKey(1))

# ---------- full fwd / step ----------
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
                            bt["cluster_ids"], bt["recons"], bt["pts"])
    loss, grads = jax.value_and_grad(loss_of)(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    p = optax.apply_updates(state.params, updates)
    return state.replace(step=state.step + 1, params=p, opt_state=opt_state), loss

t_step = timeit("train step (fwd+bwd+adam)", train_step, state, bt)


@jax.jit
def fwd_bwd_no_loss(p, c, bt):
    def f(p):
        out = model.apply({"params": p, "constants": c}, bt["x"], bt["coords"], bt["valid"])
        return (out * out).sum()
    return jax.value_and_grad(f)(p)

t_fb = timeit("model fwd+bwd (sq-sum loss, no adam)", fwd_bwd_no_loss,
              state.params, state.constants, bt)

# ---------- attention core alone at model shapes ----------
c_, h_, dm, d_ = cfg.n_hashes, cfg.num_heads, cfg.h_dim, cfg.h_dim
cd = ev.coords.shape[1]
rngj = jax.random.PRNGKey(2)
ks = jax.random.split(rngj, 10)
x_cols = jax.random.normal(ks[0], (dm, n), jnp.float32)
coords_cols = jax.random.normal(ks[1], (cd, n), jnp.float32)
wq = jax.random.normal(ks[2], (h_, dm, d_), jnp.float32) * 0.1
wk = jax.random.normal(ks[3], (h_, dm, d_), jnp.float32) * 0.1
wv = jax.random.normal(ks[4], (h_, dm, d_), jnp.float32) * 0.1
sqrt_w = jnp.abs(jax.random.normal(ks[5], (h_, cd))) + 1.0
alpha = jax.random.normal(ks[6], (h_, d_ + cd, c_), jnp.float32)
codes = jax.random.randint(ks[7], (c_, h_, n), 0, 300).astype(jnp.float32)

core = jax.jit(lambda *a: hept_attention_core_xcols(
    *a, block_size=100, impl="pallas", sort_pack=True, sort_ops=8,
    unsort_pack=True))

t_core = timeit("xcols core fwd (1 layer)", core,
                x_cols, coords_cols, wq, wk, wv, sqrt_w, alpha, codes)


@jax.jit
def core_fb(x_cols, coords_cols, wq, wk, wv, sqrt_w, alpha, codes):
    def f(x_cols, wq, wk, wv):
        o = hept_attention_core_xcols(
            x_cols, coords_cols, wq, wk, wv, sqrt_w, alpha, codes,
            block_size=100, impl="pallas", sort_pack=True, sort_ops=8,
            unsort_pack=True)
        return (o * o).sum()
    return jax.value_and_grad(f, argnums=(0, 1, 2, 3))(x_cols, wq, wk, wv)

t_core_fb = timeit("xcols core fwd+bwd (1 layer)", core_fb,
                   x_cols, coords_cols, wq, wk, wv, sqrt_w, alpha, codes)

# ---------- sorts alone ----------
kq = jax.random.normal(ks[8], (c_, h_, n), jnp.float32)
kk = jax.random.normal(ks[9], (c_, h_, n), jnp.float32)
xc = jnp.concatenate([x_cols, coords_cols], axis=0)  # (30, n)
od = jax.random.normal(ks[0], (c_, h_, d_ + 1, n), jnp.float32)
perm = jnp.asarray(
    np.stack([np.stack([np.random.permutation(n) for _ in range(h_)])
              for _ in range(c_)]).astype(np.int32))


@jax.jit
def sorts_fwd(kq, kk, xc, od, perm):
    (sq, sk), (qsrc, _) = grouped_sort_carry([kq, kk], [xc, xc], pack=True, n_ops=8)
    (u,), _ = grouped_sort_carry([perm], [od], pack=True, n_ops=8)
    return sq.sum() + sk.sum() + u.sum()

t_sorts = timeit("layer sorts fwd (2 fwd-sorts + unsort)", sorts_fwd,
                 kq, kk, xc, od, perm)


@jax.jit
def sorts_fb(kq, kk, xc, od, perm):
    def f(xc, od):
        (sq, sk), _ = grouped_sort_carry([kq, kk], [xc, xc], pack=True, n_ops=8)
        (u,), _ = grouped_sort_carry([perm], [od], pack=True, n_ops=8)
        return sq.sum() + sk.sum() + u.sum()
    return jax.value_and_grad(f, argnums=(0, 1))(xc, od)

t_sorts_fb = timeit("layer sorts fwd+bwd", sorts_fb, kq, kk, xc, od, perm)

# ---------- pallas kernel alone ----------
from hept_tpu.ops.bucket_attn_pallas import bucket_rbf_attention_cols_pallas

sq_s = jax.random.normal(ks[1], (c_ * h_, d_ + cd, n), jnp.float32)
sk_s = jax.random.normal(ks[2], (c_ * h_, d_ + cd, n), jnp.float32)
sv_s = jax.random.normal(ks[3], (c_ * h_, d_, n), jnp.float32)

kern = jax.jit(lambda a, b, c: bucket_rbf_attention_cols_pallas(a, b, c, block_size=100))
t_kern = timeit("pallas bucket kernel fwd (1 layer)", kern, sq_s, sk_s, sv_s)


@jax.jit
def kern_fb(sq_s, sk_s, sv_s):
    def f(sq_s, sk_s, sv_s):
        dn, so = bucket_rbf_attention_cols_pallas(sq_s, sk_s, sv_s, block_size=100)
        return so.sum() + dn.sum()
    return jax.value_and_grad(f, argnums=(0, 1, 2))(sq_s, sk_s, sv_s)

t_kern_fb = timeit("pallas bucket kernel fwd+bwd (1 layer)", kern_fb, sq_s, sk_s, sv_s)

# ---------- projections + hash einsums alone ----------
@jax.jit
def proj_hash(x_cols, coords_cols, wq, wk, wv, sqrt_w, alpha, codes, sxq, sxk):
    d = d_
    a1, a2 = alpha[:, :d, :], alpha[:, d:, :]
    beta_q = jnp.einsum("hed,hdc->hec", wq, a1)
    beta_k = jnp.einsum("hed,hdc->hec", wk, a1)
    gamma = sqrt_w[:, :, None] * a2
    coord_hash = jnp.einsum("hrc,rn->chn", gamma, coords_cols)
    qh = jnp.einsum("hec,en->chn", beta_q, x_cols) + coord_hash
    kh = jnp.einsum("hec,en->chn", beta_k, x_cols) + coord_hash

    def project(sx, w):
        xs, cs = sx[:, :, :dm], sx[:, :, dm:]
        proj = jnp.einsum("hed,chen->chdn", w, xs, preferred_element_type=jnp.float32)
        rpe = sqrt_w[None, :, :, None] * cs
        return jnp.concatenate([proj, rpe], axis=2)

    sq = project(sxq, wq)
    sk = project(sxk, wk)
    sv = jnp.einsum("hed,chen->chdn", wv, sxk[:, :, :dm],
                    preferred_element_type=jnp.float32)
    return qh.sum() + kh.sum() + sq.sum() + sk.sum() + sv.sum()

sxq = jax.random.normal(ks[4], (c_, h_, dm + cd, n), jnp.float32)
sxk = jax.random.normal(ks[5], (c_, h_, dm + cd, n), jnp.float32)
t_proj = timeit("hash einsums + post-sort projections fwd", proj_hash,
                x_cols, coords_cols, wq, wk, wv, sqrt_w, alpha, codes, sxq, sxk)

# ---------- loss alone ----------
out0 = fwd(state.params, state.constants, bt)
jax.block_until_ready(out0)


@jax.jit
def loss_fb(out, bt):
    def f(out):
        return infonce_loss(out, bt["pairs"], bt["pair_mask"],
                            bt["cluster_ids"], bt["recons"], bt["pts"])
    return jax.value_and_grad(f)(out)

t_loss = timeit("infonce loss fwd+bwd (on fwd output)", loss_fb, out0, bt)

print("\nsummary:", flush=True)
print(f"  step {t_step:.1f} | fwd {t_fwd:.1f} | fwd+bwd(sq) {t_fb:.1f} | "
      f"core fwd {t_core:.1f} core fb {t_core_fb:.1f} | sorts {t_sorts:.1f} "
      f"fb {t_sorts_fb:.1f} | kern {t_kern:.1f} fb {t_kern_fb:.1f} | "
      f"proj {t_proj:.1f} | loss_fb {t_loss:.1f}", flush=True)
