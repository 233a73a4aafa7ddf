"""InfoNCE cost decomposition on TPU: gathers vs segment scatters, and the
effect of pack-time anchor sorting."""
import sys

sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from hept_tpu.train.losses import infonce_loss

N, E, D = 60_000, 960_000, 12
rng = np.random.default_rng(0)
emb = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
# radius-graph-like pairs: anchors with degree ~16
p0 = np.repeat(np.arange(N), 16)
p1 = (p0 + rng.integers(-200, 200, p0.shape[0])) % N
order = rng.permutation(E)
pairs_unsorted = jnp.asarray(np.stack([p0[order], p1[order]]).astype(np.int32))
pairs_sorted = jnp.asarray(np.stack([p0, p1]).astype(np.int32))
pair_mask = jnp.ones((E,), bool)
cluster_ids = jnp.asarray((np.arange(N) // 8).astype(np.int32))
recons = jnp.ones((N,), jnp.float32)
pts = jnp.asarray(rng.uniform(0.5, 3.0, N), jnp.float32)


def fence(x):
    return float(jnp.asarray(x, jnp.float32).ravel()[0])


def timeit(tag, f, *args, iters=20):
    out = f(*args)
    fence(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    fence(jax.tree_util.tree_leaves(out)[0])
    print(f"{tag:<46s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms", flush=True)


# 1/2: full loss fwd+bwd, unsorted vs sorted pairs
@jax.jit
def loss_grad(emb, pairs):
    return jax.grad(
        lambda e: infonce_loss(e, pairs, pair_mask, cluster_ids, recons, pts)
    )(emb)

timeit("loss fwd+bwd unsorted pairs", loss_grad, emb, pairs_unsorted)
timeit("loss fwd+bwd p0-sorted pairs", loss_grad, emb, pairs_sorted)

# 3: gathers alone
@jax.jit
def gathers(emb, pairs):
    return (emb[pairs[0]] - emb[pairs[1]]).sum()
timeit("two gathers fwd, unsorted", gathers, emb, pairs_unsorted)
timeit("two gathers fwd, sorted", gathers, emb, pairs_sorted)

@jax.jit
def gathers_grad(emb, pairs):
    return jax.grad(lambda e: ((e[pairs[0]] - e[pairs[1]]) ** 2).sum())(emb)
timeit("two gathers fwd+bwd (scatter-add), unsorted", gathers_grad, emb, pairs_unsorted)
timeit("two gathers fwd+bwd (scatter-add), sorted", gathers_grad, emb, pairs_sorted)

# 4: segment_sum alone
vals = jnp.asarray(rng.standard_normal(E), jnp.float32)
@jax.jit
def seg(vals, pairs):
    return jax.ops.segment_sum(vals, pairs[0], num_segments=N).sum()
timeit("segment_sum unsorted", seg, vals, pairs_unsorted)
timeit("segment_sum sorted (no hint)", seg, vals, pairs_sorted)

@jax.jit
def seg_hint(vals, pairs):
    return jax.ops.segment_sum(
        vals, pairs[0], num_segments=N, indices_are_sorted=True
    ).sum()
timeit("segment_sum sorted + hint", seg_hint, vals, pairs_sorted)

# 5: one-hot windowed gather (sorted p0, window 512 per 128-group) via matmul
W = 512
@jax.jit
def onehot_gather(emb, pairs):
    p = pairs[0]
    g = E // 128
    starts = jnp.clip(p.reshape(g, 128)[:, 0], 0, N - W)
    # windows (g, W, D) via dynamic_slice vmap — this is itself a gather of
    # rows, but contiguous W-row blocks (fast path?)
    win = jax.vmap(lambda s: jax.lax.dynamic_slice(emb, (s, 0), (W, D)))(starts)
    loc = p.reshape(g, 128) - starts[:, None]
    onehot = (loc[:, :, None] == jnp.arange(W)[None, None, :]).astype(emb.dtype)
    return jnp.einsum("gpw,gwd->gpd", onehot, win).sum()
timeit("one-hot windowed gather (W=512)", onehot_gather, emb, pairs_sorted)
print("done", flush=True)
