"""Windowed pair-op correctness + timing on TPU, and full InfoNCE with/without."""
import sys

sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from hept_tpu.data.batching import window_pad_pairs
from hept_tpu.ops.pair_ops import anchor_segment_sum, pair_gather
from hept_tpu.train.losses import infonce_loss

N, D = 60_000, 12
rng = np.random.default_rng(0)
# radius-graph-like pairs with gaps (some anchors pairless)
deg = rng.integers(0, 2, N) * rng.integers(4, 28, N)
p0 = np.repeat(np.arange(N), deg)
p1 = (p0 + rng.integers(-200, 200, p0.shape[0])) % N
pairs = np.stack([p0, p1]).astype(np.int32)
order = np.argsort(pairs[0], kind="stable")
pairs = pairs[:, order]
wp, wmask = window_pad_pairs(pairs)
E = wp.shape[1]
print(f"E raw {pairs.shape[1]} -> windowed {E} (overhead "
      f"{E/pairs.shape[1]-1:.1%})", flush=True)

emb = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
wp_j = jnp.asarray(wp)
wmask_j = jnp.asarray(wmask)
vals = jnp.asarray(np.where(wmask, rng.standard_normal(E), 0.0), jnp.float32)
vals12 = jnp.asarray(
    rng.standard_normal((E, D)) * wmask[:, None], jnp.float32)


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
    return out


# correctness
g = jax.jit(pair_gather)(emb, wp_j[0])
ref = np.take(np.asarray(emb), wp[0], axis=0)
print("gather ok:", np.array_equal(np.asarray(g), ref), flush=True)

s = jax.jit(lambda v, i: anchor_segment_sum(v, i, N))(vals, wp_j[0])
sref = np.zeros(N, np.float32)
np.add.at(sref, wp[0], np.asarray(vals))
print("segsum ok:", np.allclose(np.asarray(s), sref, rtol=1e-5, atol=1e-5), flush=True)

# scatter-add (gather bwd)
d_emb = jax.jit(
    lambda g_: jax.vjp(lambda e: pair_gather(e, wp_j[0]), emb)[1](g_)[0]
)(vals12)
dref = np.zeros((N, D), np.float32)
np.add.at(dref, wp[0], np.asarray(vals12))
print("scatter ok:", np.allclose(np.asarray(d_emb), dref, rtol=1e-4, atol=1e-4), flush=True)

# timings
timeit("pair_gather fwd", jax.jit(pair_gather), emb, wp_j[0])
timeit("pair_gather fwd+bwd", jax.jit(
    lambda e: jax.grad(lambda e: (pair_gather(e, wp_j[0]) ** 2).sum())(e)), emb)
timeit("anchor_segment_sum", jax.jit(
    lambda v: anchor_segment_sum(v, wp_j[0], N).sum()), vals)

# full loss with and without windowed ops
cluster_ids = jnp.asarray((np.arange(N) // 8).astype(np.int32))
recons = jnp.ones((N,), jnp.float32)
pts = jnp.asarray(rng.uniform(0.5, 3.0, N), jnp.float32)

for flag in (False, True):
    f = jax.jit(lambda e: jax.value_and_grad(
        lambda e: infonce_loss(e, wp_j, wmask_j, cluster_ids, recons, pts,
                               windowed_pairs=flag))(e))
    out = timeit(f"infonce fwd+bwd windowed={flag}", f, emb)
    print(f"   loss={float(out[0]):.5f}", flush=True)
print("done", flush=True)
