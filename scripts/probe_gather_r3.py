"""Decide round-3's static-key architecture: how fast is an XLA TPU gather
(applying a KNOWN permutation) at the hot-path shapes, vs the lax.sort
carry's ~5 ms per-call floor (probe_sort_model.py)?

Shapes (share_heads stack, n=60k, c=3 hash rounds, h=8 heads, dv=24):
  x-gather:  (30, n) payload gathered into (3, 30, n) per-round sorted order
  od-gather: (3, 8, 25, n) gathered back by per-round inverse permutations
"""
import sys

sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 60_000
C, H, DV = 3, 8, 24
D_XC = 30


def fence(v):
    return float(jnp.asarray(v, jnp.float32).ravel()[0])


def timeit(tag, f, *args, iters=20):
    out = f(*args)
    fence(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    fence(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{tag:<56s} {dt:8.2f} ms", flush=True)
    return dt


rng = np.random.default_rng(0)
perms = np.stack([rng.permutation(N) for _ in range(C)]).astype(np.int32)
idx = jnp.asarray(perms)  # (C, N)
inv = jnp.asarray(np.argsort(perms, axis=1).astype(np.int32))

xc = jax.random.normal(jax.random.PRNGKey(0), (D_XC, N), jnp.float32)
xcb = xc.astype(jnp.bfloat16)
od = jax.random.normal(jax.random.PRNGKey(1), (C, H, DV + 1, N), jnp.float32)


@jax.jit
def xgather_take(xc, idx):
    # (D_XC, C*N) -> (C, D_XC, N)
    return jnp.take(xc, idx.reshape(-1), axis=1).reshape(
        xc.shape[0], C, N
    ).transpose(1, 0, 2)


@jax.jit
def xgather_tal(xc, idx):
    # broadcasted take_along_axis on the minor axis
    return jnp.take_along_axis(xc[None], idx[:, None, :], axis=2)


@jax.jit
def odgather(od, inv):
    return jnp.take_along_axis(od, inv[:, None, None, :], axis=3)


@jax.jit
def xgather_onehot_w(xc, idx):
    # windowed one-hot MXU formulation sanity check: NOT valid for a global
    # permutation (indices leave the window) — timing only, to compare the
    # MXU budget if a banded permutation were used.
    W = 512
    nb = N // W
    cols = xc.reshape(xc.shape[0], nb, W)
    local = (idx[:, :N] % W).reshape(C, nb, W)
    oh = jax.nn.one_hot(local, W, dtype=jnp.bfloat16)  # (C, nb, W, W)
    return jnp.einsum("dgw,cgvw->cdgv", cols.astype(jnp.bfloat16), oh,
                      preferred_element_type=jnp.float32)


timeit("x-gather take (30, n)->(3, 30, n) f32", xgather_take, xc, idx)
timeit("x-gather take_along_axis f32", xgather_tal, xc, idx)
timeit("x-gather take_along_axis bf16", xgather_tal, xcb, idx)
timeit("od-gather take_along_axis (3,8,25,n) f32", odgather, od, inv)
timeit("od-gather bf16", odgather, od.astype(jnp.bfloat16), inv)
timeit("x-gather windowed one-hot MXU (invalid, timing only)",
       xgather_onehot_w, xc, idx)

# reference point: the current sort-carry calls
from hept_tpu.core.buckets import grouped_sort_carry

key = jax.random.normal(jax.random.PRNGKey(2), (C, 1, N), jnp.float32)


@jax.jit
def sortcarry(key, xc):
    xcr = jnp.broadcast_to(xc[None, None], (1, 1) + xc.shape).reshape(
        1, 1, D_XC, N
    )
    (s,), (src,) = grouped_sort_carry(
        [key[:, :1]], [jnp.broadcast_to(xc[None], (C, D_XC, N)).reshape(C, 1, D_XC, N)],
        pack=True, n_ops=8, out_bf16=True,
    )
    return s, src


timeit("sort-carry x-sort (3 rows, pack) [current]", sortcarry, key, xc)
