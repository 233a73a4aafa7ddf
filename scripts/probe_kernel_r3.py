"""Kernel grid-overhead probe: the cols bucket kernel runs 6.5 us/grid-step
regardless of buckets-per-step g (round-1: g=1 -> 6.4 us; round-2: g=8 ->
6.5 us), so fwd = 1824 steps = 11.9 ms is pure per-step overhead. Raise g
without the unrolled-temporaries VMEM blowup that capped g at 8:

  A. baseline: current production kernel (g=8, Python unroll)
  B. fori_loop over buckets (temporaries reused), dynamic sublane index
  C. batched dot_general over the g axis (one big MXU call per step)

All variants checked for numerical agreement with A.
"""
import sys

sys.path.insert(0, "/root/repo")
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from hept_tpu.ops.bucket_attn_pallas import bucket_rbf_attention_cols_pallas

DENOM_EPS = 1e-20
r, d, dv, bs, nb = 24, 30, 24, 100, 600
n = nb * bs
rng = np.random.default_rng(0)
sq = jnp.asarray(rng.standard_normal((r, d, n)) * 0.3, jnp.float32)
sk = jnp.asarray(rng.standard_normal((r, d, n)) * 0.3, jnp.float32)
sv = jnp.asarray(rng.standard_normal((r, dv, n)), jnp.float32)


def fence(x):
    return float(jnp.asarray(x, jnp.float32).ravel()[0])


def timeit(tag, f, *args, iters=20):
    # NB: through the tunnel backend block_until_ready returns early; a host
    # scalar read is the only reliable fence (BASELINE.md round-1 notes).
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
    return out


# ---- A. baseline
base = jax.jit(lambda a, b, c: bucket_rbf_attention_cols_pallas(a, b, c, block_size=bs))
out_a = timeit("A baseline g=8 unroll", base, sq, sk, sv)


# ---- B. fori_loop, dynamic sublane index
def _fwd_kernel_loop(q_ref, k_ref, v_ref, denom_ref, so_ref, *, g: int):
    ones_row = jnp.ones((1, bs), jnp.float32)

    def body(i, _):
        q = q_ref[0, :, i, :]
        k = k_ref[0, :, i, :]
        v = v_ref[0, :, i, :]
        q_sq = -0.5 * jnp.sum(q * q, axis=0)[None, :]
        k_sq = -0.5 * jnp.sum(k * k, axis=0)[None, :]
        qa = jnp.concatenate([q, q_sq, ones_row], axis=0)
        ka = jnp.concatenate([k, ones_row, k_sq], axis=0)
        logits_t = jax.lax.dot_general(
            ka, qa, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        pt = jnp.exp(jnp.minimum(logits_t, 0.0))
        denom_ref[0, 0, i, :] = jnp.sum(pt, axis=0) + DENOM_EPS
        so_ref[0, :, i, :] = jax.lax.dot_general(
            v, pt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        return 0

    jax.lax.fori_loop(0, g, body, 0)


def make_loop(g):
    grid = (r, nb // g)

    @jax.jit
    def f(sq, sk, sv):
        sq4 = sq.reshape(r, d, nb, bs)
        sk4 = sk.reshape(r, d, nb, bs)
        sv4 = sv.reshape(r, dv, nb, bs)
        denom, so = pl.pallas_call(
            functools.partial(_fwd_kernel_loop, g=g),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, d, g, bs), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d, g, bs), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, dv, g, bs), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, g, bs), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, dv, g, bs), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((r, 1, nb, bs), jnp.float32),
                jax.ShapeDtypeStruct((r, dv, nb, bs), jnp.float32),
            ],
        )(sq4, sk4, sv4)
        return denom.reshape(r, 1, n), so.reshape(r, dv, n)

    return f


# ---- C. batched dot_general over g
def _fwd_kernel_batched(q_ref, k_ref, v_ref, denom_ref, so_ref, *, g: int):
    q = q_ref[0]  # (d, g, bs)
    k = k_ref[0]
    v = v_ref[0]
    ones = jnp.ones((1, g, bs), jnp.float32)
    q_sq = -0.5 * jnp.sum(q * q, axis=0, keepdims=True)  # (1, g, bs)
    k_sq = -0.5 * jnp.sum(k * k, axis=0, keepdims=True)
    qa = jnp.concatenate([q, q_sq, ones], axis=0)  # (d+2, g, bs)
    ka = jnp.concatenate([k, ones, k_sq], axis=0)
    # batch over g (axis 1), contract d+2 (axis 0): (g, bsK, bsQ)
    logits_t = jax.lax.dot_general(
        ka, qa, (((0,), (0,)), ((1,), (1,))), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    pt = jnp.exp(jnp.minimum(logits_t, 0.0))
    denom_ref[0, 0] = jnp.sum(pt, axis=1) + DENOM_EPS  # (g, bsQ)
    # PV batched: v (dv, g, bsK) x pt (g, bsK, bsQ) -> (g, dv, bsQ)
    so = jax.lax.dot_general(
        v, pt, (((2,), (1,)), ((1,), (0,))), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    so_ref[0] = so  # (g, dv, bsQ) layout


def make_batched(g):
    grid = (r, nb // g)

    @jax.jit
    def f(sq, sk, sv):
        sq4 = sq.reshape(r, d, nb, bs)
        sk4 = sk.reshape(r, d, nb, bs)
        sv4 = sv.reshape(r, dv, nb, bs)
        denom, so = pl.pallas_call(
            functools.partial(_fwd_kernel_batched, g=g),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, d, g, bs), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d, g, bs), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, dv, g, bs), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, g, bs), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, g, dv, bs), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((r, 1, nb, bs), jnp.float32),
                jax.ShapeDtypeStruct((r, nb, dv, bs), jnp.float32),
            ],
        )(sq4, sk4, sv4)
        # NOTE: so comes back (r, nb, dv, bs) — transpose cost measured here
        so = jnp.swapaxes(so, 1, 2).reshape(r, dv, n)
        return denom.reshape(r, 1, n), so

    return f


for g in (24, 40):
    try:
        out_b = timeit(f"B fori_loop g={g}", make_loop(g), sq, sk, sv)
        ok = (np.allclose(np.asarray(out_b[0]), np.asarray(out_a[0]), rtol=1e-5, atol=1e-6)
              and np.allclose(np.asarray(out_b[1]), np.asarray(out_a[1]), rtol=1e-5, atol=1e-5))
        print(f"   B g={g} matches A: {ok}", flush=True)
    except Exception as e:
        print(f"   B g={g} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)

for g in (24, 40):
    try:
        out_c = timeit(f"C batched dot g={g} (incl output transpose)", make_batched(g), sq, sk, sv)
        ok = (np.allclose(np.asarray(out_c[0]), np.asarray(out_a[0]), rtol=1e-5, atol=1e-6)
              and np.allclose(np.asarray(out_c[1]), np.asarray(out_a[1]), rtol=1e-5, atol=1e-5))
        print(f"   C g={g} matches A: {ok}", flush=True)
    except Exception as e:
        print(f"   C g={g} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)

print("done", flush=True)
