"""Bucket-kernel variants: find the fast fwd/bwd configuration on v5e.

Workload: r=24, d=30, dv=24, n=61440, bs=100 (the tracking-60k layer shape).
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

from hept_tpu.ops.bucket_attn import DENOM_EPS

r, d, dv, bs = 24, 30, 24, 100
nb = 616  # padded 61600 = 616*100; close to real 61440/100=614.4 -> 616
n = nb * bs
rng = np.random.default_rng(0)
sq = jnp.asarray(rng.standard_normal((r, d, nb, bs)) * 0.3, jnp.float32)
sk = jnp.asarray(rng.standard_normal((r, d, nb, bs)) * 0.3, jnp.float32)
sv = jnp.asarray(rng.standard_normal((r, dv, nb, bs)), jnp.float32)
gso = jnp.asarray(rng.standard_normal((r, dv, nb, bs)), jnp.float32)
gden = jnp.asarray(rng.standard_normal((r, 1, nb, bs)), jnp.float32)


def fence(x):
    return float(jnp.asarray(x, jnp.float32).ravel()[0])


def timeit(tag, f, *args, iters=20):
    try:
        out = f(*args)
        fence(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        fence(jax.tree_util.tree_leaves(out)[0])
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{tag:<44s} {dt:8.2f} ms", flush=True)
        return out
    except Exception as e:
        print(f"{tag:<44s} FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)
        return None


# ---------------- fwd variants
def fwd_kernel_unroll(q_ref, k_ref, v_ref, denom_ref, so_ref, *, g):
    for i in range(g):
        q = q_ref[0, :, i, :]
        k = k_ref[0, :, i, :]
        v = v_ref[0, :, i, :]
        qk = jax.lax.dot_general(q, k, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        q_sq = -0.5 * jnp.sum(q * q, axis=0)[:, None]
        k_sq = -0.5 * jnp.sum(k * k, axis=0)[None, :]
        p = jnp.exp(jnp.minimum(qk + q_sq + k_sq, 0.0))
        denom_ref[0, 0, i, :] = jnp.sum(p, axis=-1) + DENOM_EPS
        so_ref[0, :, i, :] = jax.lax.dot_general(
            v, p, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)


def make_fwd(g, vmem_mb=None, kernel_fn=fwd_kernel_unroll):
    kern = functools.partial(kernel_fn, g=g)
    cp = {}
    if vmem_mb:
        cp = dict(compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024))

    @jax.jit
    def f(sq, sk, sv):
        return pl.pallas_call(
            kern,
            grid=(r, nb // g),
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
            **cp,
        )(sq, sk, sv)
    return f


ref_out = None
for g in (8, 14, 28, 56):
    if nb % g:
        continue
    out = timeit(f"fwd unroll g={g}", make_fwd(g), sq, sk, sv)
    if out is not None and ref_out is None:
        ref_out = out
    elif out is not None:
        ok = np.allclose(np.asarray(out[1]), np.asarray(ref_out[1]), rtol=1e-5, atol=1e-5)
        print(f"   match={ok}")

out = timeit("fwd unroll g=8 vmem=100MB", make_fwd(8, vmem_mb=100), sq, sk, sv)
out = timeit("fwd unroll g=28 vmem=100MB", make_fwd(28, vmem_mb=100), sq, sk, sv)


# ---------------- bwd variants
def bwd_kernel_unroll(q_ref, k_ref, v_ref, gso_ref, gden_ref,
                      dq_ref, dk_ref, dv_ref, *, g):
    for i in range(g):
        q = q_ref[0, :, i, :]
        k = k_ref[0, :, i, :]
        v = v_ref[0, :, i, :]
        g_so = gso_ref[0, :, i, :]
        g_den = gden_ref[0, 0, i, :]
        qk = jax.lax.dot_general(q, k, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        q_sq = -0.5 * jnp.sum(q * q, axis=0)[:, None]
        k_sq = -0.5 * jnp.sum(k * k, axis=0)[None, :]
        logits = qk + q_sq + k_sq
        p = jnp.exp(jnp.minimum(logits, 0.0))
        gp = jax.lax.dot_general(g_so, v, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) + g_den[:, None]
        dl = jnp.where(logits < 0.0, p * gp, 0.0)
        row_sum = jnp.sum(dl, axis=1)[None, :]
        col_sum = jnp.sum(dl, axis=0)[None, :]
        dq_ref[0, :, i, :] = jax.lax.dot_general(
            k, dl, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32) - row_sum * q
        dk_ref[0, :, i, :] = jax.lax.dot_general(
            q, dl, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32) - col_sum * k
        dv_ref[0, :, i, :] = jax.lax.dot_general(
            g_so, p, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def make_bwd(g, vmem_mb=None):
    kern = functools.partial(bwd_kernel_unroll, g=g)
    cp = {}
    if vmem_mb:
        cp = dict(compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024))

    @jax.jit
    def f(sq, sk, sv, gso, gden):
        return pl.pallas_call(
            kern,
            grid=(r, nb // g),
            in_specs=[
                pl.BlockSpec((1, d, g, bs), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d, g, bs), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, dv, g, bs), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, dv, g, bs), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, g, bs), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, d, g, bs), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d, g, bs), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, dv, g, bs), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((r, d, nb, bs), jnp.float32),
                jax.ShapeDtypeStruct((r, d, nb, bs), jnp.float32),
                jax.ShapeDtypeStruct((r, dv, nb, bs), jnp.float32),
            ],
            **cp,
        )(sq, sk, sv, gso, gden)
    return f


bref = None
for g in (4, 8, 14):
    if nb % g:
        continue
    out = timeit(f"bwd mono g={g}", make_bwd(g), sq, sk, sv, gso, gden)
    if out is not None and bref is None:
        bref = out
out = timeit("bwd mono g=8 vmem=100MB", make_bwd(8, vmem_mb=100), sq, sk, sv, gso, gden)
out = timeit("bwd mono g=28 vmem=100MB", make_bwd(28, vmem_mb=100), sq, sk, sv, gso, gden)
if out is not None and bref is not None:
    ok = all(np.allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)
             for a, b in zip(out, bref))
    print(f"   bwd g=28 match={ok}")
print("done", flush=True)
