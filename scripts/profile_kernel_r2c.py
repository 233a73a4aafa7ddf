"""Isolate the bwd bucket-kernel 60ms mystery: outputs? exp? where? dots?"""
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

from hept_tpu.ops.bucket_attn import DENOM_EPS  # noqa: F401

r, d, dv, bs = 24, 30, 24, 100
nb = 616
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
        print(f"{tag:<52s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms", flush=True)
        return out
    except Exception as e:
        print(f"{tag:<52s} FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)
        return None


def make_pallas(kern, g, shapes_in, shapes_out):
    @jax.jit
    def f(*args):
        return pl.pallas_call(
            functools.partial(kern, g=g),
            grid=(r, nb // g),
            in_specs=[
                pl.BlockSpec((1, s, g, bs), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM)
                for s in shapes_in
            ],
            out_specs=[
                pl.BlockSpec((1, s, g, bs), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM)
                for s in shapes_out
            ],
            out_shape=[jax.ShapeDtypeStruct((r, s, nb, bs), jnp.float32) for s in shapes_out],
        )(*args)
    return f


def common_body(q, k, v, g_so, g_den, use_exp=True, use_where=True):
    logits = jax.lax.dot_general(q, k, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    q_sq = -0.5 * jnp.sum(q * q, axis=0)[:, None]
    k_sq = -0.5 * jnp.sum(k * k, axis=0)[None, :]
    logits = logits + q_sq + k_sq
    p = jnp.exp(jnp.minimum(logits, 0.0)) if use_exp else jnp.minimum(logits, 0.0)
    gp = jax.lax.dot_general(g_so, v, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) + g_den[:, None]
    if use_where:
        dl = jnp.where(logits < 0.0, p * gp, 0.0)
    else:
        dl = p * gp
    return logits, p, dl


# E2: single-output bwd (dq only)
def bwd_dq_only(q_ref, k_ref, v_ref, gso_ref, gden_ref, dq_ref, *, g):
    for i in range(g):
        q, k, v = q_ref[0, :, i, :], k_ref[0, :, i, :], v_ref[0, :, i, :]
        _, p, dl = common_body(q, k, v, gso_ref[0, :, i, :], gden_ref[0, 0, i, :])
        row_sum = jnp.sum(dl, axis=1)[None, :]
        dq_ref[0, :, i, :] = jax.lax.dot_general(
            k, dl, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) - row_sum * q

timeit("bwd dq-only g=8", make_pallas(bwd_dq_only, 8, (d, d, dv, dv, 1), (d,)),
       sq, sk, sv, gso, gden)

# E2b: dv only (needs p and g_so)
def bwd_dv_only(q_ref, k_ref, v_ref, gso_ref, gden_ref, dvo_ref, *, g):
    for i in range(g):
        q, k = q_ref[0, :, i, :], k_ref[0, :, i, :]
        logits = jax.lax.dot_general(q, k, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        q_sq = -0.5 * jnp.sum(q * q, axis=0)[:, None]
        k_sq = -0.5 * jnp.sum(k * k, axis=0)[None, :]
        p = jnp.exp(jnp.minimum(logits + q_sq + k_sq, 0.0))
        dvo_ref[0, :, i, :] = jax.lax.dot_general(
            gso_ref[0, :, i, :], p, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

timeit("bwd dv-only g=8", make_pallas(bwd_dv_only, 8, (d, d, dv, dv, 1), (dv,)),
       sq, sk, sv, gso, gden)

# E6: full bwd without exp
def bwd_noexp(q_ref, k_ref, v_ref, gso_ref, gden_ref, dq_ref, dk_ref, dv_ref, *, g):
    for i in range(g):
        q, k, v = q_ref[0, :, i, :], k_ref[0, :, i, :], v_ref[0, :, i, :]
        _, p, dl = common_body(q, k, v, gso_ref[0, :, i, :], gden_ref[0, 0, i, :],
                               use_exp=False)
        row_sum = jnp.sum(dl, axis=1)[None, :]
        col_sum = jnp.sum(dl, axis=0)[None, :]
        dq_ref[0, :, i, :] = jax.lax.dot_general(
            k, dl, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32) - row_sum * q
        dk_ref[0, :, i, :] = jax.lax.dot_general(
            q, dl, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32) - col_sum * k
        dv_ref[0, :, i, :] = jax.lax.dot_general(
            gso_ref[0, :, i, :], p, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

timeit("bwd full NO-exp g=8", make_pallas(bwd_noexp, 8, (d, d, dv, dv, 1), (d, d, dv)),
       sq, sk, sv, gso, gden)

# E7: full bwd without where-gate
def bwd_nowhere(q_ref, k_ref, v_ref, gso_ref, gden_ref, dq_ref, dk_ref, dv_ref, *, g):
    for i in range(g):
        q, k, v = q_ref[0, :, i, :], k_ref[0, :, i, :], v_ref[0, :, i, :]
        _, p, dl = common_body(q, k, v, gso_ref[0, :, i, :], gden_ref[0, 0, i, :],
                               use_where=False)
        row_sum = jnp.sum(dl, axis=1)[None, :]
        col_sum = jnp.sum(dl, axis=0)[None, :]
        dq_ref[0, :, i, :] = jax.lax.dot_general(
            k, dl, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32) - row_sum * q
        dk_ref[0, :, i, :] = jax.lax.dot_general(
            q, dl, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32) - col_sum * k
        dv_ref[0, :, i, :] = jax.lax.dot_general(
            gso_ref[0, :, i, :], p, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

timeit("bwd full NO-where g=8", make_pallas(bwd_nowhere, 8, (d, d, dv, dv, 1), (d, d, dv)),
       sq, sk, sv, gso, gden)

# E8: fwd with exp twice (cost of transcendentals)
def fwd_exp2(q_ref, k_ref, v_ref, denom_ref, so_ref, *, g):
    for i in range(g):
        q, k, v = q_ref[0, :, i, :], k_ref[0, :, i, :], v_ref[0, :, i, :]
        qk = jax.lax.dot_general(q, k, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        q_sq = -0.5 * jnp.sum(q * q, axis=0)[:, None]
        k_sq = -0.5 * jnp.sum(k * k, axis=0)[None, :]
        p = jnp.exp(jnp.minimum(qk + q_sq + k_sq, 0.0))
        p = p + jnp.exp(jnp.minimum(qk, -1.0))  # second exp
        denom_ref[0, 0, i, :] = jnp.sum(p, axis=0) + DENOM_EPS
        so_ref[0, :, i, :] = jax.lax.dot_general(
            v, p, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

timeit("fwd + second exp g=8", make_pallas(fwd_exp2, 8, (d, d, dv), (1, dv)),
       sq, sk, sv)

# E9: bwd math but with OUTPUT WRITES REDUCED to one column (write-bound test)
def bwd_tinywrite(q_ref, k_ref, v_ref, gso_ref, gden_ref, o_ref, *, g):
    for i in range(g):
        q, k, v = q_ref[0, :, i, :], k_ref[0, :, i, :], v_ref[0, :, i, :]
        _, p, dl = common_body(q, k, v, gso_ref[0, :, i, :], gden_ref[0, 0, i, :])
        row_sum = jnp.sum(dl, axis=1)[None, :]
        col_sum = jnp.sum(dl, axis=0)[None, :]
        dq = jax.lax.dot_general(
            k, dl, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32) - row_sum * q
        dk = jax.lax.dot_general(
            q, dl, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32) - col_sum * k
        dvv = jax.lax.dot_general(
            gso_ref[0, :, i, :], p, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0, 0, i, :] = dq.sum(axis=0) + dk.sum(axis=0) + dvv.sum(axis=0)

timeit("bwd full compute, tiny write g=8",
       make_pallas(bwd_tinywrite, 8, (d, d, dv, dv, 1), (1,)), sq, sk, sv, gso, gden)
print("done", flush=True)
