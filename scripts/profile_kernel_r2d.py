"""Bisect dv-only (7ms) -> dq-only (59ms), and test the augmented-operand
transpose-free bwd formulation (q_sq/k_sq/g_den folded into MXU dots)."""
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
        print(f"{tag:<56s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms", flush=True)
        return out
    except Exception as e:
        print(f"{tag:<56s} FAIL {type(e).__name__}: {str(e)[:100]}", flush=True)
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


def base_p(q, k):
    logits = jax.lax.dot_general(q, k, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    q_sq = -0.5 * jnp.sum(q * q, axis=0)[:, None]
    k_sq = -0.5 * jnp.sum(k * k, axis=0)[None, :]
    logits = logits + q_sq + k_sq
    return logits, jnp.exp(jnp.minimum(logits, 0.0))


# D1: dv-only + gp dot (0,0) kept alive
def d1(q_ref, k_ref, v_ref, gso_ref, gden_ref, o_ref, *, g):
    for i in range(g):
        q, k, v = q_ref[0, :, i, :], k_ref[0, :, i, :], v_ref[0, :, i, :]
        g_so = gso_ref[0, :, i, :]
        _, p = base_p(q, k)
        gp = jax.lax.dot_general(g_so, v, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        o_ref[0, :, i, :] = jax.lax.dot_general(
            g_so, p + gp, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

timeit("D1 dv-only + gp dot", make_pallas(d1, 8, (d, d, dv, dv, 1), (dv,)),
       sq, sk, sv, gso, gden)


# D2: D1 + g_den[:, None] broadcast into gp
def d2(q_ref, k_ref, v_ref, gso_ref, gden_ref, o_ref, *, g):
    for i in range(g):
        q, k, v = q_ref[0, :, i, :], k_ref[0, :, i, :], v_ref[0, :, i, :]
        g_so = gso_ref[0, :, i, :]
        g_den = gden_ref[0, 0, i, :]
        _, p = base_p(q, k)
        gp = jax.lax.dot_general(g_so, v, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) + g_den[:, None]
        o_ref[0, :, i, :] = jax.lax.dot_general(
            g_so, p + gp, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

timeit("D2 + g_den[:,None]", make_pallas(d2, 8, (d, d, dv, dv, 1), (dv,)),
       sq, sk, sv, gso, gden)


# D3: D2 + dl=p*gp, output dot(g_so, dl)
def d3(q_ref, k_ref, v_ref, gso_ref, gden_ref, o_ref, *, g):
    for i in range(g):
        q, k, v = q_ref[0, :, i, :], k_ref[0, :, i, :], v_ref[0, :, i, :]
        g_so = gso_ref[0, :, i, :]
        g_den = gden_ref[0, 0, i, :]
        logits, p = base_p(q, k)
        gp = jax.lax.dot_general(g_so, v, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) + g_den[:, None]
        dl = jnp.where(logits < 0.0, p * gp, 0.0)
        o_ref[0, :, i, :] = jax.lax.dot_general(
            g_so, dl, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

timeit("D3 + dl where-mul", make_pallas(d3, 8, (d, d, dv, dv, 1), (dv,)),
       sq, sk, sv, gso, gden)


# D4: D3 but output via B^T dot: dq = dot(k, dl, (1,1))
def d4(q_ref, k_ref, v_ref, gso_ref, gden_ref, o_ref, *, g):
    for i in range(g):
        q, k, v = q_ref[0, :, i, :], k_ref[0, :, i, :], v_ref[0, :, i, :]
        g_so = gso_ref[0, :, i, :]
        g_den = gden_ref[0, 0, i, :]
        logits, p = base_p(q, k)
        gp = jax.lax.dot_general(g_so, v, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) + g_den[:, None]
        dl = jnp.where(logits < 0.0, p * gp, 0.0)
        o_ref[0, :, i, :] = jax.lax.dot_general(
            k, dl, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

timeit("D4 = D3 with B^T output dot", make_pallas(d4, 8, (d, d, dv, dv, 1), (d,)),
       sq, sk, sv, gso, gden)


# V3: augmented-operand transpose-free full bwd (pT orientation)
def v3(q_ref, k_ref, v_ref, gso_ref, gden_ref, dq_ref, dk_ref, dv_ref, *, g):
    ones_row = jnp.ones((1, bs), jnp.float32)
    for i in range(g):
        q, k, v = q_ref[0, :, i, :], k_ref[0, :, i, :], v_ref[0, :, i, :]
        g_so = gso_ref[0, :, i, :]
        g_den = gden_ref[0:1, 0, i, :]  # (1, Bq) lane row
        q_sq = -0.5 * jnp.sum(q * q, axis=0)[None, :]  # (1, Bq) lanes
        k_sq = -0.5 * jnp.sum(k * k, axis=0)[None, :]  # (1, Bk) lanes
        qa = jnp.concatenate([q, q_sq, ones_row], axis=0)  # (d+2, Bq)
        ka = jnp.concatenate([k, ones_row, k_sq], axis=0)  # (d+2, Bk)
        logits_t = jax.lax.dot_general(  # (Bk, Bq) = ka^T qa
            ka, qa, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        pt = jnp.exp(jnp.minimum(logits_t, 0.0))
        va = jnp.concatenate([v, ones_row], axis=0)  # (dv+1, Bk)
        ga = jnp.concatenate([g_so, g_den], axis=0)  # (dv+1, Bq)
        gpt = jax.lax.dot_general(  # (Bk, Bq) = va^T ga
            va, ga, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dlt = jnp.where(logits_t < 0.0, pt * gpt, 0.0)  # (Bk, Bq)
        row_sum = jnp.sum(dlt, axis=0)[None, :]  # (1, Bq) lanes, no transpose
        dq_ref[0, :, i, :] = jax.lax.dot_general(  # k (d,Bk) @ dlt -> (d,Bq)
            k, dlt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) - row_sum * q
        col_sum = jax.lax.dot_general(  # (1, Bk): MXU row-of-ones reduction
            ones_row, dlt, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        dk_ref[0, :, i, :] = jax.lax.dot_general(  # q (d,Bq) x dlt (Bk,Bq) -> (d,Bk)
            q, dlt, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) - col_sum * k
        dv_ref[0, :, i, :] = jax.lax.dot_general(  # g_so (dv,Bq) x pt (Bk,Bq) -> (dv,Bk)
            g_so, pt, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

out_v3 = timeit("V3 augmented transpose-free full bwd",
                make_pallas(v3, 8, (d, d, dv, dv, 1), (d, d, dv)),
                sq, sk, sv, gso, gden)

# correctness vs reference math in plain XLA
def xla_bwd(sq, sk, sv, gso, gden):
    q = sq.transpose(0, 2, 3, 1)  # (r, nb, bs, d)
    k = sk.transpose(0, 2, 3, 1)
    v = sv.transpose(0, 2, 3, 1)
    g_so = gso.transpose(0, 2, 3, 1)
    g_den = gden[:, 0].transpose(0, 1, 2)  # (r, nb, bs)
    logits = jnp.einsum("rgid,rgjd->rgij", q, k)
    logits += -0.5 * jnp.sum(q * q, -1)[..., :, None] - 0.5 * jnp.sum(k * k, -1)[..., None, :]
    p = jnp.exp(jnp.minimum(logits, 0.0))
    gp = jnp.einsum("rgid,rgjd->rgij", g_so, v) + g_den[..., :, None]
    dl = jnp.where(logits < 0.0, p * gp, 0.0)
    dq = jnp.einsum("rgij,rgjd->rgid", dl, k) - jnp.sum(dl, -1, keepdims=True) * q
    dk = jnp.einsum("rgij,rgid->rgjd", dl, q) - jnp.sum(dl, -2)[..., None] * k
    dvv = jnp.einsum("rgij,rgid->rgjd", p, g_so)
    t = lambda x: x.transpose(0, 3, 1, 2)
    return t(dq), t(dk), t(dvv)

if out_v3 is not None:
    ref = jax.jit(xla_bwd)(sq, sk, sv, gso, gden)
    oks = [np.allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)
           for a, b in zip(out_v3, ref)]
    print(f"   V3 vs XLA reference: {oks}")
print("done", flush=True)
