"""Bucket-kernel round 2: eliminate A@B^T contractions (Mosaic materializes
VPU transposes of misaligned (100,100) tiles). All products recast as
jnp.dot-form ((1,),(0,)) or A^T B-form ((0,),(0,)); where a transpose is
unavoidable, do it on the MXU via identity matmul."""
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
nb = 616
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
        print(f"{tag:<44s} FAIL {type(e).__name__}: {str(e)[:140]}", flush=True)
        return None


# ---------- fwd V2: pT orientation, no B^T dots
def fwd_kernel_v2(q_ref, k_ref, v_ref, denom_ref, so_ref, *, g):
    for i in range(g):
        q = q_ref[0, :, i, :]
        k = k_ref[0, :, i, :]
        v = v_ref[0, :, i, :]
        pt_logits = jax.lax.dot_general(  # (Bk, Bq) = k^T q
            k, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        q_sq = -0.5 * jnp.sum(q * q, axis=0)[None, :]
        k_sq = -0.5 * jnp.sum(k * k, axis=0)[:, None]
        pt = jnp.exp(jnp.minimum(pt_logits + q_sq + k_sq, 0.0))  # (Bk, Bq)
        denom_ref[0, 0, i, :] = jnp.sum(pt, axis=0) + DENOM_EPS
        so_ref[0, :, i, :] = jax.lax.dot_general(  # v (dv,Bk) @ pt -> (dv,Bq)
            v, pt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def make_pallas(kern_fn, g, n_in, n_out, shapes_in, shapes_out):
    kern = functools.partial(kern_fn, g=g)

    @jax.jit
    def f(*args):
        return pl.pallas_call(
            kern,
            grid=(r, nb // g),
            in_specs=[
                pl.BlockSpec((1, s, g, bs), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM)
                for s in shapes_in
            ],
            out_specs=[
                pl.BlockSpec((1, s, g, bs), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM)
                for s in shapes_out
            ],
            out_shape=[
                jax.ShapeDtypeStruct((r, s, nb, bs), jnp.float32) for s in shapes_out
            ],
        )(*args)
    return f


fwd_v2 = make_pallas(fwd_kernel_v2, 8, 3, 2, (d, d, dv), (1, dv))
out_v2 = timeit("fwd v2 (no-transpose) g=8", fwd_v2, sq, sk, sv)
fwd_v2b = make_pallas(fwd_kernel_v2, 56, 3, 2, (d, d, dv), (1, dv))
timeit("fwd v2 g=56", fwd_v2b, sq, sk, sv)

# correctness vs current impl
from hept_tpu.ops.bucket_attn_pallas import bucket_rbf_attention_cols_pallas
@jax.jit
def cur(sq, sk, sv):
    return bucket_rbf_attention_cols_pallas(
        sq.reshape(r, d, n), sk.reshape(r, d, n), sv.reshape(r, dv, n), block_size=bs)
cur_out = timeit("fwd current", cur, sq, sk, sv)
if out_v2 is not None:
    ok1 = np.allclose(np.asarray(out_v2[0][:, 0]).reshape(r, n), np.asarray(cur_out[0]).reshape(r, n), rtol=1e-5, atol=1e-5)
    ok2 = np.allclose(np.asarray(out_v2[1]).reshape(r, dv, n), np.asarray(cur_out[1]), rtol=1e-4, atol=1e-4)
    print(f"   v2 match: denom={ok1} so={ok2}")


# ---------- bwd V2
def bwd_kernel_v2(q_ref, k_ref, v_ref, gso_ref, gden_ref,
                  dq_ref, dk_ref, dv_ref, *, g):
    eye = jnp.eye(bs, dtype=jnp.float32)
    for i in range(g):
        q = q_ref[0, :, i, :]
        k = k_ref[0, :, i, :]
        v = v_ref[0, :, i, :]
        g_so = gso_ref[0, :, i, :]
        g_den = gden_ref[0, 0, i, :]
        logits = jax.lax.dot_general(  # (Bq, Bk) = q^T k
            q, k, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        q_sq = -0.5 * jnp.sum(q * q, axis=0)[:, None]
        k_sq = -0.5 * jnp.sum(k * k, axis=0)[None, :]
        logits = logits + q_sq + k_sq
        p = jnp.exp(jnp.minimum(logits, 0.0))
        gp = jax.lax.dot_general(  # (Bq, Bk) = g_so^T v
            g_so, v, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) + g_den[:, None]
        dl = jnp.where(logits < 0.0, p * gp, 0.0)  # (Bq, Bk)
        dlt = jax.lax.dot_general(  # MXU transpose: dl^T = dl^T @ I
            dl, eye, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (Bk, Bq)
        row_sum = jnp.sum(dl, axis=1)[None, :]  # (1, Bq)
        col_sum = jnp.sum(dl, axis=0)[None, :]  # (1, Bk)
        dq_ref[0, :, i, :] = jax.lax.dot_general(  # k (d,Bk) @ dlt -> (d,Bq)
            k, dlt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) - row_sum * q
        dk_ref[0, :, i, :] = jax.lax.dot_general(  # q (d,Bq) @ dl -> (d,Bk)
            q, dl, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) - col_sum * k
        pt = jax.lax.dot_general(  # p^T via MXU
            p, eye, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dv_ref[0, :, i, :] = jax.lax.dot_general(  # g_so (dv,Bq) @ ... -> (dv,Bk)
            g_so, pt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)


bwd_v2 = make_pallas(bwd_kernel_v2, 8, 5, 3, (d, d, dv, dv, 1), (d, d, dv))
out_b2 = timeit("bwd v2 (MXU-transpose) g=8", bwd_v2, sq, sk, sv, gso, gden)
bwd_v2b = make_pallas(bwd_kernel_v2, 56, 5, 3, (d, d, dv, dv, 1), (d, d, dv))
timeit("bwd v2 g=56", bwd_v2b, sq, sk, sv, gso, gden)


# bwd current for reference + correctness
def bwd_kernel_cur(q_ref, k_ref, v_ref, gso_ref, gden_ref,
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


bwd_cur = make_pallas(bwd_kernel_cur, 8, 5, 3, (d, d, dv, dv, 1), (d, d, dv))
out_bc = timeit("bwd cur-math g=8 (1 B^T dot)", bwd_cur, sq, sk, sv, gso, gden)
if out_b2 is not None and out_bc is not None:
    oks = [np.allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)
           for a, b in zip(out_b2, out_bc)]
    print(f"   bwd v2 vs cur-math match: {oks}")
print("done", flush=True)
