"""Isolate the hybrid bucket-kernel FORWARD at tracking-60k shapes.

The step decomposition attributes ~6 ms/layer to the XLA-einsum forward
(hybrid mode) vs a ~2.2 ms byte roofline — candidates: f32 materialization
of logits and/or p (576 MB each round trip). Variants:
  f32    : f32 operands (parity kernels)
  bf16   : bf16 operands, f32 logits/p (the kernel_bf16 production path)
  bf16p  : bf16 operands AND p cast to bf16 right after exp (halves any
           p materialization; denominator still f32 accum over bf16 terms)
  pallas : per-bucket-loop Pallas forward (bf16)

Run: python scripts/probe_fwd_p.py
"""
import sys

sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from hept_tpu.ops.bucket_attn import DENOM_EPS

R, D, DV, N, BS = 24, 27, 24, 60_000, 100

rng = np.random.default_rng(0)
sq = jnp.asarray(rng.normal(size=(R, D, N)).astype(np.float32) * 0.3)
sk = jnp.asarray(rng.normal(size=(R, D, N)).astype(np.float32) * 0.3)
sv = jnp.asarray(rng.normal(size=(R, DV, N)).astype(np.float32))


def fwd_xla(sq, sk, sv, p_bf16=False):
    nb = N // BS
    bf16 = sq.dtype == jnp.bfloat16
    q = sq.reshape(R, D, nb, BS)
    k = sk.reshape(R, D, nb, BS)
    v = sv.reshape(R, DV, nb, BS)
    logits = jnp.einsum("rdgi,rdgj->rgij", q, k,
                        preferred_element_type=jnp.float32)
    qf = q.astype(jnp.float32) if bf16 else q
    kf = k.astype(jnp.float32) if bf16 else k
    q_sq = -0.5 * jnp.sum(qf * qf, axis=1)
    k_sq = -0.5 * jnp.sum(kf * kf, axis=1)
    logits = logits + q_sq[..., :, None] + k_sq[..., None, :]
    p = jnp.exp(jnp.minimum(logits, 0.0))
    if p_bf16:
        p = p.astype(jnp.bfloat16)
    denom = jnp.sum(p.astype(jnp.float32), axis=-1) + DENOM_EPS
    so = jnp.einsum("rdgj,rgij->rdgi", v, p.astype(sv.dtype) if bf16 else p,
                    preferred_element_type=jnp.float32)
    return denom.reshape(R, 1, N), so.reshape(R, DV, N)


def timeit(tag, fn, *args):
    f = jax.jit(fn)
    r = f(*args)
    jax.block_until_ready(r)
    float(r[0].sum())
    t0 = time.perf_counter()
    for _ in range(20):
        r = f(*args)
    float(r[0].sum())
    dt = (time.perf_counter() - t0) / 20 * 1e3
    print(f"{tag:<8s} {dt:6.2f} ms", flush=True)


b = jnp.bfloat16
timeit("f32", fwd_xla, sq, sk, sv)
timeit("bf16", fwd_xla, sq.astype(b), sk.astype(b), sv.astype(b))
timeit("bf16p", lambda a, c, d: fwd_xla(a, c, d, p_bf16=True),
       sq.astype(b), sk.astype(b), sv.astype(b))


def fwd_pallas(sq, sk, sv):
    from hept_tpu.ops.bucket_attn_pallas import _fwd_cols_impl

    return _fwd_cols_impl(sq, sk, sv, BS)


timeit("pallas", fwd_pallas, sq.astype(b), sk.astype(b), sv.astype(b))
