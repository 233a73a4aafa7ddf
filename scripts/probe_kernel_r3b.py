"""Pallas bucket kernel vs XLA einsum path at tracking-60k shapes.

The Pallas kernel's 10-12 ms fwd is per-bucket serial MXU latency (14400
buckets x ~0.7 us chains); fori_loop/batched-dot reformulations don't help
(probe_kernel_r3.py). The XLA cols einsum path runs the same math as big
BATCHED matmuls (XLA pads 100->128 tiles) at ~576 MB of materialized p
traffic — possibly cheaper. Also: bwd via recompute.
"""
import sys

sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from hept_tpu.ops.bucket_attn import bucket_rbf_attention_cols_xla
from hept_tpu.ops.bucket_attn_pallas import bucket_rbf_attention_cols_pallas

r, d, dv, bs, nb = 24, 30, 24, 100, 600
n = nb * bs
rng = np.random.default_rng(0)
sq = jnp.asarray(rng.standard_normal((r, d, n)) * 0.3, jnp.float32)
sk = jnp.asarray(rng.standard_normal((r, d, n)) * 0.3, jnp.float32)
sv = jnp.asarray(rng.standard_normal((r, dv, n)), jnp.float32)


def fence(x):
    return float(jnp.asarray(x, jnp.float32).ravel()[0])


def timeit(tag, f, *args, iters=20):
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


pallas_f = jax.jit(lambda a, b, c: bucket_rbf_attention_cols_pallas(a, b, c, block_size=bs))
xla_f = jax.jit(lambda a, b, c: bucket_rbf_attention_cols_xla(a, b, c, bs))

out_p = timeit("pallas fwd", pallas_f, sq, sk, sv)
out_x = timeit("xla einsum fwd", xla_f, sq, sk, sv)
ok = np.allclose(np.asarray(out_p[1]), np.asarray(out_x[1]), rtol=1e-4, atol=1e-4)
print(f"   fwd outputs match: {ok}", flush=True)


@jax.jit
def pallas_fb(sq, sk, sv):
    def f(sq, sk, sv):
        dn, so = bucket_rbf_attention_cols_pallas(sq, sk, sv, block_size=bs)
        return so.sum() + dn.sum()
    return jax.value_and_grad(f, argnums=(0, 1, 2))(sq, sk, sv)


@jax.jit
def xla_fb(sq, sk, sv):
    def f(sq, sk, sv):
        dn, so = bucket_rbf_attention_cols_xla(sq, sk, sv, bs)
        return so.sum() + dn.sum()
    return jax.value_and_grad(f, argnums=(0, 1, 2))(sq, sk, sv)


@jax.jit
def xla_fb_remat(sq, sk, sv):
    core = jax.checkpoint(lambda a, b, c: bucket_rbf_attention_cols_xla(a, b, c, bs))

    def f(sq, sk, sv):
        dn, so = core(sq, sk, sv)
        return so.sum() + dn.sum()
    return jax.value_and_grad(f, argnums=(0, 1, 2))(sq, sk, sv)


gp = timeit("pallas fwd+bwd", pallas_fb, sq, sk, sv)
gx = timeit("xla einsum fwd+bwd", xla_fb, sq, sk, sv)
gxr = timeit("xla einsum fwd+bwd (remat)", xla_fb_remat, sq, sk, sv)
ok = all(
    np.allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3)
    for a, b in zip(gp[1], gx[1])
)
print(f"   grads match: {ok}", flush=True)
print("done", flush=True)
