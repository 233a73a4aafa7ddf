import sys

sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp

from hept_tpu.ops.bucket_attn import hept_attention_core

N, H, C, BS = 60_000, 8, 3, 100
D, DV = 30, 24

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 8)
q = jax.random.normal(ks[0], (H, N, D))
k = jax.random.normal(ks[1], (H, N, D))
v = jax.random.normal(ks[2], (H, N, DV))
alpha = jax.random.normal(ks[3], (H, D, C))
codes = jax.random.randint(ks[4], (C, H, N), 0, 200).astype(jnp.float32)


@jax.jit
def core_s(s):
    # scale inputs by s so every iteration computes on fresh values
    return hept_attention_core(q * s, k * s, v * s, alpha, codes, block_size=BS, impl="xla")


@jax.jit
def sort_s(s):
    return jnp.argsort(codes * s, axis=-1)


@jax.jit
def chain_core(x0, iters=10):
    def body(x, _):
        out = hept_attention_core(q + x.mean(), k, v, alpha, codes, block_size=BS, impl="xla")
        return out, ()

    out, _ = jax.lax.scan(body, x0, None, length=iters)
    return out


def timeit(fn, arg, iters=20):
    out = fn(arg)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(arg + i * 1e-6 if hasattr(arg, "dtype") else arg)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


s = jnp.float32(1.0)
print("core (fresh inputs):", timeit(core_s, s), flush=True)
print("argsort (fresh):", timeit(sort_s, s), flush=True)

x0 = jnp.zeros((H, N, DV))
out = chain_core(x0)
jax.block_until_ready(out)
t0 = time.perf_counter()
out = chain_core(x0 + 1.0)
jax.block_until_ready(out)
print("core via 10x scan chain:", (time.perf_counter() - t0) / 10 * 1e3, flush=True)
