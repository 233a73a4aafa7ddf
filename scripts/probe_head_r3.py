"""Probe the encoder+head base cost (16.9 ms fwd+bwd, probe_residue_r3):
is it the OutMLP matmuls, the LayerNorm/tanh chain, or AD plumbing?"""
import sys

sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from hept_tpu.models.mlp import OutMLP, TorchLinear

N = 60_000


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
    print(f"{tag:<52s} {dt:8.2f} ms", flush=True)
    return dt


x = jax.random.normal(jax.random.PRNGKey(0), (N, 12), jnp.float32)
mlp = OutMLP(12)
v = mlp.init(jax.random.PRNGKey(1), x)


@jax.jit
def mlp_fwd(p, x):
    return mlp.apply(p, x)

timeit("OutMLP fwd (60k, 12->256x4->12)", mlp_fwd, v, x)


@jax.jit
def mlp_fb(p, x):
    def f(x):
        return (mlp.apply(p, x) ** 2).sum()
    return jax.value_and_grad(f)(x)

timeit("OutMLP fwd+bwd", mlp_fb, v, x)


# bf16 activations through the MLP (params f32)
@jax.jit
def mlp_fb_bf16(p, x):
    pb = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), p)

    def f(x):
        return (mlp.apply(pb, x.astype(jnp.bfloat16)).astype(jnp.float32) ** 2).sum()
    return jax.value_and_grad(f)(x)

timeit("OutMLP fwd+bwd bf16 activations", mlp_fb_bf16, v, x)


# plain matmul chain without LN/tanh for comparison
ws = [jax.random.normal(jax.random.PRNGKey(i), s, jnp.float32) * 0.05
      for i, s in enumerate([(12, 256), (256, 256), (256, 256), (256, 256), (256, 12)])]


@jax.jit
def chain_fb(ws, x):
    def f(x):
        h = x
        for w in ws:
            h = h @ w
        return (h ** 2).sum()
    return jax.value_and_grad(f)(x)

timeit("bare 5-matmul chain fwd+bwd", chain_fb, ws, x)
