"""Does XLA TPU sort speed depend on lane (128) / tile alignment of n?

The layer sort bundle measured 28.5 ms at n=60000 (not 128-aligned:
60000/128 = 468.75) vs 5.6 ms at n=61440 (= 480*128) in
probe_variadic_sort.py — same variadic grouped_sort_carry code.
Sweep n to find the alignment rule and the cheapest padded size.
"""
import sys

sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from hept_tpu.core.buckets import grouped_sort_carry

c, h = 3, 8
rng = np.random.default_rng(0)


def fence(x):
    return float(jnp.asarray(x, jnp.float32).ravel()[0])


def bundle(n, iters=10):
    kq = jnp.asarray(rng.standard_normal((c, h, n)), jnp.float32)
    kk = jnp.asarray(rng.standard_normal((c, h, n)), jnp.float32)
    xc = jnp.asarray(rng.standard_normal((30, n)), jnp.float32)
    od = jnp.asarray(rng.standard_normal((c, h, 25, n)), jnp.float32)
    perm = jnp.asarray(
        np.stack([np.stack([rng.permutation(n) for _ in range(h)])
                  for _ in range(c)]).astype(np.int32))

    @jax.jit
    def f(kq, kk, xc, od, perm):
        (sq, sk), _ = grouped_sort_carry([kq, kk], [xc, xc], pack=True, n_ops=8)
        (u,), _ = grouped_sort_carry([perm], [od], pack=True, n_ops=8)
        return sq.sum() + sk.sum() + u.sum()

    t0 = time.perf_counter()
    fence(f(kq, kk, xc, od, perm))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(kq, kk, xc, od, perm)
    fence(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"n={n:>7d}  (n/128={n/128:9.3f}, n/512={n/512:8.3f})  "
          f"{dt:8.2f} ms  (compile {tc:.0f}s)", flush=True)


for n in (60000, 60032, 60160, 60416, 60800, 61440, 62464, 64000, 65536):
    bundle(n)
print("done", flush=True)
