"""Probe: sort-call cost with head-shared bucketing.

Measures lax.sort at the hot shapes to size the head-shared-hash lever
before refactoring:
  A. current x-sort:   keys (24, 60k) broadcast + 17 payload ops (24, 60k)
  B. share_heads sort: keys (3, 60k) + 17 payload ops (3, 60k)
  C. current unsort:   keys (24, 60k) + 14 payload ops (24, 60k)
  D. folded unsort:    keys (3, 60k) + 101 payload ops (3, 60k)
     (all heads' [num|denom] ride one 3-row call)
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 60_000


def bench_sort(rows, n_ops, iters=20, tag=""):
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.random((rows, N), dtype=np.float32))
    ops = [keys] + [
        jnp.asarray(rng.integers(0, 2**32, (rows, N), dtype=np.uint32))
        for _ in range(n_ops)
    ]

    @jax.jit
    def f(*ops):
        out = jax.lax.sort(list(ops), dimension=-1, num_keys=1, is_stable=False)
        # consume every operand so nothing is DCE'd
        return sum(o[0, 0].astype(jnp.float32) if o.dtype == jnp.float32
                   else o[0, 0].astype(jnp.float32) for o in out[1:])

    print(f"{tag}: compiling...", flush=True)
    t0 = time.perf_counter()
    r = f(*ops)
    float(r)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*ops)
    float(r)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{tag}: rows={rows} ops={n_ops}: {dt:.2f} ms  (compile {compile_s:.1f}s)",
          flush=True)
    return dt


a = bench_sort(24, 17, tag="A current x-sort  ")
b = bench_sort(3, 17, tag="B shared x-sort   ")
c = bench_sort(24, 14, tag="C current unsort  ")
d = bench_sort(3, 101, tag="D folded unsort   ")
print(f"per-layer fwd sorts: current {a+c:.2f} ms -> shared {b+min(c,d):.2f} ms")
