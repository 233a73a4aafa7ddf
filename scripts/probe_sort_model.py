"""Honest XLA TPU sort cost model (all sort outputs CONSUMED — the earlier
probe_variadic_sort.py numbers were DCE artifacts: only operand [1] was used,
so XLA dropped the other payload operands from the sort).

Sweeps: payload operand count, batch rows, n, key dtype, folded-vs-variadic.
"""
import sys

sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

rng = np.random.default_rng(0)


def fence(x):
    return float(jnp.asarray(x, jnp.float32).ravel()[0])


def timeit(tag, f, *args, iters=10):
    t0 = time.perf_counter()
    out = f(*args)
    jax.block_until_ready(out)
    fence(out if not isinstance(out, (tuple, list)) else out[0])
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    fence(out if not isinstance(out, (tuple, list)) else out[0])
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{tag:<64s} {dt:8.2f} ms (compile {tc:.0f}s)", flush=True)
    return dt


def make_sort(n_ops, rows, n, key_dtype):
    keys = jnp.asarray(rng.standard_normal((rows, n)), jnp.float32)
    if key_dtype == "u32":
        keys = jax.lax.bitcast_convert_type(keys, jnp.uint32)
    pls = [
        jnp.asarray(
            rng.integers(0, 2**31, (rows, n), dtype=np.int64).astype(np.uint32)
        )
        for _ in range(n_ops)
    ]

    @jax.jit
    def f(keys, *pls):
        out = jax.lax.sort([keys, *pls], dimension=-1, num_keys=1, is_stable=False)
        # consume EVERY output so nothing is DCE'd
        acc = out[0].astype(jnp.uint32) if key_dtype == "f32" else out[0]
        for o in out[1:]:
            acc = acc ^ o
        return acc.sum()

    return f, (keys, *pls)


print("== operand count sweep (rows=24, n=60000, f32 keys) ==", flush=True)
for k in (0, 1, 2, 4, 8, 15):
    f, a = make_sort(k, 24, 60000, "f32")
    timeit(f"ops={k}", f, *a)

print("== row sweep (15 payload ops, n=60000) ==", flush=True)
for rows in (24, 48, 96):
    f, a = make_sort(15, rows, 60000, "f32")
    timeit(f"rows={rows}", f, *a)

print("== n sweep (15 ops, rows=24) ==", flush=True)
for n in (15000, 30000, 120000):
    f, a = make_sort(15, 24, n, "f32")
    timeit(f"n={n}", f, *a)

print("== key dtype (15 ops, rows=24, n=60000) ==", flush=True)
f, a = make_sort(15, 24, 60000, "u32")
timeit("u32 keys", f, *a)

print("== folded equivalent: 2-op sort with rows*16 batch rows ==", flush=True)
# folded: keys duplicated per payload row -> (24*16, n) keys + 1 payload op
f, a = make_sort(1, 24 * 16, 60000, "f32")
timeit("folded-equiv rows=384 ops=1", f, *a)
print("done", flush=True)
