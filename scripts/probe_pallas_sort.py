"""Validate + time the Pallas bitonic multi-operand sort vs lax.sort at the
grouped_sort_carry hot shapes (call1: 24 rows x 16 ops, call2: 24 x 14)."""
import sys

sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from hept_tpu.ops.sort_pallas import bitonic_sort_rows


def fence(x):
    return float(jnp.asarray(x, jnp.float32).ravel()[0])


def timeit(tag, f, *a, iters=10):
    t0 = time.perf_counter()
    out = f(*a)
    fence(jax.tree_util.tree_leaves(out)[0])
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a)
    fence(jax.tree_util.tree_leaves(out)[0])
    print(f"{tag:<52s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms "
          f"(compile {tc:.0f}s)", flush=True)
    return out


rng = np.random.default_rng(0)


def make(rows, n, ops, with_ties=True):
    keys = rng.standard_normal((rows, n)).astype(np.float32)
    if with_ties:  # pad-like +BIG tails and interior duplicates
        keys[:, -n // 10:] = 3.0e38
        keys[:, : n // 20] = np.round(keys[:, : n // 20], 1)
    pays = [
        rng.integers(0, 2**31, (rows, n), dtype=np.int64).astype(np.uint32)
        for _ in range(ops - 1)
    ]
    iota = np.broadcast_to(np.arange(n, dtype=np.uint32), (rows, n)).copy()
    return jnp.asarray(keys), [jnp.asarray(p) for p in pays] + [jnp.asarray(iota)]


for rows, n, ops in ((24, 60000, 16), (24, 60000, 14)):
    keys, pays = make(rows, n, ops)

    pal = jax.jit(lambda k, *p: bitonic_sort_rows(k, list(p)))
    ref = jax.jit(
        lambda k, *p: jax.lax.sort([k, p[-1], *p[:-1]], dimension=-1,
                                   num_keys=2, is_stable=False)[1:]
    )

    try:
        out_p = timeit(f"pallas bitonic rows={rows} n={n} ops={ops}", pal, keys, *pays)
        out_r = timeit(f"lax.sort (2-key)  rows={rows} n={n} ops={ops}", ref, keys, *pays)
        # ref returns [iota_sorted, pay0..], pallas returns [pay0.., iota]
        ok = np.array_equal(np.asarray(out_p[-1]), np.asarray(out_r[0]))
        for j in range(ops - 1):
            ok &= np.array_equal(np.asarray(out_p[j]), np.asarray(out_r[1 + j]))
        print(f"   exact match vs lax.sort(num_keys=2): {ok}", flush=True)
    except Exception as e:
        print(f"FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

print("done", flush=True)
