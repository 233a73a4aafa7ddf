"""Microbenchmark the building blocks of a VMEM-resident bitonic
multi-operand sort (the lax.sort replacement candidate):

  1. compare-exchange at SUBLANE strides (s >= 128): static reshapes + where
  2. compare-exchange at LANE strides (s < 128): pltpu.roll + lane masks

Layout: one grid step per batch row; row data as (n/128, 128) per operand in
VMEM; all in-kernel arrays rank <= 4 (5-D views crash Mosaic).
Workload reference: call1 of a layer's sorts = 24 rows x 16 payload ops +
keys, n->65536: XLA lax.sort costs 9.75 ms (probe_sort_model.py).
"""
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

N = 65536
R = N // 128  # sublane rows per operand
OPS = 8
ROWS = 24
REPS = 40


def fence(x):
    return float(jnp.asarray(x, jnp.float32).ravel()[0])


def timeit(tag, f, *args, iters=10):
    t0 = time.perf_counter()
    out = f(*args)
    fence(jax.tree_util.tree_leaves(out)[0])
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    fence(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{tag:<56s} {dt:8.3f} ms (compile {tc:.0f}s)", flush=True)
    return out


rng = np.random.default_rng(0)
keys_in = jnp.asarray(rng.standard_normal((ROWS, R, 128)), jnp.float32)
pay_in = jnp.asarray(
    rng.integers(0, 2**31, (ROWS, OPS, R, 128), dtype=np.int64).astype(np.uint32)
)

SPECS = dict(
    in_specs=[
        pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, OPS, R, 128), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
    ],
    out_specs=[
        pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, OPS, R, 128), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
    ],
    out_shape=[
        jax.ShapeDtypeStruct((ROWS, R, 128), jnp.float32),
        jax.ShapeDtypeStruct((ROWS, OPS, R, 128), jnp.uint32),
    ],
)


# ---------------- 1. sublane-stride substage ----------------
def _sublane_kernel(k_ref, p_ref, ko_ref, po_ref, *, stride, reps):
    sr = stride // 128
    a = N // (2 * stride)

    def pair(x):  # (R, 128) -> lo, hi of shape (a, sr, 128)
        v = x.reshape(a, 2 * sr, 128)
        return v[:, :sr], v[:, sr:]

    def unpair(lo, hi):
        return jnp.concatenate([lo, hi], axis=1).reshape(R, 128)

    k = k_ref[0]
    ps = [p_ref[0, j] for j in range(OPS)]
    for _ in range(reps):
        lo_k, hi_k = pair(k)
        swap = lo_k > hi_k
        k = unpair(jnp.where(swap, hi_k, lo_k), jnp.where(swap, lo_k, hi_k))
        for j in range(OPS):
            lo_p, hi_p = pair(ps[j])
            ps[j] = unpair(
                jnp.where(swap, hi_p, lo_p), jnp.where(swap, lo_p, hi_p)
            )
    ko_ref[0] = k
    for j in range(OPS):
        po_ref[0, j] = ps[j]


def make_sublane(stride):
    @jax.jit
    def f(keys, pay):
        return pl.pallas_call(
            functools.partial(_sublane_kernel, stride=stride, reps=REPS),
            grid=(ROWS,), **SPECS,
        )(keys, pay)

    return f


# ---------------- 2. lane-stride substage via roll ----------------
def _lane_kernel(k_ref, p_ref, ko_ref, po_ref, *, stride, reps):
    k = k_ref[0]
    ps = [p_ref[0, j] for j in range(OPS)]
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
    is_lo = (lane & stride) == 0
    for _ in range(reps):
        k_hi = pltpu.roll(k, shift=128 - stride, axis=1)  # x[l+s] at l
        k_lo = pltpu.roll(k, shift=stride, axis=1)  # x[l-s] at l
        partner_k = jnp.where(is_lo, k_hi, k_lo)
        keep = jnp.where(is_lo, k <= partner_k, k >= partner_k)
        k = jnp.where(keep, k, partner_k)
        for j in range(OPS):
            pj = ps[j]
            pj_hi = pltpu.roll(pj, shift=128 - stride, axis=1)
            pj_lo = pltpu.roll(pj, shift=stride, axis=1)
            ps[j] = jnp.where(keep, pj, jnp.where(is_lo, pj_hi, pj_lo))
    ko_ref[0] = k
    for j in range(OPS):
        po_ref[0, j] = ps[j]


def make_lane(stride):
    @jax.jit
    def f(keys, pay):
        return pl.pallas_call(
            functools.partial(_lane_kernel, stride=stride, reps=REPS),
            grid=(ROWS,), **SPECS,
        )(keys, pay)

    return f


for s in (128, 512, 4096):
    try:
        f = make_sublane(s)
        timeit("sublane substage stride=%d x%d full (keys+payload)" % (s, REPS), f, keys_in, pay_in)
    except Exception as e:
        print(f"sublane stride={s} FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)

for s in (1, 8, 64):
    try:
        f = make_lane(s)
        timeit("lane substage stride=%d x%d full (keys+payload)" % (s, REPS), f, keys_in, pay_in)
    except Exception as e:
        print(f"lane stride={s} FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)

print("done", flush=True)
