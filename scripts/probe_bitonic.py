"""Microbenchmark the building blocks of a VMEM-resident bitonic
multi-operand sort (the lax.sort replacement candidate):

  1. compare-exchange at SUBLANE strides (s >= 128): static reshapes + where
  2. compare-exchange at LANE strides (s < 128): pltpu.roll + lane masks
  3. a full 16-stage bitonic sort of one (n=65536, 17-operand) row,
     compile time + runtime

Layout: one grid step per batch row; row data as (ops, n/128, 128) in VMEM.
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
OPS = 8  # payload operands for the substage microbenches
ROWS = 24
REPS = 40  # substage repetitions inside the kernel to amortize DMA


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
keys_in = jnp.asarray(rng.standard_normal((ROWS, N)), jnp.float32)
pay_in = jnp.asarray(
    rng.integers(0, 2**31, (ROWS, OPS, N), dtype=np.int64).astype(np.uint32)
)


# ---------------- 1. sublane-stride substage ----------------
def _sublane_kernel(k_ref, p_ref, ko_ref, po_ref, *, stride, reps):
    # views: n = a * 2 * stride; stride = sr * 128
    sr = stride // 128
    k = k_ref[0].reshape(N // (2 * stride), 2, sr, 128)
    p = p_ref[0].reshape(OPS, N // (2 * stride), 2, sr, 128)
    for _ in range(reps):
        lo_k, hi_k = k[:, 0], k[:, 1]
        swap = lo_k > hi_k
        new_lo = jnp.where(swap, hi_k, lo_k)
        new_hi = jnp.where(swap, lo_k, hi_k)
        k = jnp.stack([new_lo, new_hi], axis=1)
        sw = swap[None]
        lo_p, hi_p = p[:, :, 0], p[:, :, 1]
        p = jnp.stack(
            [jnp.where(sw, hi_p, lo_p), jnp.where(sw, lo_p, hi_p)], axis=2
        )
    ko_ref[0] = k.reshape(N)
    po_ref[0] = p.reshape(OPS, N)


def make_sublane(stride):
    @jax.jit
    def f(keys, pay):
        return pl.pallas_call(
            functools.partial(_sublane_kernel, stride=stride, reps=REPS),
            grid=(ROWS,),
            in_specs=[
                pl.BlockSpec((1, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, OPS, N), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, OPS, N), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((ROWS, N), jnp.float32),
                jax.ShapeDtypeStruct((ROWS, OPS, N), jnp.uint32),
            ],
        )(keys, pay)

    return f


# ---------------- 2. lane-stride substage via roll ----------------
def _lane_kernel(k_ref, p_ref, ko_ref, po_ref, *, stride, reps):
    k = k_ref[0].reshape(N // 128, 128)
    p = p_ref[0].reshape(OPS, N // 128, 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, (N // 128, 128), 1)
    is_lo = (lane & stride) == 0  # lower partner of each pair
    for _ in range(reps):
        k_part = pltpu.roll(k, shift=stride, axis=1)  # brings partner over
        k_part2 = pltpu.roll(k, shift=128 - stride, axis=1)
        partner_k = jnp.where(is_lo, k_part2, k_part)
        keep = jnp.where(is_lo, k <= partner_k, k >= partner_k)
        k = jnp.where(keep, k, partner_k)
        for j in range(OPS):
            pj = p[j]
            pj_a = pltpu.roll(pj, shift=stride, axis=1)
            pj_b = pltpu.roll(pj, shift=128 - stride, axis=1)
            partner_p = jnp.where(is_lo, pj_b, pj_a)
            p = p.at[j].set(jnp.where(keep, pj, partner_p))
    ko_ref[0] = k.reshape(N)
    po_ref[0] = p.reshape(OPS, N)


def make_lane(stride):
    @jax.jit
    def f(keys, pay):
        return pl.pallas_call(
            functools.partial(_lane_kernel, stride=stride, reps=REPS),
            grid=(ROWS,),
            in_specs=[
                pl.BlockSpec((1, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, OPS, N), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, OPS, N), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((ROWS, N), jnp.float32),
                jax.ShapeDtypeStruct((ROWS, OPS, N), jnp.uint32),
            ],
        )(keys, pay)

    return f


for s in (128, 512, 4096):
    try:
        f = make_sublane(s)
        dt = None
        out = timeit(f"sublane substage stride={s} x{REPS} (OPS={OPS})", f, keys_in, pay_in)
    except Exception as e:
        print(f"sublane stride={s} FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)

for s in (1, 8, 64):
    try:
        f = make_lane(s)
        out = timeit(f"lane substage stride={s} x{REPS} (OPS={OPS})", f, keys_in, pay_in)
    except Exception as e:
        print(f"lane stride={s} FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)

print("done", flush=True)
