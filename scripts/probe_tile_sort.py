"""Probe: in-VMEM 128-group sort (roll-compare ranks + lane gather) vs XLA.

If sorting every aligned 128-lane group of a (rows, n) tile — keys + W
payload rows — runs much faster per byte than lax.sort's full passes, a
Pallas merge sort (VMEM levels + streamed merge-path levels) is worth
building. This measures ONLY level 0.
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

R, W, N = 24, 16, 61440  # (c*h) rows, u32 payload rows each, points
rng = np.random.default_rng(0)
keys = jnp.asarray(rng.standard_normal((R, N)), jnp.float32)
payload = jnp.asarray(rng.integers(0, 2**31, (R, W, N)), jnp.int32)


def fence(x):
    return float(jnp.asarray(x, jnp.float32).ravel()[0])


def timeit(tag, f, *args, iters=20):
    try:
        out = f(*args)
        fence(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        fence(jax.tree_util.tree_leaves(out)[0])
        print(f"{tag:<46s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms", flush=True)
        return out
    except Exception as e:
        print(f"{tag:<46s} FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)
        return None


# ---- group-sort kernel: block (1, S, 128-lane groups as full N) won't fit;
# process (1, W+1, T) tiles with T lanes, groups of 128 within.
T = 7680  # lanes per grid step (60 groups)
S = 8  # process keys reshaped (S, T/S)? No: keep (1, T) rows.


def kernel(keys_ref, pay_ref, okeys_ref, opay_ref):
    k = keys_ref[0]  # (8, T) — 8 sublanes each holding independent lanes?
    # Layout: we reshape (N,) -> (N/128/8, 8, 128) outside: each (8, 128)
    # block = 8 independent 128-groups. Block here: (1, 8, T128) where
    # T128 = 128: one grid step per ... too many steps. Instead:
    # (G8, 8, 128) with G8 on the grid.
    pass


# Simpler formulation: view keys as (R * N/128/8, 8, 128): each kernel block
# is (BG, 8, 128) = BG*8 groups; ranks via 127 roll-compare passes on the
# lane axis (group-local by construction), apply via lane gather.
BG = 60  # (60, 8, 128) f32 = 245 KB per operand block


def sort_kernel(keys_ref, pay_ref, okeys_ref, opay_ref, *, w: int):
    k = keys_ref[:]  # (BG, 8, 128)
    rank = jnp.zeros(k.shape, jnp.int32)
    for s in range(1, 128):
        kr = pltpu.roll(k, s, 2)
        rank = rank + jnp.where(
            (k > kr) | ((k == kr) & (jax.lax.broadcasted_iota(jnp.int32, k.shape, 2)
                                     > pltpu.roll(jax.lax.broadcasted_iota(jnp.int32, k.shape, 2), s, 2))),
            1, 0,
        )
    # scatter via gather of the inverse: out[rank[i]] = k[i] equivalent to
    # building idx with idx[rank]=iota — instead gather with argsort... use
    # one-hot-free trick: position j wants the element whose rank == j:
    # idx[j] = sum_i i * [rank[i] == j] — another 127-roll pass; cheaper:
    # since rank is a permutation within each group, gather keys by
    # "inverse" computed via the same roll trick on rank.
    inv = jnp.zeros(k.shape, jnp.int32)
    iota = jax.lax.broadcasted_iota(jnp.int32, k.shape, 2)
    for s in range(0, 128):
        rr = pltpu.roll(rank, s, 2)
        src = pltpu.roll(iota, s, 2)
        inv = inv + jnp.where(rr == iota, src, 0)
    okeys_ref[:] = jnp.take_along_axis(k, inv, axis=2)
    for j in range(w):
        opay_ref[:, j] = jnp.take_along_axis(pay_ref[:, j], inv, axis=2)


NG = R * N // 128 // 8  # total (8,128) blocks
keys3 = keys.reshape(NG, 8, 128)
pay3 = payload.reshape(R, W, N // 1024, 8, 128).transpose(0, 2, 1, 3, 4).reshape(NG, W, 8, 128)


def group_sort(keys3, pay3):
    return pl.pallas_call(
        functools.partial(sort_kernel, w=W),
        grid=(NG // BG,),
        in_specs=[
            pl.BlockSpec((BG, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BG, W, 8, 128), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BG, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BG, W, 8, 128), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NG, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((NG, W, 8, 128), jnp.int32),
        ],
    )(keys3, pay3)


out = timeit("pallas 128-group sort (keys+16 rows)", jax.jit(group_sort), keys3, pay3)
if out is not None:
    ok = np.asarray(out[0])
    ref = np.sort(np.asarray(keys3), axis=2)
    print("   sorted ok:", np.allclose(ok, ref), flush=True)
    # payload follows keys
    o0 = np.asarray(out[1][0, 0, 0])
    order = np.argsort(np.asarray(keys3[0, 0]), kind="stable")
    print("   payload ok:", np.array_equal(o0, np.asarray(pay3[0, 0, 0])[order]), flush=True)


# XLA reference: full sort of the same data (17 passes) and a segmented
# 128-sort (what this kernel does) for a passes-comparison
@jax.jit
def xla_full(keys, payload):
    ops = [keys.reshape(R, N)] + [payload[:, j] for j in range(W)]
    return jax.lax.sort(ops, dimension=-1, num_keys=1, is_stable=False)[1]

timeit("XLA full-n sort (same bytes)", xla_full, keys, payload)

@jax.jit
def xla_128(keys3, pay3):
    ops = [keys3.reshape(-1, 128)] + [pay3[:, j].reshape(-1, 128) for j in range(W)]
    return jax.lax.sort(ops, dimension=-1, num_keys=1, is_stable=False)[1]

timeit("XLA 128-segment sort (same bytes)", xla_128, keys3, pay3)
print("done", flush=True)
