"""Pair-op superstep probe: batch G one-hot window dots into ONE
block-diagonal MXU dot.

The windowed pair gather/scatter (ops/pair_ops.py) runs 64 serial
(d,128)@(128,256) dots per grid step; at bench shapes that is ~16k serial
small MXU dots — the measured ~16 ms loss wall is their chained latency,
not FLOPs or bytes. A superstep concatenates G groups' 256-wide windows
into one (d, 256G) operand (VPU dynamic-slice copies) and builds one
(128G,) -> (256G,) one-hot with per-group column offsets, so the G dots
become ONE (d, 256G) @ (256G, 128G) dot: G x the (near-free) MXU FLOPs,
1/G the serial chain.

Run on TPU: python scripts/probe_pair_super.py
"""
import sys

sys.path.insert(0, "/root/repo")
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hept_tpu.ops.pair_ops import (
    GROUP,
    WIN,
    _gather_tpu,
    _scatter_add_tpu,
    _starts_from_idx,
)

D = 24
N = 60_000
E = 1_966_080  # ~2M pairs: 15360 groups of 128 (bench-like)

rng = np.random.default_rng(0)
# pack-time invariant (window_pad_pairs): pairs ANCHOR-SORTED, each 128-pair
# group's anchors span < 128 consecutive rows; window start =
# align_down(first anchor) so every anchor lies in [start, start + 256)
g_starts = np.sort(rng.integers(0, N - WIN, size=E // GROUP))
idx = np.sort(
    g_starts[:, None] + rng.integers(0, GROUP, size=(E // GROUP, GROUP)),
    axis=1,
).ravel()
idx = np.minimum(idx, N - 1).astype(np.int32)
emb = rng.standard_normal((D, N)).astype(np.float32)

idx_j = jnp.asarray(idx)
emb_j = jnp.asarray(emb)


def _gather_super_kernel(starts_ref, idx_ref, emb_ref, out_ref, cat_ref,
                         row_ref, *, t, d, sg):
    pid = pl.program_id(0)
    groups = t // GROUP
    supers = groups // sg
    iota_row = jax.lax.broadcasted_iota(jnp.int32, (sg * WIN, sg * GROUP), 0)
    for s in range(supers):
        base = pid * groups + s * sg
        # assemble sg windows into the (d, sg*WIN) scratch (static dests,
        # dynamic srcs — Mosaic-legal, unlike concat of dynamic slices)
        for j in range(sg):
            start = starts_ref[base + j]
            win = pl.ds(pl.multiple_of(start, GROUP), WIN)
            cat_ref[:, j * WIN:(j + 1) * WIN] = emb_ref[:, win]
            lo = (s * sg + j) * GROUP  # local offset inside this block
            row_ref[0, j * GROUP:(j + 1) * GROUP] = (
                idx_ref[0, pl.ds(lo, GROUP)] - start + j * WIN
            )
        onehot = (iota_row == row_ref[0][None, :]).astype(jnp.float32)
        out_ref[:, pl.ds(s * sg * GROUP, sg * GROUP)] = jax.lax.dot_general(
            cat_ref[:, :], onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )


def gather_super(emb_cols, idx, sg):
    d, n = emb_cols.shape
    e = idx.shape[0]
    t = 8192
    assert e % t == 0
    starts = _starts_from_idx(idx)
    n_pad = ((n + GROUP - 1) // GROUP) * GROUP + WIN
    emb_pad = jnp.pad(emb_cols, [(0, 0), (0, n_pad - n)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(e // t,),
        in_specs=[
            pl.BlockSpec((1, t), lambda i, s: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, n_pad), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d, t), lambda i, s: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((d, sg * WIN), jnp.float32),
            pltpu.VMEM((1, sg * GROUP), jnp.int32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_gather_super_kernel, t=t, d=d, sg=sg),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((d, e), jnp.float32),
    )(starts, idx.reshape(1, e), emb_pad)


def _fence(out):
    # host scalar read: block_until_ready returns early through the axon
    # tunnel (see bench.py) — a device_get of one element is the real fence
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))
    return out


def bench(fn, *args, iters=30, label=""):
    out = _fence(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _fence(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:36s} {dt:7.2f} ms", flush=True)
    return out


ref = jnp.take(emb_j, idx_j, axis=1)  # XLA gather reference (correctness)

g0 = bench(jax.jit(lambda e, i: _gather_tpu(e, i)), emb_j, idx_j,
           label="gather current (64 serial dots)")
print("   matches:", bool(jnp.allclose(g0, ref)), flush=True)
for sg in (2, 4, 8):
    try:
        g1 = bench(jax.jit(functools.partial(gather_super, sg=sg)),
                   emb_j, idx_j, label=f"gather superstep sg={sg}")
        print(f"   sg={sg} matches:", bool(jnp.allclose(g1, ref)), flush=True)
    except Exception as ex:
        print(f"   sg={sg} FAILED: {type(ex).__name__}: {str(ex)[:140]}",
              flush=True)

# scatter-add comparison (the VJP direction)
vals = jnp.asarray(rng.standard_normal((D, E)).astype(np.float32))
s0 = bench(jax.jit(lambda v, i: _scatter_add_tpu(v, i, N)), vals, idx_j,
           label="scatter current")
ref_s = jnp.zeros((D, N)).at[:, idx_j].add(vals)
print("   matches:", bool(jnp.allclose(s0[:, :N] if s0.shape[1] != N else s0,
                                       ref_s, atol=1e-3)), flush=True)
