"""Time the row-gather transport candidates at the shipped arms' shapes.

Per-row transport floor (probe_unsort_r4): XLA gathers move ~70 M rows/s
regardless of row width (400 B rows -> ~30 GB/s; 48 B column rows ->
~2.5 GB/s).  Candidates timed here, per round-triple at the acc arm's
(3, 60032, 100 u32) unsort shape:

  A. xla100   — the shipped flat row gather (100 u32 rows, 400 B).
  B. xla128   — same gather on 128-lane padded rows (512 B aligned):
                tests whether HBM-transaction alignment, not row count,
                sets the floor (costs +28%% bytes).
  C. dma1024  — Pallas per-row pipelined DMA kernel (row_gather_dma),
                t_tile=1024: measures the raw DMA descriptor issue rate.
  D. dma4096  — same with t_tile=4096 (fewer grid steps).

(The in-VMEM vector-gather candidate is a compile-time NEGATIVE on this
toolchain — sublane dynamic_gather is limited to one vreg tile; see
ops/gather_pallas.py.)

Run on TPU: python scripts/probe_gather_pallas.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from hept_tpu.ops.gather_pallas import row_gather_dma

S, R, N, W = 3, 3, 60032, 100
BYTES = R * N * (W * 4)  # payload bytes per direction (unpadded)


def fence(x):
    return float(jnp.asarray(x, jnp.float32).ravel()[0])


def timeit(tag, f, *args, iters=10):
    r = f(*args)
    jax.block_until_ready(r)
    fence(r)
    for _ in range(2):
        r = f(*args)
    fence(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    fence(r)
    dt = (time.perf_counter() - t0) / iters * 1e3
    gbs = 2 * BYTES / (dt / 1e3) / 1e9
    print(f"{tag:<34s} {dt:8.3f} ms   ({gbs:6.1f} GB/s payload r+w, "
          f"{R * N / dt / 1e3:6.1f} M rows/s)", flush=True)
    return dt


rng = np.random.default_rng(0)
src100 = jnp.asarray(
    rng.integers(0, 2**32, size=(S, N, W), dtype=np.uint32))
src128 = jnp.pad(src100, ((0, 0), (0, 0), (0, 128 - W)))
perms = np.stack([rng.permutation(N) for _ in range(R)]).astype(np.int32)
idx = jnp.asarray(perms)

# correctness spot-check for the DMA kernel on hardware first
small_src = src100[:, :4096]
small_idx = jnp.asarray(
    np.stack([rng.permutation(4096) for _ in range(R)]).astype(np.int32))
got = np.asarray(row_gather_dma(small_src, small_idx, t_tile=512))
want = np.zeros_like(got)
for r in range(R):
    want[r, :, :W] = np.asarray(small_src)[r % S, np.asarray(small_idx)[r]]
ok = np.array_equal(got, want)
print(f"dma kernel hardware correctness (4096 rows): "
      f"{'OK' if ok else 'MISMATCH'}", flush=True)
if not ok:
    bad = np.argwhere((got != want).any(axis=-1))
    print("first mismatches (r, p):", bad[:8].tolist(), flush=True)


def xla_gather(src, idxj):
    flat = src.reshape(-1, src.shape[-1])
    offs = ((jnp.arange(R, dtype=idxj.dtype) % S) * N)[:, None]
    return flat[(idxj + offs).reshape(-1)].reshape(R, N, src.shape[-1])


timeit("A xla100 (shipped)", jax.jit(lambda i: xla_gather(src100, i)), idx)
timeit("B xla128 (512B-aligned rows)",
       jax.jit(lambda i: xla_gather(src128, i)), idx)
timeit("C dma t_tile=1024",
       jax.jit(lambda i: row_gather_dma(src100, i, t_tile=1024)), idx)
timeit("D dma t_tile=4096",
       jax.jit(lambda i: row_gather_dma(src100, i, t_tile=4096)), idx)
