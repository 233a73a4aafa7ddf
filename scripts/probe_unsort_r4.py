"""Measure the round-4 unsort wall (VERDICT r3 next #3) at the shipped
arms' exact shapes.

The rows arms replaced the per-round [num|denom] minor-axis unsort sorts
with flat row gathers (`permute_gather_rows`). This probe times that
primitive — forward and backward — at the headline (nh2r8cv2r: 8 gathers/
step of (60000, 100 u32)) and accuracy-arm (r12bs128cv2r: 12 gathers/step
of (60032, 100 u32)) shapes, plus the x-side `permute_gather` transport,
so the per-step unsort budget is attributable: target <= ~30 ms/step on
the accuracy-recovery arm.

Run: python scripts/probe_unsort_r4.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from hept_tpu.core.buckets import permute_gather, permute_gather_rows

H, DV = 8, 24
W_ROW = H * (DV + 1)  # 200 f32 -> 100 u32 under bf16 pack


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
    print(f"{tag:<42s} {dt:8.3f} ms", flush=True)
    return dt


rng = np.random.default_rng(0)

for name, c_per_layer, ne in (("nh2r8cv2r (8 rounds/step)", 2, 60000),
                              ("r12bs128cv2r (12 rounds/step)", 3, 60032)):
    layers = 4
    c_step = c_per_layer * layers
    rows = jnp.asarray(
        rng.normal(size=(c_per_layer, ne, W_ROW)).astype(np.float32)
    )
    perms = np.stack([rng.permutation(ne) for _ in range(c_per_layer)])
    inv = np.argsort(perms, axis=-1)
    src = jnp.asarray(perms.astype(np.int32))
    invj = jnp.asarray(inv.astype(np.int32))

    def gather_rows(x):
        return permute_gather_rows(x, invj, src, pack=True).sum(axis=0)

    def gather_rows_grad(x):
        return jax.grad(lambda y: gather_rows(y).sum())(x)

    f = jax.jit(gather_rows)
    g = jax.jit(gather_rows_grad)
    t_f = timeit(f"{name}: row-unsort fwd  x{c_per_layer}", f, rows)
    t_g = timeit(f"{name}: row-unsort f+b x{c_per_layer}", g, rows)
    print(f"  -> per-step unsort estimate: fwd {t_f * layers:.1f} ms, "
          f"fwd+bwd {t_g * layers:.1f} ms ({c_step} rounds)", flush=True)

    # x-side transport: per-layer packed gathers of the 24 x-columns by the
    # c_per_layer round permutations (static_keys path)
    xcols = jnp.asarray(rng.normal(size=(1, 24, ne)).astype(np.float32))

    def gx(x):
        return permute_gather(
            x, src[:, None], invj[:, None], pack=True, out_bf16=True
        )

    def gx_grad(x):
        return jax.grad(lambda y: gx(y).astype(jnp.float32).sum())(x)

    t_xf = timeit(f"{name}: x-gather fwd  x{c_per_layer}", jax.jit(gx), xcols)
    t_xg = timeit(f"{name}: x-gather f+b x{c_per_layer}",
                  jax.jit(gx_grad), xcols)
    print(f"  -> per-step x-transport estimate: fwd {t_xf * layers:.1f} ms, "
          f"fwd+bwd {t_xg * layers:.1f} ms", flush=True)
