"""Probe: which PRIMITIVE loses linearity at B=2 stacked flat batching?

probe_b2_stacked pinned the superlinearity in the stacked forward (B=2 fwd
102.7 ms vs 2x34.4 expected; bytes only 1.11x/pt, flops exactly 2x/pt — a
runtime effect, not structural). This probe times the forward's constituent
primitives directly at the nh2r8cv2r shapes for n_ev in {1, 2} and prints
each one's per-point ratio, isolating the culprit stage:

  plan      static_bucket_plan (8-round coords-f32 sort + inversion sort)
  xgather   per-layer packed x permute_gather (2 rounds, d_model=24)
  kernel    bucket_rbf_attention_cols_pallas hybrid2 fwd (16 rows/event)
  unsort    packed row-gather unsort (2 rows/event, w=200)
  sort2op   bare 2-operand lax.sort comparator at 16 rows/event
  matmul    (n, 192)x(192, 192) MXU proxy for encoder/FF scaling

Run on TPU: python scripts/probe_b2_primitives.py [iters=30]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from hept_tpu.core.buckets import (
    grouped_sort_carry,
    permute_gather,
    permute_gather_rows,
)
from hept_tpu.ops.bucket_attn import static_bucket_plan

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 30
NE = int(sys.argv[2]) if len(sys.argv) > 2 else 60_000
N_EVS = (tuple(int(v) for v in sys.argv[3].split(","))
         if len(sys.argv) > 3 else (1, 2))
C_PLAN = 8  # static_rounds
C_L = 2  # n_hashes per layer
H = 8
D = 24
CD = 6
DV = 24
BS = 100

rng = np.random.default_rng(0)


def timeit(fn, *args):
    r = fn(*args)
    jax.block_until_ready(r)
    fence = lambda x: float(jnp.asarray(  # noqa: E731
        jax.tree_util.tree_leaves(x)[0]).reshape(-1)[0])
    fence(r)
    for _ in range(3):
        r = fn(*args)
    fence(r)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        r = fn(*args)
    fence(r)
    return (time.perf_counter() - t0) / ITERS * 1e3


results = {}
for n_ev in N_EVS:
    n = n_ev * NE

    hashed = jnp.asarray(rng.standard_normal((C_PLAN, n)), jnp.float32)
    codes0 = jnp.asarray(rng.integers(0, 150, n), jnp.float32)
    coords_cols = jnp.asarray(rng.standard_normal((CD, n)), jnp.float32)

    plan_fn = jax.jit(lambda hh, cc, xx: jax.tree_util.tree_leaves(
        static_bucket_plan(hh, cc, None, xx, sort_events=n_ev,
                           sort_pack=True, sort_ops=8, coords_f32=True)
    )[0])

    xpay = jnp.asarray(rng.standard_normal((n_ev, D, NE)), jnp.float32)
    src = jnp.stack([
        jnp.stack([jnp.asarray(rng.permutation(NE), jnp.int32)
                   for _ in range(n_ev)])
        for _ in range(C_L)
    ])  # (C_L, n_ev, NE)
    inv = jnp.argsort(src, axis=-1).astype(jnp.int32)
    xg_fn = jax.jit(lambda p, s, i: permute_gather(p, s, i, pack=True,
                                                   out_bf16=True))

    rows_k = C_L * n_ev * H
    sq = jnp.asarray(
        rng.standard_normal((rows_k, D + CD, NE)), jnp.bfloat16)
    sv = jnp.asarray(rng.standard_normal((rows_k, DV, NE)), jnp.bfloat16)

    def kern(sq, sk, sv):
        from hept_tpu.ops.bucket_attn_pallas import (
            bucket_rbf_attention_cols_pallas,
        )
        denom, so = bucket_rbf_attention_cols_pallas(
            sq, sk, sv, block_size=BS, hybrid="hybrid2")
        return so

    kern_fn = jax.jit(kern)

    urows = jnp.asarray(
        rng.standard_normal((C_L * n_ev, NE, H * (DV + 1))), jnp.float32)
    usrc = src[:, :, :].reshape(C_L * n_ev, NE)
    uinv = inv.reshape(C_L * n_ev, NE)
    un_fn = jax.jit(lambda r, i, s: permute_gather_rows(r, i, s, pack=True))

    skeys = jnp.asarray(rng.standard_normal((rows_k, NE)), jnp.float32)
    iota = jnp.broadcast_to(jnp.arange(NE, dtype=jnp.uint32), (rows_k, NE))

    def sort2(k, i):
        return jax.lax.sort([k, i], dimension=-1, num_keys=1,
                            is_stable=False)[1]

    sort_fn = jax.jit(sort2)

    a = jnp.asarray(rng.standard_normal((n, 192)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((192, 192)), jnp.bfloat16)
    mm_fn = jax.jit(lambda a, w: a @ w)

    on_tpu = jax.default_backend() == "tpu"
    rows = {
        "plan": (plan_fn, (hashed, codes0, coords_cols)),
        "xgather": (xg_fn, (xpay, src, inv)),
        "unsort": (un_fn, (urows, uinv, usrc)),
        "sort2op": (sort_fn, (skeys, iota)),
        "matmul": (mm_fn, (a, w)),
    }
    if on_tpu:
        rows["kernel"] = (kern_fn, (sq, sq, sv))
    print(f"== n_ev={n_ev} (n={n}) ==", flush=True)
    for tag, (fn, args) in rows.items():
        ms = timeit(fn, *args)
        results.setdefault(tag, {})[n_ev] = ms
        print(f"  {tag:<10s} {ms:8.3f} ms", flush=True)

b0 = N_EVS[0]
for b in N_EVS[1:]:
    print(f"\nper-point B={b}/{b // b0 if b % b0 == 0 else b / b0}x"
          f"B={b0} ratios:", flush=True)
    for tag, r in results.items():
        if b0 in r and b in r:
            print(f"  {tag:<10s} {r[b] / (b / b0 * r[b0]):.3f}", flush=True)
