"""Round-3 unsort-wall probe: can the [num|denom] OR-accumuland unsort move
as a ROW-MAJOR gather instead of a minor-axis lax.sort?

The canon unsort (ops/bucket_attn.py:747-757) re-sorts (c-1, n_ev*h, dv+1, n)
payloads on broadcast keys — ~6 ms/layer fwd at 60k although the pure data
movement is ~0.1 ms at HBM roofline. Both lax.sort and take_along_axis move
(1, n) column-rows on the LANE axis at ~16 GB/s. A row-major layout
(n on the sublane axis, features on lanes) turns the permutation apply into
a gather of contiguous 100-800 B rows, which XLA lowers as row fetches.

Measured variants (all numerically checked against A on the same inputs):
  A. grouped_sort_carry unsort at the exact canon shapes (production)
  B. row gather, wide rows: od (c-1, n, h*(dv+1)) f32 -> flat row index
  C. row gather, narrow rows: per-(c,h) od (c-1, h, n, dv+1) f32
  D. row gather, u32-packed wide rows (bf16 pairs, 400 B rows)
  E. the column->row relayout (transpose) cost alone, both directions
  F. end-to-end alternative: transpose + row gather + transpose back
  G. XLA fwd einsum emitting row-major (r, g, bs, dv) vs column (r, dv, g, bs)
"""
import sys

sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from hept_tpu.core.buckets import grouped_sort_carry

N = 60_000
C, H, DV = 3, 8, 24  # rounds, heads, head dim; canon unsorts C-1 rounds
BS, NB = 100, 600
W = H * (DV + 1)  # 200 wide-row features


def fence(v):
    return float(jnp.asarray(v, jnp.float32).ravel()[0])


def timeit(tag, f, *args, iters=20):
    t0 = time.perf_counter()
    out = f(*args)
    fence(jax.tree_util.tree_leaves(out)[0])
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    fence(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{tag:<58s} {dt:8.2f} ms (compile {tc:.0f}s)", flush=True)
    return out, dt


rng = np.random.default_rng(0)
# composed canonical maps f: round-r sorted slot -> canonical position
fmap = jnp.asarray(
    np.stack([rng.permutation(N) for _ in range(C - 1)]).astype(np.int32)
)  # (C-1, N)
od = jnp.asarray(
    rng.standard_normal((C - 1, H, DV + 1, N)).astype(np.float32)
)

# ---- A. production sort-based canon unsort -------------------------------
f_b = jnp.broadcast_to(fmap[:, None, None, :], (C - 1, 1, H, N)).reshape(
    C - 1, H, N
)


@jax.jit
def unsort_sort(od, f_b):
    (odu,), _ = grouped_sort_carry(
        [f_b], [od], pack=True, n_ops=8
    )
    return odu


out_a, t_a = timeit("A sort-carry unsort (production, pack=bf16)",
                    unsort_sort, od, f_b)


# ---- B. wide row gather ---------------------------------------------------
# od_rows: (C-1, N, W) — all heads' [num|denom] contiguous per point.
od_rows = jnp.asarray(
    np.moveaxis(np.asarray(od).reshape(C - 1, W, N), 1, 2).copy()
)


@jax.jit
def unsort_rowwide(od_rows, fmap):
    flat = od_rows.reshape((C - 1) * N, W)
    offs = (jnp.arange(C - 1, dtype=jnp.int32) * N)[:, None]
    # out[r, pos, :] = od_rows[r, s, :] where fmap[r, s] = pos
    # i.e. scatter; as a gather we need inv. For the probe both directions
    # cost the same — use fmap as a gather index (pos -> source slot).
    fidx = (fmap + offs).reshape(-1)
    return flat[fidx].reshape(C - 1, N, W)


out_b, t_b = timeit("B row gather wide (N, 200) f32 800B rows",
                    unsort_rowwide, od_rows, fmap)

# ---- C. narrow row gather -------------------------------------------------
od_narrow = jnp.asarray(np.moveaxis(np.asarray(od), 3, 2).copy())  # (C-1,H,N,25)


@jax.jit
def unsort_rownarrow(od_narrow, fmap):
    flat = od_narrow.reshape((C - 1) * H * N, DV + 1)
    offs = (jnp.arange((C - 1) * H, dtype=jnp.int32) * N).reshape(C - 1, H, 1)
    fidx = (fmap[:, None, :] + offs).reshape(-1)
    return flat[fidx].reshape(C - 1, H, N, DV + 1)


out_c, t_c = timeit("C row gather narrow (N, 25) f32 100B rows",
                    unsort_rownarrow, od_narrow, fmap)

# ---- D. u32-packed wide rows ---------------------------------------------
odb = od_rows.astype(jnp.bfloat16)
od_u32 = jax.lax.bitcast_convert_type(
    odb.reshape(C - 1, N, W // 2, 2), jnp.uint32
)  # (C-1, N, 100)


@jax.jit
def unsort_rowu32(od_u32, fmap):
    flat = od_u32.reshape((C - 1) * N, W // 2)
    offs = (jnp.arange(C - 1, dtype=jnp.int32) * N)[:, None]
    fidx = (fmap + offs).reshape(-1)
    return flat[fidx].reshape(C - 1, N, W // 2)


out_d, t_d = timeit("D row gather u32-packed (N, 100) 400B rows",
                    unsort_rowu32, od_u32, fmap)

# ---- E. relayout (transpose) costs ----------------------------------------
timeit("E1 col->row transpose (C-1, H*(dv+1), N)->(C-1, N, W)",
       jax.jit(lambda x: jnp.swapaxes(x.reshape(C - 1, W, N), 1, 2)), od)
timeit("E2 row->col transpose back",
       jax.jit(lambda x: jnp.swapaxes(x, 1, 2)), od_rows)
timeit("E3 col->row transpose bf16",
       jax.jit(lambda x: jnp.swapaxes(x.reshape(C - 1, W, N), 1, 2)),
       od.astype(jnp.bfloat16))

# ---- F. end-to-end: transpose + row gather + transpose back ---------------


@jax.jit
def unsort_via_rows(od, fmap):
    rows = jnp.swapaxes(od.reshape(C - 1, W, N), 1, 2)  # (C-1, N, W)
    flat = rows.reshape((C - 1) * N, W)
    offs = (jnp.arange(C - 1, dtype=jnp.int32) * N)[:, None]
    fidx = (fmap + offs).reshape(-1)
    g = flat[fidx].reshape(C - 1, N, W)
    return jnp.swapaxes(g, 1, 2).reshape(C - 1, H, DV + 1, N)


out_f, t_f = timeit("F transpose + wide row gather + transpose back",
                    unsort_via_rows, od, fmap)

# numeric check F vs a plain take_along_axis reference
ref = jnp.take_along_axis(od, fmap[:, None, None, :], axis=3)
ok = np.allclose(np.asarray(out_f), np.asarray(ref), rtol=1e-6, atol=1e-6)
print(f"   F matches take_along_axis reference: {ok}", flush=True)

# ---- G. kernel einsum output layout ---------------------------------------
r = (C) * H
d = 30
sq = jnp.asarray(rng.standard_normal((r, d, NB, BS)).astype(np.float32))
sk = jnp.asarray(rng.standard_normal((r, d, NB, BS)).astype(np.float32))
sv = jnp.asarray(rng.standard_normal((r, DV, NB, BS)).astype(np.float32))


@jax.jit
def fwd_cols(sq, sk, sv):
    logits = jnp.einsum("rdgi,rdgj->rgij", sq, sk,
                        preferred_element_type=jnp.float32)
    p = jnp.exp(jnp.minimum(logits, 0.0)).astype(jnp.bfloat16)
    so = jnp.einsum("rdgj,rgij->rdgi", sv.astype(jnp.bfloat16), p,
                    preferred_element_type=jnp.float32)
    return so


@jax.jit
def fwd_rows(sq, sk, sv):
    logits = jnp.einsum("rdgi,rdgj->rgij", sq, sk,
                        preferred_element_type=jnp.float32)
    p = jnp.exp(jnp.minimum(logits, 0.0)).astype(jnp.bfloat16)
    so = jnp.einsum("rgij,rdgj->rgid", p, sv.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
    return so  # (r, g, bs, dv) row-major


_, t_gc = timeit("G1 fwd einsum, column-major so (r,d,g,bs)",
                 fwd_cols, sq, sk, sv)
_, t_gr = timeit("G2 fwd einsum, row-major so (r,g,bs,dv)",
                 fwd_rows, sq, sk, sv)

print(f"SUMMARY A={t_a:.2f} B={t_b:.2f} C={t_c:.2f} D={t_d:.2f} "
      f"F={t_f:.2f} G_col={t_gc:.2f} G_row={t_gr:.2f}", flush=True)
