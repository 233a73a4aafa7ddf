"""A/B: batch-folded 2-operand sort (current grouped_sort_carry) vs variadic
multi-operand lax.sort at the exact layer workload, multiple calls per jit."""
import sys

sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from hept_tpu.core.buckets import grouped_sort_carry

c, h, n = 3, 8, 61440
rng = np.random.default_rng(0)
kq = jnp.asarray(rng.standard_normal((c, h, n)), jnp.float32)
kk = jnp.asarray(rng.standard_normal((c, h, n)), jnp.float32)
xc = jnp.asarray(rng.standard_normal((30, n)), jnp.float32)  # [x|coords]
od = jnp.asarray(rng.standard_normal((c, h, 25, n)), jnp.float32)
src = jnp.asarray(
    np.stack([np.stack([rng.permutation(n) for _ in range(h)]) for _ in range(c)]).astype(np.int32))


def fence(x):
    return float(jnp.asarray(x, jnp.float32).ravel()[0])


def timeit(tag, f, *args, iters=20):
    t0 = time.perf_counter()
    out = f(*args)
    fence(jax.tree_util.tree_leaves(out)[0])
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    fence(jax.tree_util.tree_leaves(out)[0])
    print(f"{tag:<52s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms "
          f"(compile {tc:.0f}s)", flush=True)
    return out


# --- current: one layer's fwd sorts (merged groups) + unsort, folded
@jax.jit
def folded_layer(kq, kk, xc, od, src):
    (sq, sk), (qsrc, _) = grouped_sort_carry([kq, kk], [xc, xc], pack=True, n_ops=8)
    (u,), _ = grouped_sort_carry([src], [od], pack=True, n_ops=8)
    return sq.sum() + sk.sum() + u.sum()

timeit("folded: layer fwd sorts + unsort (pack)", folded_layer, kq, kk, xc, od, src)


# --- variadic: same work as multi-operand sorts
def pack_rows(x):  # (d, n) f32 -> list of (n,)-rows packed bf16 pairs u32
    d = x.shape[0]
    if d % 2:
        x = jnp.pad(x, [(0, 1), (0, 0)])
    bf = x.astype(jnp.bfloat16).reshape(-1, 2, x.shape[1])
    u32 = jax.lax.bitcast_convert_type(jnp.swapaxes(bf, 1, 2), jnp.uint32)
    return u32  # (d//2, n)


@jax.jit
def variadic_layer(kq, kk, xc, od, src):
    rows = pack_rows(xc)  # (15, n)
    d2 = rows.shape[0]
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.uint32), (c * h, n))
    # both key groups stacked on the row axis: (2*c*h, n)
    keys2 = jnp.concatenate([kq.reshape(c * h, n), kk.reshape(c * h, n)], 0)
    ops = [keys2]
    for j in range(d2):
        rj = jnp.broadcast_to(rows[j][None], (2 * c * h, n))
        ops.append(rj)
    ops.append(jnp.concatenate([iota, iota], 0))
    sorted_ops = jax.lax.sort(ops, dimension=-1, num_keys=1, is_stable=False)
    s_payload = sorted_ops[1]
    # unsort: src keys (c*h, n) + 13 packed payload operands
    odp = pack_rows(od.reshape(c * h * 25, n).reshape(25, -1)[:, :n])  # approx shape for timing
    ops2 = [src.reshape(c * h, n).astype(jnp.int32)]
    for j in range(odp.shape[0]):
        ops2.append(jnp.broadcast_to(odp[j][None], (c * h, n)))
    sorted2 = jax.lax.sort(ops2, dimension=-1, num_keys=1, is_stable=False)
    return s_payload.sum() + sorted2[1].sum()

timeit("variadic: layer fwd sorts + unsort (pack)", variadic_layer, kq, kk, xc, od, src)


# correctness-grade variadic vs folded on one group
@jax.jit
def variadic_one(kq, xc):
    rows = pack_rows(xc)
    ops = [kq.reshape(c * h, n)]
    for j in range(rows.shape[0]):
        ops.append(jnp.broadcast_to(rows[j][None], (c * h, n)))
    out = jax.lax.sort(ops, dimension=-1, num_keys=1, is_stable=False)
    return jnp.stack(out[1:], 1)  # (c*h, 15, n)

@jax.jit
def folded_one(kq, xc):
    (sq,), _ = grouped_sort_carry([kq], [xc], pack=True, n_ops=8)
    return sq

o_v = timeit("variadic one-group", variadic_one, kq, xc)
o_f = timeit("folded one-group", folded_one, kq, xc)
# compare values: unpack variadic u32 -> bf16 pairs -> f32
bf = jax.lax.bitcast_convert_type(np.asarray(o_v), jnp.bfloat16)
vv = np.asarray(bf.astype(jnp.float32)).swapaxes(2, 3).reshape(c * h, n, 30)
ff = np.asarray(o_f).reshape(c * h, 30, n).transpose(0, 2, 1)
print("   values match:", np.allclose(vv, ff, atol=1e-6), flush=True)
print("done", flush=True)
