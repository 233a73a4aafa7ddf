"""Bucket-kernel superstep probe: g buckets as ONE masked (S, S) dot with
the slab assembled by in-VMEM lane-concatenation.

The block-diagonal slab kernels (ops/bucket_attn_pallas.py _*_slab_*) lost
to the hybrid because the Pallas TPU block rule forced an (r, d, n) ->
(r*ns, d, S) HBM relayout per operand each way (ROADMAP round-3 negative
result). But the per-bucket kernels' (1, d, g, bs) blocks already deliver g
buckets per grid step — jnp.concatenate([block[:, :, i, :] for i], axis=-1)
assembles the (d, S=g*bs) slab operand with VMEM copies (lane-concat is
legal Mosaic, unlike the sublane-merge reshape that crashed probe_k5), so
the serial g-dot chain becomes one big masked MXU dot with NO HBM relayout.
Cost: the (S, S) f32 exp/mask/where runs on g x the elements (VPU), and the
dot does g x the (near-free) MXU FLOPs.

Measures forward and backward variants at tracking-60k bench shapes
(r=24 rows under share_heads, d=31, dv=24, nb=600, bs=100), bf16 operands:
  fwd:  A XLA einsum (hybrid production)   B per-bucket cols kernel
        C superstep slab-in-VMEM
  bwd:  D per-bucket v2                    E superstep slab-in-VMEM v2
Run on TPU: python scripts/probe_kernel_super.py
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

from hept_tpu.ops.bucket_attn import DENOM_EPS, bucket_rbf_attention_cols_xla
from hept_tpu.ops.bucket_attn_pallas import (
    _bwd_cols_impl,
    _fwd_cols_impl,
    _pad_buckets,
    _pick_group,
)

R, D, DV, NB, BS = 24, 31, 24, 600, 100
N = NB * BS
G = 8  # buckets per superstep

rng = np.random.default_rng(0)
sq = jnp.asarray(rng.standard_normal((R, D, N)), jnp.bfloat16)
sk = jnp.asarray(rng.standard_normal((R, D, N)), jnp.bfloat16)
sv = jnp.asarray(rng.standard_normal((R, DV, N)), jnp.bfloat16)
g_so = jnp.asarray(rng.standard_normal((R, DV, N)), jnp.float32)
g_den = jnp.asarray(rng.standard_normal((R, 1, N)), jnp.float32)


def _super_fwd_kernel(q_ref, k_ref, v_ref, denom_ref, so_ref, *, g: int):
    bs = q_ref.shape[-1]
    S = g * bs
    f32 = jnp.float32
    bdt = q_ref.dtype
    q = jnp.concatenate([q_ref[0, :, i, :] for i in range(g)], axis=-1)
    k = jnp.concatenate([k_ref[0, :, i, :] for i in range(g)], axis=-1)
    v = jnp.concatenate([v_ref[0, :, i, :] for i in range(g)], axis=-1)
    qf = q.astype(f32)
    kf = k.astype(f32)
    d = q.shape[0]
    ones_d = jnp.ones((1, d), f32)
    ones_dc = jnp.ones((d, 1), f32)
    q_sq = -0.5 * jax.lax.dot_general(
        ones_d, qf * qf, (((1,), (0,)), ((), ())), preferred_element_type=f32,
        precision=jax.lax.Precision.HIGHEST)
    k_sq_col = -0.5 * jax.lax.dot_general(
        kf * kf, ones_dc, (((0,), (0,)), ((), ())), preferred_element_type=f32,
        precision=jax.lax.Precision.HIGHEST)
    logits_t = (
        jax.lax.dot_general(k, q, (((0,), (0,)), ((), ())),
                            preferred_element_type=f32)
        + k_sq_col + q_sq
    )  # (S_k, S_q)
    row_b = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0) // bs
    col_b = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1) // bs
    pt = jnp.where(row_b == col_b, jnp.exp(jnp.minimum(logits_t, 0.0)), 0.0)
    den = jnp.sum(pt, axis=0)[None, :] + DENOM_EPS  # (1, S_q)
    so = jax.lax.dot_general(  # (dv, S_q)
        v, pt.astype(bdt), (((1,), (0,)), ((), ())),
        preferred_element_type=f32)
    for i in range(g):
        denom_ref[0, 0, i, :] = den[0, i * bs:(i + 1) * bs]
        so_ref[0, :, i, :] = so[:, i * bs:(i + 1) * bs]


def _super_bwd_kernel(q_ref, k_ref, v_ref, gso_ref, gden_ref,
                      dq_ref, dk_ref, dv_ref, *, g: int):
    bs = q_ref.shape[-1]
    S = g * bs
    f32 = jnp.float32
    bdt = q_ref.dtype
    q = jnp.concatenate([q_ref[0, :, i, :] for i in range(g)], axis=-1)
    k = jnp.concatenate([k_ref[0, :, i, :] for i in range(g)], axis=-1)
    v = jnp.concatenate([v_ref[0, :, i, :] for i in range(g)], axis=-1)
    gso = jnp.concatenate([gso_ref[0, :, i, :] for i in range(g)], axis=-1)
    gden = jnp.concatenate([gden_ref[0:1, 0, i, :] for i in range(g)], axis=-1)
    qf = q.astype(f32)
    kf = k.astype(f32)
    d = q.shape[0]
    ones_d = jnp.ones((1, d), f32)
    ones_dc = jnp.ones((d, 1), f32)
    ones_row = jnp.ones((1, S), bdt)
    q_sq = -0.5 * jax.lax.dot_general(
        ones_d, qf * qf, (((1,), (0,)), ((), ())), preferred_element_type=f32,
        precision=jax.lax.Precision.HIGHEST)
    k_sq_col = -0.5 * jax.lax.dot_general(
        kf * kf, ones_dc, (((0,), (0,)), ((), ())), preferred_element_type=f32,
        precision=jax.lax.Precision.HIGHEST)
    logits_t = (
        jax.lax.dot_general(k, q, (((0,), (0,)), ((), ())),
                            preferred_element_type=f32)
        + k_sq_col + q_sq
    )
    row_b = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0) // bs
    col_b = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1) // bs
    same = row_b == col_b
    pt = jnp.where(same, jnp.exp(jnp.minimum(logits_t, 0.0)), 0.0)
    gp = (
        jax.lax.dot_general(v, gso.astype(bdt), (((0,), (0,)), ((), ())),
                            preferred_element_type=f32)
        + gden.astype(f32)
    )
    dlt = jnp.where(jnp.logical_and(logits_t < 0.0, same), pt * gp, 0.0)
    hi = dlt.astype(bdt)
    lo = (dlt - hi.astype(f32)).astype(bdt)
    ka = jnp.concatenate([k, ones_row], axis=0)
    qa = jnp.concatenate([q, ones_row], axis=0)
    dqa = jax.lax.dot_general(ka, hi, (((1,), (0,)), ((), ())),
                              preferred_element_type=f32) \
        + jax.lax.dot_general(ka, lo, (((1,), (0,)), ((), ())),
                              preferred_element_type=f32)
    dka = jax.lax.dot_general(qa, hi, (((1,), (1,)), ((), ())),
                              preferred_element_type=f32) \
        + jax.lax.dot_general(qa, lo, (((1,), (1,)), ((), ())),
                              preferred_element_type=f32)
    dq = dqa[:d] - dqa[d:d + 1] * qf
    dk = dka[:d] - dka[d:d + 1] * kf
    dvv = jax.lax.dot_general(gso.astype(bdt), pt.astype(bdt),
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=f32)
    for i in range(g):
        dq_ref[0, :, i, :] = dq[:, i * bs:(i + 1) * bs]
        dk_ref[0, :, i, :] = dk[:, i * bs:(i + 1) * bs]
        dv_ref[0, :, i, :] = dvv[:, i * bs:(i + 1) * bs]


def super_fwd(sq, sk, sv, bs=BS, g=G):
    r, d, n = sq.shape
    dv = sv.shape[1]
    nb = n // bs
    grid = (r, nb // g)
    q4 = sq.reshape(r, d, nb, bs)
    k4 = sk.reshape(r, d, nb, bs)
    v4 = sv.reshape(r, dv, nb, bs)
    denom, so = pl.pallas_call(
        functools.partial(_super_fwd_kernel, g=g),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, d, g, bs), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, g, bs), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dv, g, bs), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, g, bs), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dv, g, bs), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r, 1, nb, bs), jnp.float32),
            jax.ShapeDtypeStruct((r, dv, nb, bs), jnp.float32),
        ],
    )(q4, k4, v4)
    return denom.reshape(r, 1, n), so.reshape(r, dv, n)


def super_bwd(sq, sk, sv, g_so, g_den, bs=BS, g=G):
    r, d, n = sq.shape
    dv = sv.shape[1]
    nb = n // bs
    grid = (r, nb // g)
    q4 = sq.reshape(r, d, nb, bs)
    k4 = sk.reshape(r, d, nb, bs)
    v4 = sv.reshape(r, dv, nb, bs)
    gso4 = g_so.reshape(r, dv, nb, bs)
    gden4 = g_den.reshape(r, 1, nb, bs)
    dq, dk, dv_out = pl.pallas_call(
        functools.partial(_super_bwd_kernel, g=g),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, d, g, bs), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, g, bs), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dv, g, bs), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dv, g, bs), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, g, bs), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, d, g, bs), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, g, bs), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dv, g, bs), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r, d, nb, bs), jnp.float32),
            jax.ShapeDtypeStruct((r, d, nb, bs), jnp.float32),
            jax.ShapeDtypeStruct((r, dv, nb, bs), jnp.float32),
        ],
    )(q4, k4, v4, gso4, gden4)
    return (dq.reshape(r, d, n), dk.reshape(r, d, n), dv_out.reshape(r, dv, n))


def _fence(out):
    # host scalar read: block_until_ready returns early through the axon
    # tunnel (see bench.py) — a device_get of one element is the real fence
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))
    return out


def bench(fn, *args, iters=30, label=""):
    try:
        out = _fence(fn(*args))
    except Exception as ex:
        print(f"{label:40s} FAILED: {type(ex).__name__}: {str(ex)[:160]}",
              flush=True)
        return None
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _fence(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:40s} {dt:7.2f} ms", flush=True)
    return out


xla_fwd = jax.jit(lambda q, k, v: bucket_rbf_attention_cols_xla(q, k, v, BS))
ref = xla_fwd(sq, sk, sv)
a = bench(xla_fwd, sq, sk, sv, label="A fwd XLA einsum (hybrid prod)")
b = bench(jax.jit(lambda q, k, v: _fwd_cols_impl(q, k, v, BS)), sq, sk, sv,
          label="B fwd per-bucket cols kernel")
for g in (4, 8, 16):
    c = bench(jax.jit(functools.partial(super_fwd, g=g)), sq, sk, sv,
              label=f"C fwd superstep g={g}")
    if c is not None:
        ok_d = bool(jnp.allclose(c[0], ref[0], rtol=2e-2, atol=1e-2))
        ok_s = bool(jnp.allclose(c[1], ref[1], rtol=5e-2, atol=5e-2))
        print(f"   g={g} matches XLA fwd: denom={ok_d} so={ok_s}", flush=True)

d_ = bench(jax.jit(lambda *a: _bwd_cols_impl(a[:3], a[3:], BS, v2=True)),
           sq, sk, sv, g_den, g_so, label="D bwd per-bucket v2")
for g in (4, 8):
    e = bench(jax.jit(functools.partial(super_bwd, g=g)),
              sq, sk, sv, g_so, g_den, label=f"E bwd superstep g={g}")
    if e is not None and d_ is not None:
        oks = [bool(jnp.allclose(x.astype(jnp.float32), y.astype(jnp.float32),
                                 rtol=5e-2, atol=5e-2))
               for x, y in zip(e, d_)]
        print(f"   g={g} matches v2 bwd: dq={oks[0]} dk={oks[1]} dv={oks[2]}",
              flush=True)
