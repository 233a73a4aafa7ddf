"""Lift the bucket-kernel g=8 unroll cap: fori_loop / batched-dot variants.

The production per-bucket kernels unroll g=8 buckets per grid step (Mosaic
keeps every unrolled temporary live, capping g by scoped VMEM), so at nh2
bench shapes the v2 backward runs r*nb/g = 16*75 = 1200 grid steps at
~6.5 us/step — nearly all per-step overhead (ROADMAP round-3-entry). Two
formulations lift the cap without changing ANY per-bucket math (same dots,
same per-bucket accumulation order -> numerically identical to production,
NOT a new convergence divergence):

  B. fori_loop over the g buckets inside the step (temporaries reused,
     dynamic second-minor index);
  C. batched dot_general over the g axis (one batched MXU call per step).

Measures, at the nh2r8cv2 bench shapes (r=16 rows, nb=600, bs=100, bf16
operands):
  * A  production v2 backward (_bwd_cols_impl, g=8 unroll)
  * B/C backward variants at g in {24, 40, 120, 200}
  * A2 production hybrid forward (XLA einsum, materializes p)
  * B2 fori_loop Pallas forward at g large (p never leaves VMEM)

Run on TPU: python scripts/probe_kernel_g.py
CPU numerics check: JAX_PLATFORMS=cpu python scripts/probe_kernel_g.py --interpret
"""

import sys

sys.path.insert(0, "/root/repo")
import functools
import time

import jax

if "--interpret" in sys.argv:
    # force the CPU backend BEFORE device init: env vars alone do not
    # override this host's sitecustomize-registered TPU tunnel backend
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from hept_tpu.ops.bucket_attn import bucket_rbf_attention_cols_xla
from hept_tpu.ops.bucket_attn_pallas import (
    DENOM_EPS,
    _bwd_cols_impl,
)

INTERPRET = "--interpret" in sys.argv

r, d, dv, bs, nb = 16, 30, 24, 100, 600
n = nb * bs
f32 = jnp.float32
rng = np.random.default_rng(0)
sq = jnp.asarray(rng.standard_normal((r, d, n)) * 0.3, jnp.bfloat16)
sk = jnp.asarray(rng.standard_normal((r, d, n)) * 0.3, jnp.bfloat16)
sv = jnp.asarray(rng.standard_normal((r, dv, n)), jnp.bfloat16)
g_den = jnp.asarray(rng.standard_normal((r, 1, n)), f32)
g_so = jnp.asarray(rng.standard_normal((r, dv, n)), jnp.bfloat16)


def fence(x):
    return float(jnp.asarray(x, f32).ravel()[0])


def timeit(tag, f, *args, iters=30):
    t0 = time.perf_counter()
    out = f(*args)
    fence(jax.tree_util.tree_leaves(out)[0])
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    fence(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{tag:<52s} {dt:8.2f} ms (compile {tc:.0f}s)", flush=True)
    return out


def check(tag, got, ref, tol=2e-5):
    ok = all(
        np.allclose(np.asarray(a, np.float32), np.asarray(b, np.float32),
                    rtol=tol, atol=tol)
        for a, b in zip(jax.tree_util.tree_leaves(got),
                        jax.tree_util.tree_leaves(ref))
    )
    print(f"   {tag} matches production: {ok}", flush=True)
    return ok


# ---------------------------------------------------------------- backward
def _bwd_v2_body(i, refs):
    """One bucket of the production _bwd_cols_kernel_v2 — identical math."""
    (q_ref, k_ref, v_ref, gso_ref, gden_ref, dq_ref, dk_ref, dv_ref) = refs
    bdt = q_ref.dtype
    ones_row = jnp.ones((1, bs), bdt)
    q = q_ref[0, :, i, :]
    k = k_ref[0, :, i, :]
    v = v_ref[0, :, i, :]
    gso = gso_ref[0, :, i, :]
    gden = gden_ref[0:1, 0, i, :]
    dd = q.shape[0]
    qf = q.astype(f32)
    kf = k.astype(f32)
    ones_d = jnp.ones((1, dd), f32)
    ones_dc = jnp.ones((dd, 1), f32)
    q_sq = -0.5 * jax.lax.dot_general(
        ones_d, qf * qf, (((1,), (0,)), ((), ())),
        preferred_element_type=f32, precision=jax.lax.Precision.HIGHEST)
    k_sq_col = -0.5 * jax.lax.dot_general(
        kf * kf, ones_dc, (((0,), (0,)), ((), ())),
        preferred_element_type=f32, precision=jax.lax.Precision.HIGHEST)
    logits_t = jax.lax.dot_general(
        k, q, (((0,), (0,)), ((), ())), preferred_element_type=f32
    ) + k_sq_col + q_sq
    pt = jnp.exp(jnp.minimum(logits_t, 0.0))
    gp = jax.lax.dot_general(
        v, gso, (((0,), (0,)), ((), ())), preferred_element_type=f32
    ) + gden.astype(f32)
    dlt = jnp.where(logits_t < 0.0, pt * gp, 0.0)
    hi = dlt.astype(bdt)
    lo = (dlt - hi.astype(f32)).astype(bdt)
    ka = jnp.concatenate([k, ones_row], axis=0)
    qa = jnp.concatenate([q, ones_row], axis=0)
    dqa = jax.lax.dot_general(
        ka, hi, (((1,), (0,)), ((), ())), preferred_element_type=f32
    ) + jax.lax.dot_general(
        ka, lo, (((1,), (0,)), ((), ())), preferred_element_type=f32)
    dka = jax.lax.dot_general(
        qa, hi, (((1,), (1,)), ((), ())), preferred_element_type=f32
    ) + jax.lax.dot_general(
        qa, lo, (((1,), (1,)), ((), ())), preferred_element_type=f32)
    dq_ref[0, :, i, :] = dqa[:dd] - dqa[dd : dd + 1] * qf
    dk_ref[0, :, i, :] = dka[:dd] - dka[dd : dd + 1] * kf
    dv_ref[0, :, i, :] = jax.lax.dot_general(
        gso, pt.astype(bdt), (((1,), (1,)), ((), ())),
        preferred_element_type=f32)


def _bwd_loop_kernel(*refs, g: int):
    jax.lax.fori_loop(0, g, lambda i, c: (_bwd_v2_body(i, refs), 0)[1], 0)


def make_bwd(g, kernel_fn):
    grid = (r, nb // g)

    @jax.jit
    def f(sq, sk, sv, gso, gden):
        args = [
            sq.reshape(r, d, nb, bs), sk.reshape(r, d, nb, bs),
            sv.reshape(r, dv, nb, bs), gso.reshape(r, dv, nb, bs),
            gden.reshape(r, 1, nb, bs),
        ]
        dq, dk, dvv = pl.pallas_call(
            functools.partial(kernel_fn, g=g),
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
                jax.ShapeDtypeStruct((r, d, nb, bs), f32),
                jax.ShapeDtypeStruct((r, d, nb, bs), f32),
                jax.ShapeDtypeStruct((r, dv, nb, bs), f32),
            ],
            interpret=INTERPRET,
        )(*args)
        return (dq.reshape(r, d, n), dk.reshape(r, d, n),
                dvv.reshape(r, dv, n))

    return f


def _bwd_batched_kernel(q_ref, k_ref, v_ref, gso_ref, gden_ref,
                        dq_ref, dk_ref, dv_ref, *, g: int):
    """Batched-dot backward: every per-bucket dot becomes ONE dot_general
    batched over the g axis. Same per-bucket contractions -> same numerics;
    block layouts put g on the second-minor axis so batch elements are
    sublane groups."""
    bdt = q_ref.dtype
    q = q_ref[0].transpose(1, 0, 2)  # (g, d, bs)
    k = k_ref[0].transpose(1, 0, 2)
    v = v_ref[0].transpose(1, 0, 2)
    gso = gso_ref[0].transpose(1, 0, 2)  # (g, dv, bs)
    gden = gden_ref[0].transpose(1, 0, 2)  # (g, 1, bs) f32
    ones_row = jnp.ones((g, 1, bs), bdt)
    qf = q.astype(f32)
    kf = k.astype(f32)
    q_sq = -0.5 * jnp.sum(qf * qf, axis=1, keepdims=True)  # (g, 1, bs)
    k_sq = -0.5 * jnp.sum(kf * kf, axis=1, keepdims=True)
    logits_t = jax.lax.dot_general(  # (g, bsK, bsQ)
        k, q, (((1,), (1,)), ((0,), (0,))), preferred_element_type=f32
    ) + k_sq.transpose(0, 2, 1) + q_sq
    pt = jnp.exp(jnp.minimum(logits_t, 0.0))
    gp = jax.lax.dot_general(
        v, gso, (((1,), (1,)), ((0,), (0,))), preferred_element_type=f32
    ) + gden
    dlt = jnp.where(logits_t < 0.0, pt * gp, 0.0)
    hi = dlt.astype(bdt)
    lo = (dlt - hi.astype(f32)).astype(bdt)
    ka = jnp.concatenate([k, ones_row], axis=1)  # (g, d+1, bsK)
    qa = jnp.concatenate([q, ones_row], axis=1)
    dqa = jax.lax.dot_general(  # (g, d+1, bsQ)
        ka, hi, (((2,), (1,)), ((0,), (0,))), preferred_element_type=f32
    ) + jax.lax.dot_general(
        ka, lo, (((2,), (1,)), ((0,), (0,))), preferred_element_type=f32)
    dka = jax.lax.dot_general(  # (g, d+1, bsK)
        qa, hi, (((2,), (2,)), ((0,), (0,))), preferred_element_type=f32
    ) + jax.lax.dot_general(
        qa, lo, (((2,), (2,)), ((0,), (0,))), preferred_element_type=f32)
    dq = dqa[:, :d] - dqa[:, d : d + 1] * qf
    dk = dka[:, :d] - dka[:, d : d + 1] * kf
    dvv = jax.lax.dot_general(  # (g, dv, bsK)
        gso, pt.astype(bdt), (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=f32)
    dq_ref[0] = dq.transpose(1, 0, 2)
    dk_ref[0] = dk.transpose(1, 0, 2)
    dv_ref[0] = dvv.transpose(1, 0, 2)


# ---------------------------------------------------------------- forward
def _fwd_loop_kernel(q_ref, k_ref, v_ref, denom_ref, so_ref, *, g: int):
    """fori_loop forward, bf16 operands with exact f32 bias broadcasts (the
    v2-backward numerics applied to the forward: logits = bf16 MXU dot +
    f32 q_sq row + f32 k_sq column). p stays in VMEM."""
    bdt = q_ref.dtype

    def body(i, _):
        q = q_ref[0, :, i, :]
        k = k_ref[0, :, i, :]
        v = v_ref[0, :, i, :]
        dd = q.shape[0]
        qf = q.astype(f32)
        kf = k.astype(f32)
        ones_d = jnp.ones((1, dd), f32)
        ones_dc = jnp.ones((dd, 1), f32)
        q_sq = -0.5 * jax.lax.dot_general(
            ones_d, qf * qf, (((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=jax.lax.Precision.HIGHEST)
        k_sq_col = -0.5 * jax.lax.dot_general(
            kf * kf, ones_dc, (((0,), (0,)), ((), ())),
            preferred_element_type=f32, precision=jax.lax.Precision.HIGHEST)
        logits_t = jax.lax.dot_general(
            k, q, (((0,), (0,)), ((), ())), preferred_element_type=f32
        ) + k_sq_col + q_sq
        pt = jnp.exp(jnp.minimum(logits_t, 0.0))
        denom_ref[0, 0, i, :] = jnp.sum(pt, axis=0) + DENOM_EPS
        so_ref[0, :, i, :] = jax.lax.dot_general(
            v, pt.astype(bdt), (((1,), (0,)), ((), ())),
            preferred_element_type=f32)
        return 0

    jax.lax.fori_loop(0, g, body, 0)


def make_fwd(g):
    grid = (r, nb // g)

    @jax.jit
    def f(sq, sk, sv):
        denom, so = pl.pallas_call(
            functools.partial(_fwd_loop_kernel, g=g),
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
                jax.ShapeDtypeStruct((r, 1, nb, bs), f32),
                jax.ShapeDtypeStruct((r, dv, nb, bs), f32),
            ],
            interpret=INTERPRET,
        )(sq.reshape(r, d, nb, bs), sk.reshape(r, d, nb, bs),
          sv.reshape(r, dv, nb, bs))
        return denom.reshape(r, 1, n), so.reshape(r, dv, n)

    return f


# ---------------------------------------------------------------- run
if INTERPRET:
    # CPU numerics check at tiny shapes (production path needs TPU; compare
    # the two new formulations against each other + the XLA reference)
    r, d, dv, bs, nb = 2, 8, 6, 16, 12
    n = nb * bs
    sq = jnp.asarray(rng.standard_normal((r, d, n)) * 0.3, jnp.bfloat16)
    sk = jnp.asarray(rng.standard_normal((r, d, n)) * 0.3, jnp.bfloat16)
    sv = jnp.asarray(rng.standard_normal((r, dv, n)), jnp.bfloat16)
    g_den = jnp.asarray(rng.standard_normal((r, 1, n)), f32)
    g_so = jnp.asarray(rng.standard_normal((r, dv, n)), jnp.bfloat16)

    # production Pallas can't lower on true CPU; reference = XLA autodiff of
    # the f32 forward (loose tol: bf16-operand dots vs f32), plus B-vs-C
    # cross-check at tight tol (identical math).
    def fwd_loss(a, b, c):
        den, so = bucket_rbf_attention_cols_xla(a, b, c, bs)
        return jnp.sum(den * g_den) + jnp.sum(so * g_so.astype(f32))

    ref_b = jax.grad(fwd_loss, argnums=(0, 1, 2))(
        sq.astype(f32), sk.astype(f32), sv.astype(f32))
    ok = True
    for g in (4, 12):
        got_b = make_bwd(g, _bwd_loop_kernel)(sq, sk, sv, g_so, g_den)
        ok &= check(f"B bwd fori g={g} (vs XLA AD)", got_b, ref_b, tol=5e-2)
        got_c = make_bwd(g, _bwd_batched_kernel)(sq, sk, sv, g_so, g_den)
        ok &= check(f"C bwd batched g={g} (vs XLA AD)", got_c, ref_b, tol=5e-2)
        ok &= check(f"B vs C g={g}", got_c, got_b, tol=1e-5)
    ref_f = bucket_rbf_attention_cols_xla(
        sq.astype(f32), sk.astype(f32), sv.astype(f32), bs)
    for g in (4, 12):
        got = make_fwd(g)(sq, sk, sv)
        ok &= check(f"B2 fwd fori g={g}", got, ref_f, tol=5e-2)
    print("INTERPRET OK" if ok else "INTERPRET MISMATCH", flush=True)
    sys.exit(0 if ok else 1)

# TPU timings
prod_bwd = jax.jit(
    lambda a, b, c, gs, gd: _bwd_cols_impl((a, b, c), (gd, gs), bs, v2=True))
ref_b = timeit("A  production v2 bwd (g=8 unroll)", prod_bwd,
               sq, sk, sv, g_so, g_den)

for g in (24, 40, 120, 200):
    try:
        got = timeit(f"B  bwd fori_loop g={g}",
                     make_bwd(g, _bwd_loop_kernel), sq, sk, sv, g_so, g_den)
        check(f"B g={g}", got, ref_b)
    except Exception as e:
        print(f"   B g={g} FAILED: {type(e).__name__}: {str(e)[:160]}",
              flush=True)
for g in (24, 40, 120):
    try:
        got = timeit(f"C  bwd batched-dot g={g}",
                     make_bwd(g, _bwd_batched_kernel), sq, sk, sv, g_so, g_den)
        check(f"C g={g}", got, ref_b)
    except Exception as e:
        print(f"   C g={g} FAILED: {type(e).__name__}: {str(e)[:160]}",
              flush=True)

prod_fwd = jax.jit(
    lambda a, b, c: bucket_rbf_attention_cols_xla(a, b, c, bs))
ref_f = timeit("A2 production hybrid fwd (XLA einsum, bf16 in)", prod_fwd,
               sq, sk, sv)
for g in (24, 40, 120, 200):
    try:
        got = timeit(f"B2 fwd fori_loop g={g}", make_fwd(g), sq, sk, sv)
        check(f"B2 g={g}", got, ref_f, tol=5e-2)
    except Exception as e:
        print(f"   B2 g={g} FAILED: {type(e).__name__}: {str(e)[:160]}",
              flush=True)
print("done", flush=True)
