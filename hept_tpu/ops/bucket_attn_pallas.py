"""Fused Pallas TPU kernel for per-bucket RBF attention.

Replaces the einsum chain of reference `src/models/attention/hept.py:22-33`
(`qkv_res`). The XLA path materializes the (G, B, B) kernel matrix in HBM
(~0.6 GB per layer at 60k points, read+written twice around the exp); this
kernel keeps each B×B tile in VMEM, writing only the (B, Dv) numerator and
(B,) denominator — a ~3x cut in HBM traffic for the attention math.

Forward:  p = exp(min(q·kᵀ - ½|q|² - ½|k|², 0));  denom = Σ_j p + eps;
          so = p @ v       — per bucket, one grid step per bucket.
Backward: recomputes p (flash-attention-style rematerialization) and forms
          dq = dl @ k - rowsum(dl)·q,  dk = dlᵀ @ q - colsum(dl)·k,
          dv = pᵀ @ g_so,  with dl = p ⊙ (g_so·vᵀ + g_denom) ⊙ [logits < 0].

Buckets whose size is not a multiple of the fp32 sublane tile (8) are padded;
padded *key columns* are masked out of p (so they add no denominator mass),
padded query rows produce garbage that the wrapper slices off, and padded
gradient rows are zero so they contribute nothing in the backward kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bucket_attn import DENOM_EPS

_NEG_INF = -1.0e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fwd_kernel(q_ref, k_ref, v_ref, denom_ref, so_ref, *, bs_real: int):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    qk = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    q_sq = -0.5 * jnp.sum(q * q, axis=-1, keepdims=True)
    k_sq = -0.5 * jnp.sum(k * k, axis=-1, keepdims=True)
    logits = qk + q_sq + jnp.transpose(k_sq)
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    p = jnp.where(col < bs_real, jnp.exp(jnp.minimum(logits, 0.0)), 0.0)
    denom_ref[0, 0, :] = jnp.sum(p, axis=-1) + DENOM_EPS
    so_ref[0] = jnp.dot(p, v, preferred_element_type=jnp.float32)


def _bwd_kernel(
    q_ref, k_ref, v_ref, gso_ref, gden_ref, dq_ref, dk_ref, dv_ref, *, bs_real: int
):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g_so = gso_ref[0]
    g_den = gden_ref[0, 0, :]  # (B,)
    qk = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    q_sq = -0.5 * jnp.sum(q * q, axis=-1, keepdims=True)
    k_sq = -0.5 * jnp.sum(k * k, axis=-1, keepdims=True)
    logits = qk + q_sq + jnp.transpose(k_sq)
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    key_ok = col < bs_real
    p = jnp.where(key_ok, jnp.exp(jnp.minimum(logits, 0.0)), 0.0)

    # dL/dp_ij = g_so_i · v_j + g_den_i ; clamp derivative gates on logits < 0.
    gp = (
        jax.lax.dot_general(
            g_so, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        + g_den[:, None]
    )
    dl = jnp.where(jnp.logical_and(logits < 0.0, key_ok), p * gp, 0.0)

    row_sum = jnp.sum(dl, axis=-1, keepdims=True)  # (B, 1)
    col_sum = jnp.sum(dl, axis=0, keepdims=True)  # (1, B)
    dq_ref[0] = (
        jnp.dot(dl, k, preferred_element_type=jnp.float32) - row_sum * q
    )
    dk_ref[0] = (
        jax.lax.dot_general(
            dl, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        - jnp.transpose(col_sum) * k
    )
    dv_ref[0] = jax.lax.dot_general(
        p, g_so, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _pad_last2(x: Array, rows: int) -> Array:
    pad = rows - x.shape[-2]
    if pad == 0:
        return x
    cfg = [(0, 0)] * (x.ndim - 2) + [(0, pad), (0, 0)]
    return jnp.pad(x, cfg)


def _flatten(sq: Array, sk: Array, sv: Array):
    lead = sq.shape[:-2]
    bs, d = sq.shape[-2:]
    dv = sv.shape[-1]
    g = 1
    for s in lead:
        g *= s
    return (
        sq.reshape(g, bs, d),
        sk.reshape(g, bs, d),
        sv.reshape(g, bs, dv),
        lead,
        g,
        bs,
        d,
        dv,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def bucket_rbf_attention_pallas(sq: Array, sk: Array, sv: Array):
    """Fused per-bucket RBF attention; drop-in for `bucket_rbf_attention_xla`.

    Args: sq, sk: (..., B, D); sv: (..., B, Dv). fp32.
    Returns: (denom (..., B, 1), so (..., B, Dv)).
    """
    denom, so = _fwd_impl(sq, sk, sv)
    return denom, so


def _fwd_impl(sq: Array, sk: Array, sv: Array):
    q, k, v, lead, g, bs, d, dv = _flatten(sq, sk, sv)
    bs_pad = _round_up(bs, 8)
    q = _pad_last2(q, bs_pad)
    k = _pad_last2(k, bs_pad)
    v = _pad_last2(v, bs_pad)

    kernel = functools.partial(_fwd_kernel, bs_real=bs)
    flops_per = 2 * bs_pad * bs_pad * (d + dv)
    denom, so = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, bs_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bs_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bs_pad, dv), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bs_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bs_pad, dv), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g, 1, bs_pad), jnp.float32),
            jax.ShapeDtypeStruct((g, bs_pad, dv), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=g * flops_per,
            bytes_accessed=4 * g * bs_pad * (2 * d + 2 * dv + 1),
            transcendentals=g * bs_pad * bs_pad,
        ),
    )(q, k, v)
    denom = denom[:, 0, :bs].reshape(*lead, bs, 1)
    so = so[:, :bs].reshape(*lead, bs, dv)
    return denom, so


def _fwd_rule(sq, sk, sv):
    out = _fwd_impl(sq, sk, sv)
    return out, (sq, sk, sv)


def _bwd_rule(residuals, grads):
    sq, sk, sv = residuals
    g_denom, g_so = grads
    q, k, v, lead, g, bs, d, dv = _flatten(sq, sk, sv)
    gso = g_so.reshape(g, bs, dv)
    gden = g_denom.reshape(g, 1, bs)
    bs_pad = _round_up(bs, 8)
    q = _pad_last2(q, bs_pad)
    k = _pad_last2(k, bs_pad)
    v = _pad_last2(v, bs_pad)
    gso = _pad_last2(gso, bs_pad)
    if bs_pad != bs:
        gden = jnp.pad(gden, [(0, 0), (0, 0), (0, bs_pad - bs)])

    kernel = functools.partial(_bwd_kernel, bs_real=bs)
    flops_per = 2 * bs_pad * bs_pad * (3 * d + 2 * dv)
    dq, dk, dv_out = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, bs_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bs_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bs_pad, dv), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bs_pad, dv), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bs_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bs_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bs_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bs_pad, dv), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g, bs_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((g, bs_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((g, bs_pad, dv), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=g * flops_per,
            bytes_accessed=4 * g * bs_pad * (4 * d + 4 * dv + 1),
            transcendentals=g * bs_pad * bs_pad,
        ),
    )(q, k, v, gso, gden)
    bs_shape = (*lead, bs)
    return (
        dq[:, :bs].reshape(*bs_shape, d),
        dk[:, :bs].reshape(*bs_shape, d),
        dv_out[:, :bs].reshape(*bs_shape, dv),
    )


bucket_rbf_attention_pallas.defvjp(_fwd_rule, _bwd_rule)


# ---------------------------------------------------------------------------
# Column-major, bucket-batched kernels.
#
# The row-major kernel above runs one bucket per grid step: 14400 steps of
# ~25 KB DMAs are latency-bound (~6.4 us/step = 92 ms at 60k points). These
# kernels take the (c*h, d, n) COLUMN layout the sort pipeline produces
# natively, move G consecutive buckets per grid step (one contiguous lane
# slice — no padding rows, no index arithmetic), and unroll the G per-bucket
# dots inside the step where the data is already VMEM-resident.
# ---------------------------------------------------------------------------


def _pick_group(nb: int, cap: int = 8) -> int:
    """Buckets per grid step: largest divisor of nb <= cap that satisfies the
    Pallas TPU block rule for the (nb-)dim — divisible by 8, or the whole
    axis. cap=8 keeps the unrolled per-bucket temporaries (Mosaic does not
    reuse them across unrolled iterations) within scoped VMEM. Callers pad
    nb with `_pad_buckets` when no such divisor exists (e.g. nb=60)."""
    for g in range(min(cap, nb), 0, -1):
        if nb % g == 0 and (g % 8 == 0 or g == nb):
            return g
    return 0


def _pad_buckets(x4, nb_pad):
    """Zero-pad the bucket axis of (r, d, nb, bs) to nb_pad buckets (padded
    buckets compute garbage that callers slice away)."""
    pad = nb_pad - x4.shape[2]
    if pad == 0:
        return x4
    return jnp.pad(x4, [(0, 0), (0, 0), (0, pad), (0, 0)])


def _split_rows(x):
    """(1, B) f32 -> two bf16 rows (hi, lo) with hi + lo ≈ x to ~bf16²
    relative error — lets large bias terms (-½|q̂|² can be O(100)) ride a
    bf16 augmented contraction without corrupting the RBF exponent."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _fwd_cols_kernel(q_ref, k_ref, v_ref, denom_ref, so_ref, *, g: int):
    """Transpose-free per-bucket forward.

    Every vector that must cross the (sublane, lane) orientation is folded
    into the MXU contractions instead of shuffled on the VPU: the -½|q|² /
    -½|k|² bias rows ride as two extra contraction rows ([q; q_sq; 1] vs
    [k; 1; k_sq]), logits are produced TRANSPOSED ((Bk, Bq)) so the
    denominator is a sublane reduction landing directly in lane layout, and
    all dots are jnp.dot-form or A^T B-form (no A·B^T). Lane<->sublane
    vector shuffles were the round-1 kernels' hidden cost (measured ~6x on
    the backward; scripts/profile_kernel_r2d.py).

    bf16 refs (kernel_bf16 fast mode) run the dots MXU-native (one pass vs
    HIGHEST-f32's six) with f32 accumulation; the f32 bias vectors are
    double-bf16-split (hi+lo rows) so the q·k-vs-|q|² cancellation in the
    RBF exponent keeps ~f32 accuracy."""
    bs = q_ref.shape[-1]
    bf16 = q_ref.dtype == jnp.bfloat16
    prec = None if bf16 else jax.lax.Precision.HIGHEST
    ones_row = jnp.ones((1, bs), q_ref.dtype)
    for i in range(g):
        q = q_ref[0, :, i, :]  # (d, B)
        k = k_ref[0, :, i, :]
        v = v_ref[0, :, i, :]
        qf = q.astype(jnp.float32)
        kf = k.astype(jnp.float32)
        if bf16:
            # Mosaic rejects sublane multi_reduction over the offset layout
            # the bf16->f32 extend produces; ride the MXU (f32 ones-row
            # matvec) for the |q|^2 / |k|^2 sums instead.
            ones_d = jnp.ones((1, q.shape[0]), jnp.float32)
            q_sq = -0.5 * jax.lax.dot_general(
                ones_d, qf * qf, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (1, Bq) lanes
            k_sq = -0.5 * jax.lax.dot_general(
                ones_d, kf * kf, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            q_hi, q_lo = _split_rows(q_sq)
            k_hi, k_lo = _split_rows(k_sq)
            qa = jnp.concatenate([q, q_hi, q_lo, ones_row, ones_row], axis=0)
            ka = jnp.concatenate([k, ones_row, ones_row, k_hi, k_lo], axis=0)
        else:
            q_sq = -0.5 * jnp.sum(qf * qf, axis=0)[None, :]  # (1, Bq) lanes
            k_sq = -0.5 * jnp.sum(kf * kf, axis=0)[None, :]  # (1, Bk) lanes
            qa = jnp.concatenate([q, q_sq, ones_row], axis=0)  # (d+2, Bq)
            ka = jnp.concatenate([k, ones_row, k_sq], axis=0)  # (d+2, Bk)
        logits_t = jax.lax.dot_general(  # (Bk, Bq) = ka^T qa
            ka, qa, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=prec
        )
        pt = jnp.exp(jnp.minimum(logits_t, 0.0))  # (Bk, Bq)
        denom_ref[0, 0, i, :] = jnp.sum(pt, axis=0) + DENOM_EPS
        so_ref[0, :, i, :] = jax.lax.dot_general(  # v (dv,Bk) @ pt -> (dv,Bq)
            v, pt.astype(q_ref.dtype) if bf16 else pt,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=prec
        )


def _bwd_cols_kernel(
    q_ref, k_ref, v_ref, gso_ref, gden_ref, dq_ref, dk_ref, dv_ref, *, g: int
):
    """Transpose-free per-bucket backward (see _fwd_cols_kernel): g_den rides
    the gp contraction as an extra row ([v; 1] vs [g_so; g_den]), per-query
    sums are sublane reductions, per-key sums a ones-row MXU matvec. 6x
    faster than the round-1 formulation (60 -> 10 ms at tracking-60k
    shapes)."""
    bs = q_ref.shape[-1]
    bf16 = q_ref.dtype == jnp.bfloat16
    prec = None if bf16 else jax.lax.Precision.HIGHEST
    cdt = q_ref.dtype  # contraction operand dtype
    ones_row = jnp.ones((1, bs), cdt)
    for i in range(g):
        q = q_ref[0, :, i, :]
        k = k_ref[0, :, i, :]
        v = v_ref[0, :, i, :]
        g_so = gso_ref[0, :, i, :]  # (dv, Bq)
        g_den = gden_ref[0:1, 0, i, :]  # (1, Bq) lanes
        qf = q.astype(jnp.float32)
        kf = k.astype(jnp.float32)
        if bf16:
            # Mosaic rejects sublane multi_reduction over the offset layout
            # the bf16->f32 extend produces; ride the MXU (f32 ones-row
            # matvec) for the |q|^2 / |k|^2 sums instead.
            ones_d = jnp.ones((1, q.shape[0]), jnp.float32)
            q_sq = -0.5 * jax.lax.dot_general(
                ones_d, qf * qf, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (1, Bq)
            k_sq = -0.5 * jax.lax.dot_general(
                ones_d, kf * kf, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            q_sq = -0.5 * jnp.sum(qf * qf, axis=0)[None, :]
            k_sq = -0.5 * jnp.sum(kf * kf, axis=0)[None, :]
        if bf16:
            q_hi, q_lo = _split_rows(q_sq)
            k_hi, k_lo = _split_rows(k_sq)
            qa = jnp.concatenate([q, q_hi, q_lo, ones_row, ones_row], axis=0)
            ka = jnp.concatenate([k, ones_row, ones_row, k_hi, k_lo], axis=0)
        else:
            qa = jnp.concatenate([q, q_sq, ones_row], axis=0)
            ka = jnp.concatenate([k, ones_row, k_sq], axis=0)
        logits_t = jax.lax.dot_general(  # (Bk, Bq)
            ka, qa, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=prec
        )
        pt = jnp.exp(jnp.minimum(logits_t, 0.0))
        # dL/dp^T = (g_so . v + g_den)^T via augmented (0,0) contraction
        va = jnp.concatenate([v, ones_row], axis=0)  # (dv+1, Bk)
        ga = jnp.concatenate([g_so, g_den.astype(cdt)], axis=0)  # (dv+1, Bq)
        gpt = jax.lax.dot_general(
            va, ga, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=prec
        )
        dlt = jnp.where(logits_t < 0.0, pt * gpt, 0.0)  # (Bk, Bq) f32
        dlt_c = dlt.astype(cdt) if bf16 else dlt
        pt_c = pt.astype(cdt) if bf16 else pt
        row_sum = jnp.sum(dlt, axis=0)[None, :]  # (1, Bq), sublane reduce
        dq_ref[0, :, i, :] = (
            jax.lax.dot_general(  # k (d,Bk) @ dlt -> (d, Bq)
                k, dlt_c, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec
            )
            - row_sum * qf
        )
        col_sum = jax.lax.dot_general(  # (1, Bk): ones-row MXU reduction
            ones_row, dlt_c, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        dk_ref[0, :, i, :] = (
            jax.lax.dot_general(  # q (d,Bq) x dlt (Bk,Bq) -> (d, Bk)
                q, dlt_c, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec
            )
            - col_sum * kf
        )
        dv_ref[0, :, i, :] = jax.lax.dot_general(  # g_so (dv,Bq) x pt -> (dv,Bk)
            g_so, pt_c, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec
        )


def _bwd_cols_kernel_v2(
    q_ref, k_ref, v_ref, gso_ref, gden_ref, dq_ref, dk_ref, dv_ref, *, g: int
):
    """bf16 backward with f32-grade numerics at bf16-MXU speed.

    The original bf16-operand backward collapsed tracking-60k training
    (ROADMAP round-3 bisect; see _bwd_cols_impl). This variant removes both
    inconsistencies while keeping the dots MXU-native bf16:
      * the -½|q̂|²/-½|k̂|² bias terms are added as EXACT f32 broadcasts —
        q_sq as a (1, Bq) lane row, k_sq as a (Bk, 1) sublane column (an
        MXU ones-matvec produces it directly in that orientation) — instead
        of hi/lo bf16 augmented rows whose ~2⁻¹⁶ relative error is O(0.1)
        absolute on the logits at trained sqrt_w scales;
      * the dlt cotangent rides the dq/dk dots as a hi/lo bf16 pair (two
        MXU passes, ~2⁻¹⁶ representation error), and the -row_sum·q /
        -col_sum·k corrections come from the SAME operands via a ones-row
        augmentation of k/q — the Σ dl·(k−q) cancellation is consistent by
        construction.
    dv keeps the single rounded pt (that matches the forward's own p→bf16
    cast before the value matmul).
    """
    for i in range(g):
        _bwd_v2_bucket(
            i, q_ref, k_ref, v_ref, gso_ref, gden_ref, dq_ref, dk_ref, dv_ref
        )


def _bwd_v2_bucket(i, q_ref, k_ref, v_ref, gso_ref, gden_ref,
                   dq_ref, dk_ref, dv_ref):
    """One bucket of the v2 backward (shared by the unrolled kernel and the
    fori_loop kernel — identical math, so the 60k convergence evidence for
    hybrid2 carries over to the loop scheduling)."""
    bs = q_ref.shape[-1]
    f32 = jnp.float32
    bdt = q_ref.dtype  # bfloat16
    ones_row = jnp.ones((1, bs), bdt)
    q = q_ref[0, :, i, :]  # (d, Bq)
    k = k_ref[0, :, i, :]
    v = v_ref[0, :, i, :]
    g_so = gso_ref[0, :, i, :]  # (dv, Bq)
    g_den = gden_ref[0:1, 0, i, :]  # (1, Bq) f32
    d = q.shape[0]
    qf = q.astype(f32)
    kf = k.astype(f32)
    ones_d = jnp.ones((1, d), f32)
    ones_dc = jnp.ones((d, 1), f32)
    q_sq = -0.5 * jax.lax.dot_general(  # (1, Bq) lane row
        ones_d, qf * qf, (((1,), (0,)), ((), ())),
        preferred_element_type=f32, precision=jax.lax.Precision.HIGHEST,
    )
    k_sq_col = -0.5 * jax.lax.dot_general(  # (Bk, 1) sublane column
        kf * kf, ones_dc, (((0,), (0,)), ((), ())),
        preferred_element_type=f32, precision=jax.lax.Precision.HIGHEST,
    )
    logits_t = (
        jax.lax.dot_general(  # (Bk, Bq) bf16 MXU, f32 accum
            k, q, (((0,), (0,)), ((), ())), preferred_element_type=f32,
        )
        + k_sq_col
        + q_sq
    )
    pt = jnp.exp(jnp.minimum(logits_t, 0.0))
    gp = (
        jax.lax.dot_general(  # (Bk, Bq)
            v, g_so, (((0,), (0,)), ((), ())), preferred_element_type=f32,
        )
        + g_den.astype(f32)
    )
    dlt = jnp.where(logits_t < 0.0, pt * gp, 0.0)  # f32
    hi = dlt.astype(bdt)
    lo = (dlt - hi.astype(f32)).astype(bdt)
    ka = jnp.concatenate([k, ones_row], axis=0)  # (d+1, Bk)
    qa = jnp.concatenate([q, ones_row], axis=0)  # (d+1, Bq)
    dqa = jax.lax.dot_general(  # (d+1, Bq): rows 0..d-1 dq_dot, row d Σdl
        ka, hi, (((1,), (0,)), ((), ())), preferred_element_type=f32,
    ) + jax.lax.dot_general(
        ka, lo, (((1,), (0,)), ((), ())), preferred_element_type=f32,
    )
    dka = jax.lax.dot_general(  # (d+1, Bk)
        qa, hi, (((1,), (1,)), ((), ())), preferred_element_type=f32,
    ) + jax.lax.dot_general(
        qa, lo, (((1,), (1,)), ((), ())), preferred_element_type=f32,
    )
    dq_ref[0, :, i, :] = dqa[:d] - dqa[d : d + 1] * qf
    dk_ref[0, :, i, :] = dka[:d] - dka[d : d + 1] * kf
    dv_ref[0, :, i, :] = jax.lax.dot_general(  # (dv, Bk)
        g_so, pt.astype(bdt), (((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )


def _bwd_cols_kernel_v2_loop(
    q_ref, k_ref, v_ref, gso_ref, gden_ref, dq_ref, dk_ref, dv_ref, *, g: int
):
    """fori_loop scheduling of the v2 backward: identical per-bucket math
    (`_bwd_v2_bucket`), but Mosaic reuses the loop body's temporaries, so g
    is VMEM-bounded by ONE bucket's working set instead of g unrolled copies
    — lifting the g=8 cap that made the unrolled kernel per-grid-step
    latency-bound (~6.5 us/step x r·nb/8 steps; scripts/probe_kernel_g.py)."""

    def body(i, _):
        _bwd_v2_bucket(
            i, q_ref, k_ref, v_ref, gso_ref, gden_ref, dq_ref, dk_ref, dv_ref
        )
        return 0

    jax.lax.fori_loop(0, g, body, 0)


def _fwd_cols_kernel_loop(q_ref, k_ref, v_ref, denom_ref, so_ref, *, g: int):
    """fori_loop forward for bf16 operands with the v2 backward's numerics
    (bf16 MXU dot + EXACT f32 bias broadcasts): p never leaves VMEM (the
    hybrid XLA-einsum forward materializes it in HBM), and the recomputed p
    in the v2 backward agrees with this forward by construction. A (small)
    forward-numerics change vs the hybrid einsum forward (which rides
    augmented bf16 rows) — convergence-armed before production use."""
    f32 = jnp.float32
    bdt = q_ref.dtype

    def body(i, _):
        q = q_ref[0, :, i, :]
        k = k_ref[0, :, i, :]
        v = v_ref[0, :, i, :]
        d = q.shape[0]
        qf = q.astype(f32)
        kf = k.astype(f32)
        ones_d = jnp.ones((1, d), f32)
        ones_dc = jnp.ones((d, 1), f32)
        q_sq = -0.5 * jax.lax.dot_general(
            ones_d, qf * qf, (((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=jax.lax.Precision.HIGHEST,
        )
        k_sq_col = -0.5 * jax.lax.dot_general(
            kf * kf, ones_dc, (((0,), (0,)), ((), ())),
            preferred_element_type=f32, precision=jax.lax.Precision.HIGHEST,
        )
        logits_t = (
            jax.lax.dot_general(
                k, q, (((0,), (0,)), ((), ())), preferred_element_type=f32,
            )
            + k_sq_col
            + q_sq
        )
        pt = jnp.exp(jnp.minimum(logits_t, 0.0))
        denom_ref[0, 0, i, :] = jnp.sum(pt, axis=0) + DENOM_EPS
        so_ref[0, :, i, :] = jax.lax.dot_general(  # v (dv,Bk) @ pt -> (dv,Bq)
            v, pt.astype(bdt), (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        return 0

    jax.lax.fori_loop(0, g, body, 0)


def _pick_group_loop(nb: int, bytes_per_bucket: int,
                     cap: int = 8 << 20) -> int:
    """Buckets per grid step for the fori_loop kernels: the largest divisor
    of nb satisfying the Pallas block rule (multiple of 8, or the whole
    axis) whose double-buffered block bytes fit the VMEM budget. Returns 0
    if none (callers fall back to the unrolled kernels)."""
    for g in range(nb, 7, -1):
        if nb % g or not (g % 8 == 0 or g == nb):
            continue
        if 2 * g * bytes_per_bucket <= cap:
            return g
    return 0


def _fwd_slab_kernel(q_ref, k_ref, v_ref, denom_ref, so_ref, *, bs: int):
    """Block-diagonal SLAB forward: one grid step processes g consecutive
    buckets as a single (S, S) MXU dot, S = g·bs, with a block-diagonal mask
    zeroing cross-bucket entries.

    The per-bucket loop in `_fwd_cols_kernel` chains g small (B, B) dots —
    serial MXU latency dominates (~6.5 us/grid step vs ~0.3 ms of FLOPs for
    the whole layer; ROADMAP round-3 decomposition). Masked entries are
    exact zeros, so every downstream reduction (denominator sublane sum, the
    value contraction, and all backward sums) automatically restricts to the
    own bucket: identical math at g× the (near-free) MXU FLOPs, ~1/g the
    serial chain length."""
    q = q_ref[0]  # (d, S)
    k = k_ref[0]
    v = v_ref[0]
    S = q.shape[-1]
    bf16 = q_ref.dtype == jnp.bfloat16
    prec = None if bf16 else jax.lax.Precision.HIGHEST
    ones_row = jnp.ones((1, S), q_ref.dtype)
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    if bf16:
        ones_d = jnp.ones((1, q.shape[0]), jnp.float32)
        q_sq = -0.5 * jax.lax.dot_general(
            ones_d, qf * qf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        k_sq = -0.5 * jax.lax.dot_general(
            ones_d, kf * kf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        q_hi, q_lo = _split_rows(q_sq)
        k_hi, k_lo = _split_rows(k_sq)
        qa = jnp.concatenate([q, q_hi, q_lo, ones_row, ones_row], axis=0)
        ka = jnp.concatenate([k, ones_row, ones_row, k_hi, k_lo], axis=0)
    else:
        q_sq = -0.5 * jnp.sum(qf * qf, axis=0)[None, :]
        k_sq = -0.5 * jnp.sum(kf * kf, axis=0)[None, :]
        qa = jnp.concatenate([q, q_sq, ones_row], axis=0)
        ka = jnp.concatenate([k, ones_row, k_sq], axis=0)
    logits_t = jax.lax.dot_general(  # (S_k, S_q)
        ka, qa, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=prec,
    )
    row_b = jax.lax.broadcasted_iota(jnp.int32, logits_t.shape, 0) // bs
    col_b = jax.lax.broadcasted_iota(jnp.int32, logits_t.shape, 1) // bs
    same = row_b == col_b
    pt = jnp.where(same, jnp.exp(jnp.minimum(logits_t, 0.0)), 0.0)
    denom_ref[0, 0, :] = jnp.sum(pt, axis=0) + DENOM_EPS
    so_ref[0] = jax.lax.dot_general(  # v (dv, S_k) @ pt -> (dv, S_q)
        v, pt.astype(q_ref.dtype) if bf16 else pt,
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=prec,
    )


def _bwd_slab_kernel(
    q_ref, k_ref, v_ref, gso_ref, gden_ref, dq_ref, dk_ref, dv_ref, *, bs: int
):
    """Block-diagonal slab backward (see `_fwd_slab_kernel`): the 5 chained
    per-bucket dots of `_bwd_cols_kernel` become 5 slab-wide dots; the
    block-diagonal mask on dlt/pt keeps every contraction within-bucket."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g_so = gso_ref[0]  # (dv, S_q)
    g_den = gden_ref[0:1, 0, :]  # (1, S_q)
    S = q.shape[-1]
    bf16 = q_ref.dtype == jnp.bfloat16
    prec = None if bf16 else jax.lax.Precision.HIGHEST
    cdt = q_ref.dtype
    ones_row = jnp.ones((1, S), cdt)
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    if bf16:
        ones_d = jnp.ones((1, q.shape[0]), jnp.float32)
        q_sq = -0.5 * jax.lax.dot_general(
            ones_d, qf * qf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        k_sq = -0.5 * jax.lax.dot_general(
            ones_d, kf * kf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        q_hi, q_lo = _split_rows(q_sq)
        k_hi, k_lo = _split_rows(k_sq)
        qa = jnp.concatenate([q, q_hi, q_lo, ones_row, ones_row], axis=0)
        ka = jnp.concatenate([k, ones_row, ones_row, k_hi, k_lo], axis=0)
    else:
        q_sq = -0.5 * jnp.sum(qf * qf, axis=0)[None, :]
        k_sq = -0.5 * jnp.sum(kf * kf, axis=0)[None, :]
        qa = jnp.concatenate([q, q_sq, ones_row], axis=0)
        ka = jnp.concatenate([k, ones_row, k_sq], axis=0)
    logits_t = jax.lax.dot_general(  # (S_k, S_q)
        ka, qa, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=prec,
    )
    row_b = jax.lax.broadcasted_iota(jnp.int32, logits_t.shape, 0) // bs
    col_b = jax.lax.broadcasted_iota(jnp.int32, logits_t.shape, 1) // bs
    same = row_b == col_b
    pt = jnp.where(same, jnp.exp(jnp.minimum(logits_t, 0.0)), 0.0)
    va = jnp.concatenate([v, ones_row], axis=0)  # (dv+1, S_k)
    ga = jnp.concatenate([g_so, g_den.astype(cdt)], axis=0)  # (dv+1, S_q)
    gpt = jax.lax.dot_general(
        va, ga, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=prec,
    )
    dlt = jnp.where(jnp.logical_and(logits_t < 0.0, same), pt * gpt, 0.0)
    dlt_c = dlt.astype(cdt) if bf16 else dlt
    pt_c = pt.astype(cdt) if bf16 else pt
    row_sum = jnp.sum(dlt, axis=0)[None, :]  # (1, S_q)
    dq_ref[0] = (
        jax.lax.dot_general(  # k (d, S_k) @ dlt -> (d, S_q)
            k, dlt_c, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        - row_sum * qf
    )
    col_sum = jax.lax.dot_general(  # (1, S_k)
        ones_row, dlt_c, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    dk_ref[0] = (
        jax.lax.dot_general(  # q (d, S_q) x dlt (S_k, S_q) -> (d, S_k)
            q, dlt_c, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        - col_sum * kf
    )
    dv_ref[0] = jax.lax.dot_general(  # g_so (dv, S_q) x pt -> (dv, S_k)
        g_so, pt_c, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )


def _slab128_g(nb: int, bs: int, cap_bytes: int = 6 << 20) -> int:
    """Buckets per flat slab: largest g with nb % g == 0, (g·bs) % 128 == 0
    (the Pallas block rule on the flat lane axis — no relayout needed), and
    the (S, S) f32 temporaries within cap. 0 if none exists."""
    best = 0
    g = 1
    while g <= nb:
        if nb % g == 0 and (g * bs) % 128 == 0 \
                and (g * bs) ** 2 * 4 <= cap_bytes:
            best = g
        g += 1
    return best


def _fwd_slab128_kernel(q_ref, k_ref, v_ref, denom_ref, so_ref, *, bs: int):
    """Flat-slab forward: one grid step = g consecutive buckets as a single
    masked (S, S) MXU dot, read as a contiguous (1, d, S) lane slice of the
    flat (r, d, n) arrays — the bucket axis never leaves the lane dim, so
    there is NO HBM relayout (the cost that sank the batch-dim slab kernels,
    ROADMAP round-3 negative result). Requires S = g·bs divisible by 128
    (native at block_size=128). v2-grade numerics: exact f32 bias broadcasts
    (lane row + MXU ones-matvec sublane column), bf16 MXU dots, f32 accum."""
    f32 = jnp.float32
    bdt = q_ref.dtype
    bf16 = bdt == jnp.bfloat16
    prec = None if bf16 else jax.lax.Precision.HIGHEST
    q = q_ref[0]  # (d, S)
    k = k_ref[0]
    v = v_ref[0]
    S = q.shape[-1]
    d = q.shape[0]
    qf = q.astype(f32)
    kf = k.astype(f32)
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
                            preferred_element_type=f32, precision=prec)
        + k_sq_col + q_sq
    )  # (S_k, S_q)
    row_b = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0) // bs
    col_b = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1) // bs
    pt = jnp.where(row_b == col_b, jnp.exp(jnp.minimum(logits_t, 0.0)), 0.0)
    denom_ref[0, 0, :] = jnp.sum(pt, axis=0) + DENOM_EPS
    so_ref[0] = jax.lax.dot_general(
        v, pt.astype(bdt) if bf16 else pt, (((1,), (0,)), ((), ())),
        preferred_element_type=f32, precision=prec)


def _bwd_slab128_kernel(q_ref, k_ref, v_ref, gso_ref, gden_ref,
                        dq_ref, dk_ref, dv_ref, *, bs: int):
    """Flat-slab backward with v2-grade numerics (see _bwd_cols_kernel_v2):
    exact f32 bias broadcasts, hi/lo-split dlt cotangent, ones-row-augmented
    dq/dk dots so the Σ dl·(k−q) cancellation is consistent; block-diagonal
    mask keeps every contraction within-bucket."""
    f32 = jnp.float32
    bdt = q_ref.dtype
    bf16 = bdt == jnp.bfloat16
    prec = None if bf16 else jax.lax.Precision.HIGHEST
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g_so = gso_ref[0]  # (dv, S_q)
    g_den = gden_ref[0:1, 0, :]  # (1, S_q) f32
    S = q.shape[-1]
    d = q.shape[0]
    qf = q.astype(f32)
    kf = k.astype(f32)
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
                            preferred_element_type=f32, precision=prec)
        + k_sq_col + q_sq
    )
    row_b = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0) // bs
    col_b = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1) // bs
    same = row_b == col_b
    pt = jnp.where(same, jnp.exp(jnp.minimum(logits_t, 0.0)), 0.0)
    gp = (
        jax.lax.dot_general(v, g_so.astype(bdt) if bf16 else g_so,
                            (((0,), (0,)), ((), ())),
                            preferred_element_type=f32, precision=prec)
        + g_den.astype(f32)
    )
    dlt = jnp.where(jnp.logical_and(logits_t < 0.0, same), pt * gp, 0.0)
    if bf16:
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
        pt_c = pt.astype(bdt)
        gso_c = g_so.astype(bdt)
    else:
        ka = jnp.concatenate([k, ones_row], axis=0)
        qa = jnp.concatenate([q, ones_row], axis=0)
        dqa = jax.lax.dot_general(ka, dlt, (((1,), (0,)), ((), ())),
                                  preferred_element_type=f32, precision=prec)
        dka = jax.lax.dot_general(qa, dlt, (((1,), (1,)), ((), ())),
                                  preferred_element_type=f32, precision=prec)
        pt_c = pt
        gso_c = g_so
    dq_ref[0] = dqa[:d] - dqa[d:d + 1] * qf
    dk_ref[0] = dka[:d] - dka[d:d + 1] * kf
    dv_ref[0] = jax.lax.dot_general(
        gso_c, pt_c, (((1,), (1,)), ((), ())),
        preferred_element_type=f32, precision=prec)


def _fwd_slab128_impl(sq: Array, sk: Array, sv: Array, bs: int, g: int):
    r, d, n = sq.shape
    dv = sv.shape[1]
    S = g * bs
    grid = (r, n // S)
    denom, so = pl.pallas_call(
        functools.partial(_fwd_slab128_kernel, bs=bs),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, d, S), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, S), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dv, S), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, S), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dv, S), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r, 1, n), jnp.float32),
            jax.ShapeDtypeStruct((r, dv, n), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=r * n * 2 * S * (d + dv),
            bytes_accessed=4 * r * n * (2 * d + 2 * dv + 1),
            transcendentals=r * n * S,
        ),
    )(sq, sk, sv)
    return denom, so


def _bwd_slab128_impl(residuals, grads, bs, g):
    sq, sk, sv = residuals
    g_denom, g_so = grads
    in_dt = (sq.dtype, sk.dtype, sv.dtype)
    g_so = g_so.astype(jnp.float32)
    g_denom = g_denom.astype(jnp.float32)
    r, d, n = sq.shape
    dv = sv.shape[1]
    S = g * bs
    grid = (r, n // S)
    dq, dk, dv_out = pl.pallas_call(
        functools.partial(_bwd_slab128_kernel, bs=bs),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, d, S), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, S), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dv, S), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dv, S), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, d, S), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, S), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dv, S), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r, d, n), jnp.float32),
            jax.ShapeDtypeStruct((r, d, n), jnp.float32),
            jax.ShapeDtypeStruct((r, dv, n), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=r * n * 2 * S * (3 * d + 2 * dv),
            bytes_accessed=4 * r * n * (4 * d + 4 * dv + 1),
            transcendentals=r * n * S,
        ),
    )(sq, sk, sv, g_so, g_denom)
    return (
        dq.astype(in_dt[0]),
        dk.astype(in_dt[1]),
        dv_out.astype(in_dt[2]),
    )


def _pad_slab(x3, n_pad):
    pad = n_pad - x3.shape[-1]
    if pad == 0:
        return x3
    return jnp.pad(x3, [(0, 0), (0, 0), (0, pad)])


def _slab_g(bs: int, cap_bytes: int = 4 << 20) -> int:
    """Buckets per slab: the largest power-of-two g whose (S, S) f32 mask/
    p/dlt temporaries stay under cap_bytes (g=8 at bs=100 -> 2.56 MB per
    (S,S) f32 array; the bwd kernel keeps ~3 live)."""
    g = 1
    while (2 * g * bs) ** 2 * 4 <= cap_bytes:
        g *= 2
    return g


def _to_slab_batch(x3, S):
    """(r, d, n) -> (r·ns, d, S): the Pallas TPU block rule wants the last
    block dim to be a multiple of 128 OR the full axis — S = g·100 is
    neither on the flat n axis, so the slab index moves into the BATCH dim
    and each block covers its full (d, S) plane. XLA pays one transposed
    copy each way (~0.2 ms per 150 MB at tracking-60k shapes), recovered
    many times over by the de-serialized kernel."""
    r, d, n = x3.shape
    ns = n // S
    return jnp.moveaxis(x3.reshape(r, d, ns, S), 2, 1).reshape(r * ns, d, S)


def _from_slab_batch(y3, r):
    """(r·ns, d, S) -> (r, d, ns·S)."""
    rn, d, S = y3.shape
    ns = rn // r
    return jnp.moveaxis(y3.reshape(r, ns, d, S), 1, 2).reshape(r, d, ns * S)


def _fwd_slab_impl(sq: Array, sk: Array, sv: Array, bs: int, g: int,
                   interpret: bool = False):
    r, d, n = sq.shape
    dv = sv.shape[1]
    S = g * bs
    n_pad = _round_up(n, S)
    sq, sk, sv = (
        _to_slab_batch(_pad_slab(x, n_pad), S) for x in (sq, sk, sv)
    )
    grid = (sq.shape[0],)
    kernel = functools.partial(_fwd_slab_kernel, bs=bs)
    denom, so = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, d, S), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, S), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dv, S), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, S), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dv, S), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((grid[0], 1, S), jnp.float32),
            jax.ShapeDtypeStruct((grid[0], dv, S), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=r * n_pad * 2 * S * (d + dv),
            bytes_accessed=4 * r * n_pad * (2 * d + 2 * dv + 1),
            transcendentals=r * n_pad * S,
        ),
        interpret=interpret,
    )(sq, sk, sv)
    return (
        _from_slab_batch(denom, r)[:, :, :n],
        _from_slab_batch(so, r)[:, :, :n],
    )


def _bwd_slab_impl(residuals, grads, bs, g, interpret: bool = False):
    sq, sk, sv = residuals
    g_denom, g_so = grads
    in_dt = (sq.dtype, sk.dtype, sv.dtype)
    # upcast bf16 residuals: see _bwd_cols_impl (the bf16-operand backward
    # is not the gradient of the bf16 forward and collapses 60k training)
    sq = sq.astype(jnp.float32)
    sk = sk.astype(jnp.float32)
    sv = sv.astype(jnp.float32)
    g_so = g_so.astype(jnp.float32)
    g_denom = g_denom.astype(jnp.float32)
    r, d, n = sq.shape
    dv = sv.shape[1]
    S = g * bs
    n_pad = _round_up(n, S)
    sq, sk, sv, g_so, g_denom = (
        _to_slab_batch(_pad_slab(x, n_pad), S)
        for x in (sq, sk, sv, g_so, g_denom)
    )
    grid = (sq.shape[0],)
    kernel = functools.partial(_bwd_slab_kernel, bs=bs)
    dq, dk, dv_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, d, S), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, S), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dv, S), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dv, S), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, d, S), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, S), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dv, S), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((grid[0], d, S), jnp.float32),
            jax.ShapeDtypeStruct((grid[0], d, S), jnp.float32),
            jax.ShapeDtypeStruct((grid[0], dv, S), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=r * n_pad * 2 * S * (3 * d + 2 * dv),
            bytes_accessed=4 * r * n_pad * (4 * d + 4 * dv + 1),
            transcendentals=r * n_pad * S,
        ),
        interpret=interpret,
    )(sq, sk, sv, g_so, g_denom)
    return (
        _from_slab_batch(dq, r)[:, :, :n].astype(in_dt[0]),
        _from_slab_batch(dk, r)[:, :, :n].astype(in_dt[1]),
        _from_slab_batch(dv_out, r)[:, :, :n].astype(in_dt[2]),
    )


def _make_cols_pallas(bs: int, mode: str = "pallas"):
    slab_g = _slab_g(bs)
    if mode in ("slab", "hybrid_slab") and slab_g < 2:
        mode = {"slab": "pallas", "hybrid_slab": "hybrid"}[mode]  # bs too big
    if mode == "slab2":
        # flat-slab kernels (no relayout) need S = g·bs ≡ 0 mod 128 with
        # g | nb — shape-dependent, so decide per call and fall back to the
        # hybrid2 path when no legal g exists (e.g. bs=100 with prime nb).
        def _fwd2(sq, sk, sv):
            nb = sq.shape[-1] // bs
            g = _slab128_g(nb, bs)
            if g >= 2:
                return _fwd_slab128_impl(sq, sk, sv, bs, g)
            from .bucket_attn import bucket_rbf_attention_cols_xla

            prec = (None if sq.dtype == jnp.bfloat16
                    else jax.lax.Precision.HIGHEST)
            return bucket_rbf_attention_cols_xla(sq, sk, sv, bs,
                                                 precision=prec)

        def _bwd2(residuals, grads):
            sq = residuals[0]
            nb = sq.shape[-1] // bs
            g = _slab128_g(nb, bs)
            if g >= 2:
                return _bwd_slab128_impl(residuals, grads, bs, g)
            return _bwd_cols_impl(residuals, grads, bs,
                                  v2=sq.dtype == jnp.bfloat16)

        @jax.custom_vjp
        def f2(sq, sk, sv):
            return _fwd2(sq, sk, sv)

        f2.defvjp(lambda sq, sk, sv: (_fwd2(sq, sk, sv), (sq, sk, sv)),
                  _bwd2)
        return f2
    hybrid = mode in ("hybrid", "hybrid2", "hybrid2l", "hybrid_slab")
    if hybrid:
        # Hybrid forward: XLA's batched einsum runs the 14400 small per-
        # bucket matmuls as one big MXU batch (6.0 vs 10.2 ms at tracking-
        # 60k shapes — the Pallas forward is bound by per-bucket serial MXU
        # latency, probe_kernel_r3{,b}.py), at the cost of materializing p
        # in HBM (~576 MB round trip, covered by the batching win). The
        # backward stays on the fused Pallas kernel (11.2 vs 17+ ms).
        # HIGHEST precision matches the kernels' explicit f32 request.
        from .bucket_attn import bucket_rbf_attention_cols_xla

        def _fwd(sq, sk, sv):
            # bf16 operands (kernel_bf16): default precision IS the native
            # one-pass MXU path; HIGHEST would force the six-pass f32 dance.
            prec = (None if sq.dtype == jnp.bfloat16
                    else jax.lax.Precision.HIGHEST)
            return bucket_rbf_attention_cols_xla(sq, sk, sv, bs, precision=prec)
    elif mode == "slab":
        def _fwd(sq, sk, sv):
            return _fwd_slab_impl(sq, sk, sv, bs, slab_g)
    else:
        def _fwd(sq, sk, sv):
            # loop2: fori_loop forward (p stays in VMEM, g unbounded by
            # unrolled temporaries); falls back to the unrolled kernel for
            # f32 operands or when no legal loop g exists.
            return _fwd_cols_impl(sq, sk, sv, bs, loop=(mode == "loop2"))

    if mode in ("slab", "hybrid_slab"):
        def _bwd(residuals, grads):
            return _bwd_slab_impl(residuals, grads, bs, slab_g)
    else:
        def _bwd(residuals, grads):
            return _bwd_cols_impl(
                residuals, grads, bs,
                v2=mode in ("hybrid2", "hybrid2l", "loop2"),
                loop=mode in ("hybrid2l", "loop2"),
            )

    @jax.custom_vjp
    def f(sq, sk, sv):
        return _fwd(sq, sk, sv)

    def fwd(sq, sk, sv):
        return _fwd(sq, sk, sv), (sq, sk, sv)

    def bwd(residuals, grads):
        return _bwd(residuals, grads)

    f.defvjp(fwd, bwd)
    return f


_cols_pallas_cache: dict = {}


def bucket_rbf_attention_cols_pallas(sq: Array, sk: Array, sv: Array, *,
                                     block_size: int, hybrid=False):
    """Column-major fused per-bucket RBF attention.

    Args: sq, sk: (r, d, n); sv: (r, dv, n) with n = nb * B (sorted bucket
    layout along the last axis; r = c*h grid rows). `hybrid` selects the
    impl: True/"hybrid" runs the forward as XLA batched einsums (faster
    than the per-bucket-loop Pallas forward; see _make_cols_pallas) with
    the fused per-bucket Pallas backward; "slab" runs the block-diagonal
    slab kernels both directions (one big masked MXU dot per g buckets —
    no serial per-bucket chain); "hybrid_slab" = XLA forward + slab
    backward; False = per-bucket-loop Pallas both directions.
    Returns: (denom (r, 1, n), so (r, dv, n)).
    """
    if hybrid is True:
        mode = "hybrid"
    elif hybrid is False:
        mode = "pallas"
    else:
        mode = hybrid
    fn = _cols_pallas_cache.get((block_size, mode))
    if fn is None:
        fn = _make_cols_pallas(block_size, mode)
        _cols_pallas_cache[(block_size, mode)] = fn
    return fn(sq, sk, sv)


def _fwd_cols_impl(sq: Array, sk: Array, sv: Array, bs: int,
                   loop: bool = False):
    r, d, n = sq.shape
    dv = sv.shape[1]
    nb = n // bs
    g = _pick_group(nb)
    nb_pad = nb if g else -(-nb // 8) * 8
    g = g or _pick_group(nb_pad)
    kernel_fn = _fwd_cols_kernel
    if loop and sq.dtype == jnp.bfloat16:
        in_bytes = bs * (2 * d + dv) * sq.dtype.itemsize
        out_bytes = bs * 4 * (1 + dv)
        g_loop = _pick_group_loop(nb_pad, in_bytes + out_bytes)
        if g_loop > g:
            g = g_loop
            kernel_fn = _fwd_cols_kernel_loop
    grid = (r, nb_pad // g)
    kernel = functools.partial(kernel_fn, g=g)
    sq = _pad_buckets(sq.reshape(r, d, nb, bs), nb_pad)
    sk = _pad_buckets(sk.reshape(r, d, nb, bs), nb_pad)
    sv = _pad_buckets(sv.reshape(r, dv, nb, bs), nb_pad)
    denom, so = pl.pallas_call(
        kernel,
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
            jax.ShapeDtypeStruct((r, 1, nb_pad, bs), jnp.float32),
            jax.ShapeDtypeStruct((r, dv, nb_pad, bs), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=r * nb * 2 * bs * bs * (d + dv),
            bytes_accessed=4 * r * n * (2 * d + 2 * dv + 1),
            transcendentals=r * n * bs,
        ),
    )(sq, sk, sv)
    return (
        denom[:, :, :nb].reshape(r, 1, n),
        so[:, :, :nb].reshape(r, dv, n),
    )


def _bwd_cols_impl(residuals, grads, bs, v2: bool = False,
                   loop: bool = False):
    sq, sk, sv = residuals
    g_denom, g_so = grads
    in_dt = (sq.dtype, sk.dtype, sv.dtype)
    v2 = v2 and sq.dtype == jnp.bfloat16
    if not v2:
        # kernel_bf16 residuals are UPCAST to f32 for the backward: bf16
        # products are exact in f32, so the f32 kernel on upcast residuals
        # reproduces the AD gradient of the actual bf16 forward (what the
        # converging fullxla arm trains with) up to accumulation order. The
        # earlier bf16-operand backward (bf16-rounded dlt cotangent in the
        # dq/dk dots, hi/lo-split bias rows whose ~2^-16 relative error is
        # ~0.15 ABSOLUTE on the RBF logits at trained sqrt_w scales) is NOT
        # that gradient — it collapses tracking-60k at lr=1e-2 while fullxla
        # converges (ROADMAP round-3 bisect: r2stack/noshare/fullc/r2c all
        # collapse, nokb/fullxla converge).
        sq = sq.astype(jnp.float32)
        sk = sk.astype(jnp.float32)
        sv = sv.astype(jnp.float32)
        g_so = g_so.astype(jnp.float32)
    else:
        # v2: bf16-operand dots with f32-grade numerics (_bwd_cols_kernel_v2)
        g_so = g_so.astype(jnp.bfloat16)
    g_denom = g_denom.astype(jnp.float32)
    r, d, n = sq.shape
    dv = sv.shape[1]
    nb = n // bs
    g = _pick_group(nb)
    nb_pad = nb if g else -(-nb // 8) * 8
    g = g or _pick_group(nb_pad)
    kernel_fn = _bwd_cols_kernel_v2 if v2 else _bwd_cols_kernel
    if loop and v2:
        # fori_loop scheduling: same per-bucket math, far larger g (fewer
        # grid steps -> per-step overhead amortized; _bwd_cols_kernel_v2_loop)
        in_bytes = bs * (2 * d * sq.dtype.itemsize + dv * sv.dtype.itemsize
                         + dv * g_so.dtype.itemsize + 4)
        out_bytes = bs * 4 * (2 * d + dv)
        g_loop = _pick_group_loop(nb_pad, in_bytes + out_bytes)
        if g_loop > g:
            g = g_loop
            kernel_fn = _bwd_cols_kernel_v2_loop
    grid = (r, nb_pad // g)
    kernel = functools.partial(kernel_fn, g=g)
    sq = _pad_buckets(sq.reshape(r, d, nb, bs), nb_pad)
    sk = _pad_buckets(sk.reshape(r, d, nb, bs), nb_pad)
    sv = _pad_buckets(sv.reshape(r, dv, nb, bs), nb_pad)
    g_so = _pad_buckets(g_so.reshape(r, dv, nb, bs), nb_pad)
    g_denom = _pad_buckets(g_denom.reshape(r, 1, nb, bs), nb_pad)
    dq, dk, dv_out = pl.pallas_call(
        kernel,
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
            jax.ShapeDtypeStruct((r, d, nb_pad, bs), jnp.float32),
            jax.ShapeDtypeStruct((r, d, nb_pad, bs), jnp.float32),
            jax.ShapeDtypeStruct((r, dv, nb_pad, bs), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=r * nb * 2 * bs * bs * (3 * d + 2 * dv),
            bytes_accessed=4 * r * n * (4 * d + 4 * dv + 1),
            transcendentals=r * n * bs,
        ),
    )(sq, sk, sv, g_so, g_denom)
    return (
        dq[:, :, :nb].reshape(r, d, n).astype(in_dt[0]),
        dk[:, :, :nb].reshape(r, d, n).astype(in_dt[1]),
        dv_out[:, :, :nb].reshape(r, dv, n).astype(in_dt[2]),
    )
