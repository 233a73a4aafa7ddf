"""Gradient fidelity of the bf16 bucket-attention backward variants.

The 60k bisect (demo arms, ROADMAP) isolated the lr=1e-2 collapse to
kernel_bf16 x the Pallas hybrid backward: fullxla (same bf16 operands, XLA
AD backward) converges to 0.9433 while every hybrid arm collapses. This
probe emulates the two backwards' NUMERICS in plain JAX (identical dtype
flow; MXU bf16 dots == bf16-operand dot_general with f32 accumulation) at
the trained divergence regime (sqrt_w ~ 18, bucket-centered coords) and
measures gradient error against the f32 ground truth.

Variants:
  xla_ad   — what fullxla runs: AD of bucket_rbf_attention_cols_xla on bf16.
  pallas   — current _bwd_cols_kernel: dlt cast bf16 for the dq/dk/dv dots,
             row_sum from the UNROUNDED f32 dlt (inconsistent cancellation).
  rowfix   — row_sum from the rounded dlt (consistent Σdl·(k-q) cancellation).
  f32dots  — rowfix + keep dlt f32 in the dq/dk dots (upcast k/q).
  hilo     — rowfix + hi/lo-split dlt into two bf16 rows per dot.
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from hept_tpu.ops.bucket_attn import bucket_rbf_attention_cols_xla, stable_ratio

jax.config.update("jax_enable_x64", False)

B = 100  # block size
NB = 32
R = 3  # hash rounds (grid rows)
D_X = 24
CD = 7
D = D_X + CD
DV = 24
SQRT_W = 18.0
CENTERED = "--centered" in sys.argv

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 10)
n = NB * B

# x-projection part ~ N(0,1); rpe part = sqrt_w * (bucket center + local)
centers = jax.random.normal(ks[0], (R, CD, NB, 1)) * 2.0
local = jax.random.normal(ks[1], (R, CD, NB, B)) * 0.05
rpe = SQRT_W * ((0.0 if CENTERED else centers) + local)
rpe_k = SQRT_W * ((0.0 if CENTERED else centers)
                  + jax.random.normal(ks[2], (R, CD, NB, B)) * 0.05)
xq = jax.random.normal(ks[3], (R, D_X, NB, B))
xk = jax.random.normal(ks[4], (R, D_X, NB, B))
sq = jnp.concatenate([xq, rpe], axis=1).reshape(R, D, n)
sk = jnp.concatenate([xk, rpe_k], axis=1).reshape(R, D, n)
sv = jax.random.normal(ks[5], (R, DV, n))
g_so = jax.random.normal(ks[6], (R, DV, n))
g_den = jax.random.normal(ks[7], (R, 1, n))

sq_b, sk_b, sv_b = (x.astype(jnp.bfloat16) for x in (sq, sk, sv))
# ground truth: f32 AD of the exact same (bf16-rounded) input VALUES
sq_f, sk_f, sv_f = (x.astype(jnp.float32) for x in (sq_b, sk_b, sv_b))


def loss_like(fn, q, k, v):
    denom, so = fn(q, k, v)
    return (jnp.sum(so * g_so) + jnp.sum(denom.reshape(R, 1, n) * g_den))


def xla_fwd(q, k, v):
    return bucket_rbf_attention_cols_xla(q, k, v, B)


gt = jax.grad(lambda q, k, v: loss_like(xla_fwd, q, k, v), argnums=(0, 1, 2))(
    sq_f, sk_f, sv_f
)

xla_bf = jax.grad(lambda q, k, v: loss_like(xla_fwd, q, k, v),
                  argnums=(0, 1, 2))(sq_b, sk_b, sv_b)


def split_rows(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def pallas_bwd_emulate(q4, k4, v4, gso4, gden4, *, rowfix, dlt_mode,
                       bias_f32=False, gate_le=False, gso_f32=False,
                       dp_round=False):
    """Emulate _bwd_cols_kernel numerics on (r, d, nb, B) bf16 blocks.

    dlt_mode: 'bf16' (current), 'f32' (keep dlt f32 in the dots),
    'hilo' (two bf16 rows).
    bias_f32: add q_sq/k_sq as exact f32 rows (what the XLA fwd does)
    instead of the kernel's hi/lo bf16 augmented rows.
    gate_le: gate the clamp derivative at logits <= 0 (lax.min transpose)
    instead of the kernel's strict <.
    gso_f32: keep the g_so cotangent f32 in the gp/dv dots.
    dp_round: round the value-path dp (g_so·v) to bf16 before adding g_den
    — exactly what XLA AD does (the cotangent of the fwd's p_bf16 cast).
    """
    f32 = jnp.float32
    qf = q4.astype(f32)
    kf = k4.astype(f32)
    # augmented logits: bf16 MXU dot + f32 hi/lo bias rows (emulated exactly)
    qk = jnp.einsum("rdgi,rdgj->rgij", q4, k4, preferred_element_type=f32)
    q_sq = -0.5 * jnp.sum(qf * qf, axis=1)  # (r, g, B)
    k_sq = -0.5 * jnp.sum(kf * kf, axis=1)
    if bias_f32:
        q_sq2, k_sq2 = q_sq, k_sq
    else:
        qh, ql = split_rows(q_sq)
        kh, kl = split_rows(k_sq)
        q_sq2 = qh.astype(f32) + ql.astype(f32)
        k_sq2 = kh.astype(f32) + kl.astype(f32)
    logits = qk + q_sq2[..., :, None] + k_sq2[..., None, :]  # (r,g,Bq,Bk)->
    # kernel works transposed but math is symmetric; use (q,k) orientation
    pt = jnp.exp(jnp.minimum(logits, 0.0))  # (r, g, Bq, Bk)
    dp_so = jnp.einsum("rdgi,rdgj->rgij",
                       gso4 if gso_f32 else gso4.astype(jnp.bfloat16), v4,
                       preferred_element_type=f32)
    if dp_round:
        dp_so = dp_so.astype(jnp.bfloat16).astype(f32)
    gp = dp_so + gden4.astype(f32)[..., None]  # (r, g, Bq, 1)
    gate = (logits <= 0.0) if gate_le else (logits < 0.0)
    dlt = jnp.where(gate, pt * gp, 0.0)  # f32 (r, g, Bq, Bk)
    if dlt_mode == "bf16":
        dlt_c = dlt.astype(jnp.bfloat16)
        dq_dot = jnp.einsum("rdgj,rgij->rdgi", k4, dlt_c,
                            preferred_element_type=f32)
        dk_dot = jnp.einsum("rdgi,rgij->rdgj", q4, dlt_c,
                            preferred_element_type=f32)
        rs_src = dlt_c.astype(f32) if rowfix else dlt
        row_sum = jnp.sum(rs_src, axis=-1)  # (r, g, Bq)
        col_sum = jnp.sum(dlt_c.astype(f32), axis=-2)  # ones-row MXU == exact sum of bf16
    elif dlt_mode == "f32":
        dq_dot = jnp.einsum("rdgj,rgij->rdgi", k4.astype(f32), dlt,
                            preferred_element_type=f32)
        dk_dot = jnp.einsum("rdgi,rgij->rdgj", q4.astype(f32), dlt,
                            preferred_element_type=f32)
        row_sum = jnp.sum(dlt, axis=-1)
        col_sum = jnp.sum(dlt, axis=-2)
    elif dlt_mode == "hilo":
        dh, dl_ = split_rows(dlt)
        def dot2(a, spec_i):
            return (jnp.einsum(spec_i, a, dh, preferred_element_type=f32)
                    + jnp.einsum(spec_i, a, dl_, preferred_element_type=f32))
        dq_dot = dot2(k4, "rdgj,rgij->rdgi")
        dk_dot = dot2(q4, "rdgi,rgij->rdgj")
        dsum = dh.astype(f32) + dl_.astype(f32)
        row_sum = jnp.sum(dsum, axis=-1)
        col_sum = jnp.sum(dsum, axis=-2)
    pt_c = pt.astype(jnp.bfloat16)
    dv_out = jnp.einsum("rdgi,rgij->rdgj",
                        gso4 if gso_f32 else gso4.astype(jnp.bfloat16), pt_c,
                        preferred_element_type=f32)
    dq = dq_dot - row_sum[:, None, :, :] * qf
    dk = dk_dot - col_sum[:, None, :, :] * kf
    return dq, dk, dv_out


def blocks(x):
    d = x.shape[1]
    return x.reshape(R, d, NB, B)


coords_q = np.asarray((rpe / SQRT_W).reshape(R, CD, n), np.float64)
coords_k = np.asarray((rpe_k / SQRT_W).reshape(R, CD, n), np.float64)


def dsqrtw(got):
    """Implied sqrt_w gradient: rpe rows of q̂/k̂ are sqrt_w ⊙ coords, so
    d sqrt_w[col] = Σ_n dq_rpe[col, n]·coords_q + dk_rpe[col, n]·coords_k.
    This is THE runaway direction (diag_ckpt: sqrt_w 7-8 healthy vs 18.6
    and accelerating in the collapsing bf16 runs)."""
    dq = np.asarray(got[0], np.float64).reshape(R, D, n)[:, D_X:]
    dk = np.asarray(got[1], np.float64).reshape(R, D, n)[:, D_X:]
    return (dq * coords_q).sum(-1) + (dk * coords_k).sum(-1)  # (R, CD)


def err(name, got, ref, ref_w=None):
    out = []
    for g_, r_, nm in zip(got, ref, ("dq", "dk", "dv")):
        g_ = np.asarray(g_, np.float64).reshape(R, -1, NB, B)
        r_ = np.asarray(r_, np.float64).reshape(R, -1, NB, B)
        rel = np.linalg.norm(g_ - r_) / (np.linalg.norm(r_) + 1e-30)
        # rpe rows only (the sqrt_w gradient path) for dq/dk
        if nm in ("dq", "dk"):
            gr = g_[:, D_X:]
            rr = r_[:, D_X:]
            rel_rpe = np.linalg.norm(gr - rr) / (np.linalg.norm(rr) + 1e-30)
            out.append(f"{nm} {rel:.2e} (rpe {rel_rpe:.2e})")
        else:
            out.append(f"{nm} {rel:.2e}")
    w = dsqrtw(got)
    if ref_w is not None:
        dw_rel = np.linalg.norm(w - ref_w) / (np.linalg.norm(ref_w) + 1e-30)
        cos = float((w * ref_w).sum()
                    / (np.linalg.norm(w) * np.linalg.norm(ref_w) + 1e-30))
        out.append(f"dw_rel {dw_rel:.2e} cos {cos:+.4f}")
    print(f"{name:24s} " + "  ".join(out))
    return w


print(f"regime: sqrt_w={SQRT_W}, centered={CENTERED}, B={B}, NB={NB}")
xla_bf_f = tuple(x.astype(jnp.float32) for x in xla_bf)
w_gt = dsqrtw(gt)
print("--- vs f32 ground truth (gradient of the ideal f32 function) ---")
err("xla_ad bf16", xla_bf_f, gt, w_gt)

# The reference that matters for TRAINING stability: the exact gradient of
# the actual bf16 forward — which is what XLA AD computes and what the
# converging fullxla arm trains with. Deviations below are backward-only
# inconsistency (the forward is shared).
print("--- vs xla_ad bf16 (exact gradient of the actual bf16 forward) ---")
w_ref = dsqrtw(xla_bf_f)
args = (blocks(sq_b), blocks(sk_b), blocks(sv_b), blocks(g_so),
        g_den.reshape(R, NB, B))
for name, kw in [
    ("pallas current", dict(rowfix=False, dlt_mode="bf16")),
    ("pallas rowfix", dict(rowfix=True, dlt_mode="bf16")),
    ("pallas f32dots", dict(rowfix=True, dlt_mode="f32")),
    ("pallas hilo", dict(rowfix=True, dlt_mode="hilo")),
    ("hilo+bias32", dict(rowfix=True, dlt_mode="hilo", bias_f32=True)),
    ("v2 (hilo+b32+le+dpr)", dict(rowfix=True, dlt_mode="hilo",
                                  bias_f32=True, gate_le=True,
                                  dp_round=True)),
    ("xla-mimic", dict(rowfix=True, dlt_mode="f32", bias_f32=True,
                       gate_le=True, gso_f32=True, dp_round=True)),
    ("cur+bias32 (isolate p)", dict(rowfix=False, dlt_mode="bf16",
                                    bias_f32=True)),
]:
    got = pallas_bwd_emulate(*args, **kw)
    err(name, tuple(x.reshape(R, -1, n) for x in got), xla_bf_f, w_ref)
