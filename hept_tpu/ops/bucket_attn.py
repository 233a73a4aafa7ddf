"""HEPT bucket attention: the computational core.

Per bucket of `block_size` sorted points, computes the unnormalized RBF
kernel `exp(clamp(q·kᵀ - ½|q|² - ½|k|², max=0))`, its row sums (denominator)
and the weighted value sum (numerator), then OR-combines `n_hashes` rounds as
`Σ_hashes num / Σ_hashes denom` — the math of reference
`src/models/attention/hept.py:22-33,110-115` / `example/hept.py:7-18,74-79`.

Two implementations:
  * `bucket_rbf_attention_xla`: plain einsums; golden reference and CPU path.
  * Pallas fused kernel (ops/bucket_attn_pallas.py): keeps the (B, B) kernel
    matrix in VMEM, never materializing it in HBM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import Array

from ..core.buckets import (
    grouped_sort_carry,
    permute_gather,
    permute_gather_rows,
    sort_carry,
    unsort_carry,
)
from ..core.hashing import lsh_mapping

DENOM_EPS = 1e-20  # reference hept.py:29 / example/hept.py:14


@jax.custom_vjp
def stable_ratio(num, den):
    """num / den with a denominator-square-free VJP.

    Plain AD of num/den computes -g*num/den**2; with the reference's
    DENOM_EPS = 1e-20 an attention row whose probabilities all underflow
    (den == 1e-20) makes den**2 underflow f32 to 0 and the gradient becomes
    0*x/0 = NaN. Using the already-computed output o = num/den gives
    d num = g/den and d den = -sum(g*o)/den — no square, finite everywhere
    representable. `den` must be broadcastable to num with size 1 on exactly
    the axes it reduces over.
    """
    return num / den


def _stable_ratio_fwd(num, den):
    o = num / den
    return o, (o, den)


def _stable_ratio_bwd(res, g):
    o, den = res
    inv = 1.0 / den
    d_num = g * inv
    go = g * o
    # reduce over the broadcasted axes (where den has size 1 and num doesn't)
    axes = tuple(i for i, (a, b) in enumerate(zip(go.shape, den.shape)) if b == 1 and a != 1)
    d_den = -jnp.sum(go, axis=axes, keepdims=True) * inv
    return d_num, d_den


stable_ratio.defvjp(_stable_ratio_fwd, _stable_ratio_bwd)


def bucket_rbf_attention_xla(sq: Array, sk: Array, sv: Array):
    """Per-bucket unnormalized RBF attention (XLA einsum path).

    Args:
      sq, sk: (..., B, D) bucketed q̂ / k̂; sv: (..., B, Dv).
    Returns:
      (denom, so): (..., B, 1) row sums + eps, (..., B, Dv) numerators.
    """
    q_sq = -0.5 * jnp.sum(sq * sq, axis=-1, keepdims=True)
    k_sq = -0.5 * jnp.sum(sk * sk, axis=-1, keepdims=True)
    logits = jnp.einsum(
        "...id,...jd->...ij", sq, sk, preferred_element_type=jnp.float32
    )
    logits = logits + q_sq + jnp.swapaxes(k_sq, -1, -2)
    p = jnp.exp(jnp.minimum(logits, 0.0))
    denom = jnp.sum(p, axis=-1, keepdims=True) + DENOM_EPS
    so = jnp.einsum("...ij,...jd->...id", p, sv, preferred_element_type=jnp.float32)
    return denom, so


def dense_rbf_attention(q_hat: Array, k_hat: Array, v: Array):
    """Exact O(N²) RBF attention — golden reference for property tests.

    Args: q_hat, k_hat: (h, n, d); v: (h, n, dv). Returns (h, n, dv).
    This is what HEPT approximates: normalized kernel attention with the RBF
    kernel exp(q·k - ½|q|² - ½|k|²) = exp(-½|q-k|²), clamped at 1.
    """
    q_sq = -0.5 * jnp.sum(q_hat * q_hat, axis=-1, keepdims=True)
    k_sq = -0.5 * jnp.sum(k_hat * k_hat, axis=-1, keepdims=True)
    logits = jnp.einsum("hid,hjd->hij", q_hat, k_hat) + q_sq + jnp.swapaxes(k_sq, -1, -2)
    p = jnp.exp(jnp.minimum(logits, 0.0))
    denom = jnp.sum(p, axis=-1, keepdims=True) + DENOM_EPS
    return jnp.einsum("hij,hjd->hid", p, v) / denom


@partial(
    jax.jit,
    static_argnames=("block_size", "impl", "sort_pack"),
)
def hept_attention_core(
    q_hat: Array,
    k_hat: Array,
    v: Array,
    alpha: Array,
    codes: Array,
    invalid: Array | None = None,
    *,
    block_size: int,
    impl: str = "xla",
    sort_pack: bool = False,
) -> Array:
    """Full HEPT attention pipeline for one event (or vmap over events).

    Args:
      q_hat, k_hat: (h, n, d_hash) RPE-folded queries/keys (`prep_qk` output).
      v: (h, n, dv) values.
      alpha: (h, d_hash, c) frozen E2LSH directions.
      codes: (c, h, n) integer-valued AND codes (region [+ batch] packing),
        float or int dtype; scaled by the hash span and added to hash values.
      invalid: optional (n,) bool — rows whose sort key is pushed to +BIG so
        they group into trailing buckets (zero-pad or inert-pad rows).
      block_size: bucket size B; n must be a multiple of B.
      impl: "xla" | "pallas" bucket kernel selection.
    Returns:
      (h, n, dv) attention output (OR-combined over hashes, normalized).

    Pipeline parity: reference src/models/attention/hept.py:93-115 and
    example/hept.py:61-79, with the geo/batch shifts unified as
    `key = hash + code * hash_shift`.
    """
    q_hashed, k_hashed, hash_shift = lsh_mapping(alpha, q_hat, k_hat)
    codes = jax.lax.stop_gradient(codes).astype(jnp.float32)
    shift = codes * hash_shift  # (c, h, n)
    q_key = q_hashed + shift
    k_key = k_hashed + shift
    if invalid is not None:
        big = jnp.asarray(3.0e38, jnp.float32)
        q_key = jnp.where(invalid[None, None, :], big, q_key)
        k_key = jnp.where(invalid[None, None, :], big, k_key)

    c, h, n = q_key.shape
    d_hash = k_hat.shape[-1]
    dv = v.shape[-1]
    nb = n // block_size

    # Batch-folded sorts carry the feature columns through the sorting
    # network — no argsort, no gathers, no inverse permutation
    # (core/buckets.sort_carry). sort_pack=True moves them as bf16 pairs.
    sq_flat, q_src = sort_carry(q_key, q_hat, sort_pack)
    skv_flat, _ = sort_carry(k_key, jnp.concatenate([k_hat, v], axis=-1), sort_pack)
    sq = sq_flat.reshape(c, h, nb, block_size, d_hash)
    sk = skv_flat[..., :d_hash].reshape(c, h, nb, block_size, d_hash)
    sv = skv_flat[..., d_hash:].reshape(c, h, nb, block_size, dv)

    if impl == "pallas" and jax.default_backend() == "tpu":
        from .bucket_attn_pallas import bucket_rbf_attention_pallas

        denom, so = bucket_rbf_attention_pallas(sq, sk, sv)
    else:
        # CPU/GPU fall back to the einsum path (pallas-TPU kernels don't
        # lower on the host backend; tests exercise the kernel via
        # interpret mode separately).
        denom, so = bucket_rbf_attention_xla(sq, sk, sv)

    # one fused unsort of [numerator | denominator] keyed on carried indices.
    # The unsort stays f32 even when sort_pack: numerator/denominator sums
    # are the OR-combine accumulands and bf16 rounding there costs accuracy
    # for negligible time (25 columns once vs 84 twice).
    od = unsort_carry(
        q_src, jnp.concatenate([so, denom], axis=-1).reshape(c, h, n, dv + 1)
    )
    o, logits = od[..., :-1], od[..., -1:]
    return stable_ratio(o.sum(axis=0), logits.sum(axis=0))


def bucket_rbf_attention_cols_xla(sq: Array, sk: Array, sv: Array, block_size: int,
                                  precision=None):
    """Column-major per-bucket RBF attention, einsum path (CPU/golden).

    Args: sq, sk: (r, d, n); sv: (r, dv, n), n = nb * B. bf16 inputs run the
    MXU-native mixed-precision path (bf16 operands, f32 accumulation; p cast
    to bf16 for the value matmul) — used by the kernel_bf16 fast mode.
    Returns: (denom (r, 1, n), so (r, dv, n)) f32.
    """
    r, d, n = sq.shape
    dv = sv.shape[1]
    nb = n // block_size
    bf16 = sq.dtype == jnp.bfloat16
    q = sq.reshape(r, d, nb, block_size)
    k = sk.reshape(r, d, nb, block_size)
    v = sv.reshape(r, dv, nb, block_size)
    logits = jnp.einsum("rdgi,rdgj->rgij", q, k,
                        preferred_element_type=jnp.float32, precision=precision)
    qf = q.astype(jnp.float32) if bf16 else q
    kf = k.astype(jnp.float32) if bf16 else k
    q_sq = -0.5 * jnp.sum(qf * qf, axis=1)  # (r, nb, B)
    k_sq = -0.5 * jnp.sum(kf * kf, axis=1)
    logits = logits + q_sq[..., :, None] + k_sq[..., None, :]
    p = jnp.exp(jnp.minimum(logits, 0.0))
    denom = jnp.sum(p, axis=-1) + DENOM_EPS  # (r, nb, B)
    so = jnp.einsum("rdgj,rgij->rdgi", v, p.astype(sv.dtype) if bf16 else p,
                    preferred_element_type=jnp.float32, precision=precision)
    return denom.reshape(r, 1, n), so.reshape(r, dv, n)


@partial(jax.jit, static_argnames=("block_size", "impl", "sort_pack",
                                   "sort_ops", "unsort_pack", "hash_axis"))
def hept_attention_core_cols(
    q_hat: Array,
    k_hat: Array,
    v: Array,
    alpha: Array,
    codes: Array,
    invalid: Array | None = None,
    *,
    block_size: int,
    impl: str = "xla",
    sort_pack: bool = False,
    sort_ops: int = 1,
    unsort_pack: bool = False,
    hash_axis: str | None = None,
) -> Array:
    """Column-major HEPT attention pipeline (the TPU hot path).

    Same math as `hept_attention_core` (reference
    src/models/attention/hept.py:93-115 / example/hept.py:61-79) but all
    tensors travel as (d, n) columns — the layout both the batch-folded sort
    and the bucket kernels consume natively, so the pipeline has NO
    transposes, and the q̂ and k̂/v sorts ride ONE lax.sort call (each call
    costs ~75-85 ms on TPU at any size — calls, not bytes, are the budget).

    Args:
      q_hat, k_hat: (h, d_hash, n) RPE-folded queries/keys as columns.
      v: (h, dv, n) values as columns.
      alpha: (h, d_hash, c) frozen E2LSH directions.
      codes: (c, h, n) AND codes; invalid: optional (n,) bool.
    Returns: (h, dv, n) attention output columns.
    """
    # lsh_mapping math (hashing.py) in column layout
    both = jax.lax.stop_gradient(
        jnp.stack([
            jnp.einsum("hdc,hdn->chn", alpha, q_hat),
            jnp.einsum("hdc,hdn->chn", alpha, k_hat),
        ])
    )
    hash_shift = both.max(axis=(0, 3), keepdims=True) - both.min(
        axis=(0, 3), keepdims=True
    )
    q_hashed, k_hashed = both
    shift = jax.lax.stop_gradient(codes).astype(jnp.float32) * hash_shift[0]
    q_key = q_hashed + shift
    k_key = k_hashed + shift
    if invalid is not None:
        big = jnp.asarray(3.0e38, jnp.float32)
        q_key = jnp.where(invalid[None, None, :], big, q_key)
        k_key = jnp.where(invalid[None, None, :], big, k_key)

    c, h, n = q_key.shape
    d_hash = k_hat.shape[1]
    dv = v.shape[1]

    (sq, skv), (q_src, _) = grouped_sort_carry(
        [q_key, k_key],
        [q_hat, jnp.concatenate([k_hat, v], axis=1)],
        pack=sort_pack, n_ops=sort_ops,
    )
    sq = sq.reshape(c * h, d_hash, n)
    sk = skv[:, :, :d_hash].reshape(c * h, d_hash, n)
    sv = skv[:, :, d_hash:].reshape(c * h, dv, n)

    if impl in ("pallas", "hybrid", "hybrid2", "hybrid2l", "loop2", "slab",
                "slab2", "hybrid_slab") \
            and jax.default_backend() == "tpu":
        from .bucket_attn_pallas import bucket_rbf_attention_cols_pallas

        denom, so = bucket_rbf_attention_cols_pallas(
            sq, sk, sv, block_size=block_size, hybrid=impl)
    else:
        denom, so = bucket_rbf_attention_cols_xla(sq, sk, sv, block_size)

    od = jnp.concatenate([so, denom], axis=1).reshape(c, h, dv + 1, n)
    # By default the unsort stays f32 even when sort_pack: numerator and
    # denominator are the OR-combine accumulands and bf16 rounding there is
    # an accuracy/traffic trade-off. unsort_pack=True opts into bf16-packed
    # unsorting (explicit, consistent across both cols pipelines; the
    # inputs already moved as bf16 under sort_pack).
    (od_unsorted,), _ = grouped_sort_carry([q_src], [od], pack=unsort_pack,
                                           n_ops=sort_ops)
    o, logits = od_unsorted[:, :, :dv], od_unsorted[:, :, dv:]
    o_sum, l_sum = o.sum(axis=0), logits.sum(axis=0)
    if hash_axis is not None:
        # OR-combine across hash shards (intra-event hash parallelism,
        # parallel/tp.py): numerator/denominator sums ride ONE psum each.
        o_sum = jax.lax.psum(o_sum, hash_axis)
        l_sum = jax.lax.psum(l_sum, hash_axis)
    return stable_ratio(o_sum, l_sum)


def static_hash(x0_cols: Array, coords_cols: Array, alpha: Array,
                scale: float, variant: str, and_bins: int = 0) -> Array:
    """Layer-invariant bucket hashes for the `static_keys` fast mode.

    Hash ONCE per step in [x0|coords] space (x0 = encoder output), reused by
    every layer — vs the reference's per-layer re-hash of that layer's q/k
    projections (src/models/attention/hept.py:93-104). Divergence of the
    same family as shared_sort/share_heads; convergence-gated
    (scripts/validate_static_keys.py, PARITY.md divergences).

    Args:
      x0_cols: (d_model, n) encoder-output columns.
      coords_cols: (cd, n).
      alpha: (1 or 2, d_model + cd, c) E2LSH directions (two rows when
        and_bins > 0: primary + secondary).
      scale: coords-part weight (the init-time RPE scale
        sqrt(2 * num_w_per_dist); per-layer learned scales are unavailable
        outside the layers by construction).
      variant: "x0" hashes standardized x0 + scaled coords; "coords" hashes
        the scaled coords alone (pure geometric bucketing).
      and_bins: 0 = single 1-D hash per round. > 0 = AND-compose a SECOND
        independent direction, quantized into this many bins, above the
        primary hash: key = h1 + q2 * span(h1). At tracking-60k scale one
        region cell spans ~4 buckets and a single static direction yields
        buckets with poor locality in the unhashed dims — the measured
        cause of the 60k/lr=1e-2 training divergence (ROADMAP round-3).
        The AND bin subdivides cells along a second direction first, the
        same construction as the reference's region AND codes.
    Returns: (c, n) raw hash values (stop-gradded).
    """
    d_model = x0_cols.shape[0]

    def one(a):  # (d_model + cd, c) -> (c, n)
        a1, a2 = a[:d_model, :], a[d_model:, :]
        h = jnp.einsum("rc,rn->cn", scale * a2, coords_cols)
        if variant == "x0":
            mu = x0_cols.mean(axis=0, keepdims=True)
            sd = jnp.sqrt(
                ((x0_cols - mu) ** 2).mean(axis=0, keepdims=True) + 1e-6
            )
            h = h + jnp.einsum("ec,en->cn", a1, (x0_cols - mu) / sd)
        return h

    hashed = one(alpha[0])
    if and_bins:
        h2 = one(alpha[1])
        lo = h2.min(axis=1, keepdims=True)
        hi = h2.max(axis=1, keepdims=True)
        q2 = jnp.clip(
            jnp.floor((h2 - lo) / (hi - lo + 1e-12) * and_bins),
            0, and_bins - 1,
        )
        # strictly > (max - min): bin q's top key (h1=max) must land BELOW
        # bin q+1's bottom key (h1=min); with span exactly max-min the two
        # are bitwise equal and sort order at the boundary is arbitrary
        span = 1.001 * (
            hashed.max(axis=1, keepdims=True)
            - hashed.min(axis=1, keepdims=True)
        )
        hashed = hashed + q2 * span
    return jax.lax.stop_gradient(hashed)


@partial(jax.jit, static_argnames=("sort_events", "sort_pack", "sort_ops",
                                   "canonical", "coords_f32", "group_size",
                                   "group_sigma"))
def static_bucket_plan(
    hashed: Array,
    codes0: Array,
    invalid: Array | None,
    coords_cols: Array,
    *,
    sort_events: int = 1,
    sort_pack: bool = False,
    sort_ops: int = 1,
    canonical: bool = False,
    coords_f32: bool = False,
    group_size: int = 1,
    group_sigma: str = "morton",
):
    """Build the once-per-step bucket plan for `static_keys`.

    One sort call produces the per-round permutations `src` AND the sorted
    coords payload (layer-invariant: coords never change across layers); one
    more 1-operand sort inverts them. Every layer then reorders only its
    x-columns with `permute_gather` (~1.4 ms vs the ~6 ms sort) and reuses
    the sorted coords for the RPE columns.

    Args:
      hashed: (c, n) raw hash values (`static_hash`).
      codes0: (n,) or (c, n) AND codes (head 0 under share_heads).
      invalid: optional (n,) bool — rows pushed to trailing buckets.
      coords_cols: (cd, n).
      canonical: also compose every round's permutation with round 0's
        inverse, for the `canon_residual` fast mode where the residual
        stream itself rides in round-0 sorted order (the canonical order):
        f[r] = inv₀∘src_r maps a round-r sorted slot to its canonical
        position (f[0] = identity) and finv[r] = inv_r∘src₀ is its inverse.
        Round 0 then needs no per-layer x-gather and no output unsort.
      group_size: TRANSPORT GROUPS (>1; requires canonical=False). The
        per-row gather is ISSUE-RATE-bound on TPU (~14 ns/row regardless of
        row width up to ~10 KB — runs/r4 probe_unsort_r4: ~29 GB/s effective
        at 400 B rows), so the per-layer transport cost is the ROW COUNT,
        not bytes. This mode moves g points per gathered row: the model's
        storage order becomes round-0's full sorted order σ (spatially
        coherent — a bucket sort), groups are g CONSECUTIVE points in σ,
        and every round's permutation is computed at GROUP granularity
        (group key = min of member keys, in σ order), cutting the x-gather
        and [num|denom]-unsort row counts — fwd and bwd — by g×. A
        convergence-gated divergence: buckets are unions of σ-adjacent
        g-tight clusters, so per-round co-bucket composition coarsens
        (σ-adjacent points share region AND codes, so the perturbation is
        within-cell rank noise — measured by scripts/probe_cobucket.py
        group modes). Returns a 5-tuple (gsrc, ginv, scoords, src0, inv0):
        group-level (c, n_ev, ne/g) permutations, per-round sorted coords
        (c, n_ev, cd, ne), and the σ entry/exit maps (1, n_ev, ne).
    Returns:
      (src, inv, scoords): (c, n_ev, ne) i32 forward/inverse permutations
      and (c, n_ev, cd, ne) sorted coords (bf16 under sort_pack); with
      canonical=True a 5-tuple (src, inv, scoords, f, finv); with
      group_size>1 the 5-tuple documented above.
    """
    c, n = hashed.shape
    cd = coords_cols.shape[0]
    n_ev = sort_events
    ne = n // n_ev
    hash_shift = hashed.max(axis=1, keepdims=True) - hashed.min(
        axis=1, keepdims=True
    )
    codes_s = jax.lax.stop_gradient(codes0).astype(jnp.float32)
    if codes_s.ndim == 1:
        codes_s = codes_s[None]
    key = hashed + codes_s * hash_shift  # (c, n)
    if invalid is not None:
        key = jnp.where(invalid[None, :], jnp.asarray(3.0e38, jnp.float32), key)
    coords_rows = jnp.moveaxis(
        jax.lax.stop_gradient(coords_cols).reshape(cd, n_ev, ne), 1, 0
    )  # (n_ev, cd, ne)
    # coords_f32 (kernel_center): carry the sorted coords exactly — the RPE
    # noise floor is set by the coord transport rounding (error
    # sqrt_w·coord·2⁻⁸ vs signal sqrt_w·Δcoord), and the plan runs once per
    # step so the f32 payload costs ~3 extra sort operands total.
    eff_pack = False if coords_f32 else sort_pack
    if group_size > 1:
        assert not canonical, \
            "transport groups have their own storage order (σ)"
        g = group_size
        assert ne % g == 0, "ne must divide by group_size"
        ng = ne // g
        key3 = key.reshape(c, n_ev, ne)
        iota_n = jnp.broadcast_to(jnp.arange(ne, dtype=jnp.uint32), (n_ev, ne))
        if group_sigma == "morton":
            # σ = (region code, Morton(eta, phi)): groups are SPATIALLY
            # tight 2-D clusters within a region cell, so their per-round
            # hash keys stay close and grouping costs little recall —
            # round-0-σ groups are adjacent only in one 1-D hash and lose
            # 8 recall points where Morton-σ loses < 1 at bs512
            # (runs/r5/probe_sigma.log, probe_morton grid). 2-key sort
            # avoids f32-mantissa games with packed region codes.
            bits = 10
            e_ = coords_cols[0].reshape(n_ev, ne)
            p_ = coords_cols[1].reshape(n_ev, ne)

            def qz(a):  # (n_ev, ne) -> 10-bit ranks, invalid-safe
                big = jnp.isfinite(a) & (jnp.abs(a) < 1e30)
                lo = jnp.where(big, a, jnp.inf).min(axis=1, keepdims=True)
                hi = jnp.where(big, a, -jnp.inf).max(axis=1, keepdims=True)
                q = jnp.floor((a - lo) / (hi - lo + 1e-9) * (2 ** bits - 1))
                return jnp.clip(q, 0, 2 ** bits - 1).astype(jnp.int32)

            qe, qp = qz(e_), qz(p_)
            mort = jnp.zeros_like(qe)
            for i in range(bits):
                mort = mort | (((qe >> i) & 1) << (2 * i + 1))
                mort = mort | (((qp >> i) & 1) << (2 * i))
            cell = codes_s[0].reshape(n_ev, ne)
            if invalid is not None:
                inv2 = invalid.reshape(n_ev, ne)
                cell = jnp.where(inv2, jnp.asarray(3.0e38, jnp.float32), cell)
            _, _, src0 = jax.lax.sort(
                [cell, mort, iota_n], dimension=-1, num_keys=2,
                is_stable=False,
            )
        else:  # "round0": σ = round-0's full sorted order
            _, src0 = jax.lax.sort([key3[0], iota_n], dimension=-1,
                                   num_keys=1, is_stable=False)
        _, inv0 = jax.lax.sort([src0, iota_n], dimension=-1, num_keys=1,
                               is_stable=False)
        src0 = src0.astype(jnp.int32)
        inv0 = inv0.astype(jnp.int32)
        # all rounds' keys in σ order (minor-axis gather of c short rows)
        key_s = jnp.take_along_axis(
            key3, jnp.broadcast_to(src0[None], key3.shape), axis=-1
        )
        # group key = min over members: the one mixed valid/invalid boundary
        # group sorts by its valid member (invalid keys are +BIG)
        gkey = key_s.reshape(c, n_ev, ng, g).min(axis=-1)
        gsrc_f, ginv_f = _argsort_keys(gkey.reshape(c * n_ev, ng))
        gsrc = gsrc_f.reshape(c, n_ev, ng)
        ginv = ginv_f.reshape(c, n_ev, ng)
        # EXPANDED per-point permutations (relative to σ): the x/coords
        # side stays on the proven COLUMN gather (minor-axis
        # take_along_axis — no per-row fetch floor, and the projections
        # keep their transpose-free column einsums; feeding them ROW-major
        # sorted x costs a ~(ne, d)→(d, ne) relayout per round instance —
        # measured 351 ms vs 102 on the nh2r8bs512 arm, runs/r5
        # time_nh2r8bs512cv2rg2.log). Grouping buys its g× row win on the
        # [num|denom] UNSORT only, via gsrc/ginv.
        off = jnp.arange(g, dtype=jnp.int32)
        # slot s = q·g + r of round r's expanded order holds σ-point
        # gsrc[q]·g + r; σ-point p = q·g + r sits at slot ginv[q]·g + r —
        # both expansions share the same closed form (groups move as units)
        src_exp = (gsrc[..., None] * g + off).reshape(c, n_ev, ne)
        inv_exp = (ginv[..., None] * g + off).reshape(c, n_ev, ne)
        # σ-ordered coords, then per-round column gather by the expanded
        # perms (identical transport profile to the ungrouped plan path)
        coords_sig = jnp.take_along_axis(
            coords_rows, jnp.broadcast_to(src0[:, None, :], coords_rows.shape),
            axis=-1,
        )  # (n_ev, cd, ne) f32
        sc = permute_gather(
            coords_sig, src_exp, inv_exp, pack=eff_pack, out_bf16=eff_pack
        )  # (c, n_ev, cd, ne)
        return (src_exp, inv_exp, sc, gsrc, ginv, src0[None], inv0[None])
    (scoords,), (src,) = grouped_sort_carry(
        [key.reshape(c, n_ev, ne)], [coords_rows],
        pack=eff_pack, n_ops=sort_ops, out_bf16=eff_pack,
    )  # scoords (c, n_ev, cd, ne); src (c, n_ev, ne)
    iota = jnp.broadcast_to(
        jnp.arange(ne, dtype=jnp.uint32), (c * n_ev, ne)
    )
    _, inv = jax.lax.sort(
        [src.reshape(c * n_ev, ne).astype(jnp.uint32), iota],
        dimension=-1, num_keys=1, is_stable=False,
    )
    inv = inv.reshape(c, n_ev, ne).astype(jnp.int32)
    if not canonical:
        return src, inv, scoords
    # composed maps relative to the canonical (round-0) order:
    # f[r, b, s] = inv[0, b, src[r, b, s]]; finv[r, b, j] = inv[r, b, src[0, b, j]]
    f = jnp.take_along_axis(jnp.broadcast_to(inv[:1], src.shape), src, axis=2)
    finv = jnp.take_along_axis(inv, jnp.broadcast_to(src[:1], inv.shape), axis=2)
    return src, inv, scoords, f, finv


def _argsort_keys(keys2):
    """(R, ne) sort keys -> (src, inv) i32 permutations: slot s of the
    sorted order holds original row src[s]; original row j sits at sorted
    slot inv[j] (inv = argsort(src)). Two 2-operand lax.sorts — the
    comparator runs over a (keys, iota) pair only, never the payload."""
    R, ne = keys2.shape
    iota = jnp.broadcast_to(jnp.arange(ne, dtype=jnp.uint32), (R, ne))
    _, src = jax.lax.sort(
        [keys2, iota], dimension=-1, num_keys=1, is_stable=False
    )
    _, inv = jax.lax.sort(
        [src, iota], dimension=-1, num_keys=1, is_stable=False
    )
    return src.astype(jnp.int32), inv.astype(jnp.int32)


@partial(jax.jit, static_argnames=("block_size", "impl", "sort_pack",
                                   "sort_ops", "unsort_pack", "hash_axis",
                                   "shared_sort", "share_heads",
                                   "fold_unsort", "sort_events",
                                   "kernel_bf16", "canon", "kernel_center",
                                   "unsort_rows", "gather_sort",
                                   "plan_groups"))
def hept_attention_core_xcols(
    x_cols: Array,
    coords_cols: Array,
    wq: Array,
    wk: Array,
    wv: Array,
    sqrt_w: Array,
    alpha: Array,
    codes: Array,
    invalid: Array | None = None,
    plan=None,
    *,
    block_size: int,
    impl: str = "xla",
    sort_pack: bool = False,
    sort_ops: int = 1,
    unsort_pack: bool = False,
    hash_axis: str | None = None,
    shared_sort: bool = False,
    share_heads: bool = False,
    fold_unsort: bool = False,
    sort_events: int = 1,
    kernel_bf16: bool = False,
    canon: bool = False,
    kernel_center: bool = False,
    unsort_rows: bool = False,
    gather_sort: bool = False,
    plan_groups: int = 1,
) -> Array:
    """Post-sort-projection HEPT pipeline: sort the SHARED pre-projection
    activations instead of per-head q̂/k̂/v.

    The sort is the step's wall (BASELINE.md): `hept_attention_core_cols`
    moves q̂(d+cd) + k̂v(d+cd+dv) = 84 per-head columns per (hash, head)
    permutation. But q̂ = [W_q x, √(2w)·coords] is a per-head LINEAR function
    of the shared (x, coords), so sorting [x|coords] (30 columns) once per
    key order and applying W_q/W_k/W_v AFTER the sort moves 60 columns
    instead of 84 — and the LSH keys need no pre-sort q̂ at all, because the
    hash directions compose: α·q̂ = (W_qᵀ α₁)·x + (√(2w)⊙α₂)·coords.

    Numerically identical to `hept_attention_core_cols` up to fp32
    reordering (same math as reference hept.py:36-43,93-115; projections are
    bias-free, reference transformer.py:168-170).

    Args:
      x_cols: (d_model, n) shared pre-projection columns (normed hidden).
      coords_cols: (cd, n).
      wq, wk, wv: (h, d_model, d) per-head projection kernels (x.T @ w).
      sqrt_w: (h, cd) RPE column scales (prep_qk).
      alpha: (h, d + cd, c) frozen E2LSH directions — or (1, d_model + cd, c)
        directions in [x|coords] space under `share_heads`.
      codes: (c, h, n); invalid: optional (n,) bool.
      share_heads: TPU fast mode — ONE bucket grid per OR-hash round shared
        by all heads: keys hash the shared [x|coords] directly (per-hash
        directions, head-mean RPE scale, head-0 AND codes), so the sort and
        unsort run c comparator rows instead of c·h and the sorted
        [x|coords] payload is one copy instead of h (the 8x sort-traffic
        lever). Diverges from the reference's per-head hashing
        (hept.py:93-104, per-head alpha); convergence-validated like
        shared_sort (PARITY.md divergences). Implies shared_sort (q and k
        share the single key set).
      plan: optional (src, inv, scoords) from `static_bucket_plan` — the
        `static_keys` fast mode (requires share_heads). Keys were hashed
        ONCE per step outside the layers; this call skips the key
        computation and replaces the [x|coords] sort with a packed
        `permute_gather` of the x columns only (coords arrive pre-sorted in
        the plan), ~4x cheaper each direction (probe_gather_r3.py).
      sort_events: stacked flat batching — the flat n axis holds B events of
        n/B points each, and every event rides the sort's BATCH axis as its
        own comparator row(s) instead of one concatenated row. lax.sort's
        comparator cost is linear in rows but n·log n in row length
        (ROADMAP: B=2 at 60k cost 1.2x/event via the concatenated row), so
        stacking keeps flat batching linear in B. Buckets never cross events
        by construction (separate sort rows), so no batch-index AND codes
        are needed. n must be a multiple of sort_events · block_size.
      canon: canonical-residual fast mode (requires a 5-tuple `plan` from
        `static_bucket_plan(canonical=True)`): `x_cols` arrive — and the
        output returns — in round-0's sorted order (the canonical order the
        model keeps its residual stream in). Round 0 needs no x-gather and
        no output unsort; rounds 1.. use the plan's composed permutations.
        A pure storage reordering of the static_keys math: same buckets,
        same per-bucket sums, bitwise-equal output after reordering when
        packing is off (round 0 additionally skips the bf16 unsort rounding
        when unsort_pack is on — strictly less rounding).
      gather_sort: EXACT dynamic-key fast path — replace the payload-
        carrying variadic sorts (which move the whole [x|coords] payload
        through lax.sort, re-running the comparator per VMEM chunk and
        again in the VJP) with 2-operand ARGSORTS of the keys plus
        broadcast-source ROW GATHERS of the payload. Same placements, same
        f32 (or sort_pack bf16) rounding as the sort-carry; the VJP is a
        row gather too (no backward sort). The sorted payload stays
        ROW-major and the projections contract it directly, so no
        transpose back. No-op when a static `plan` is supplied (the plan
        paths already gather).
    Returns: (h, dv, n) attention output columns (canonical order under
    `canon`).
    """
    h, d_model, d = wq.shape
    cd = coords_cols.shape[0]
    c = alpha.shape[-1]
    n = x_cols.shape[-1]
    dv = wv.shape[-1]
    n_ev = sort_events  # event rows on the sort's batch axis
    assert n % n_ev == 0, "n must divide by sort_events"
    ne = n // n_ev

    if invalid is not None:
        keep = jnp.logical_not(invalid)[None, :]
        x_cols = jnp.where(keep, x_cols, 0.0)
        coords_cols = jnp.where(keep, coords_cols, 0.0)

    xc = jnp.concatenate([x_cols, coords_cols], axis=0)  # (d_xc, n)
    d_xc = d_model + cd
    # per-event payload rows for the sort's batch axis: (nb, d_xc, ne). The
    # minor (lane) axis n is untouched, so this is a cheap major-dim copy.
    xc_rows = jnp.moveaxis(xc.reshape(d_xc, n_ev, ne), 1, 0)
    # gather_sort: the payload source as point-major ROWS (one lane
    # transpose of the 30-column payload per call) — every sorted copy is a
    # broadcast-source row gather from this single copy.
    xc_r = (
        xc.reshape(d_xc, n_ev, ne).transpose(1, 2, 0)  # (n_ev, ne, d_xc)
        if gather_sort and plan is None else None
    )
    q_inv_flat = None  # gather_sort's q-side inverse, reused by unsort_rows
    # under sort_pack the sorted activations stay bf16 (they are bf16-rounded
    # by the pack anyway): the projection matmuls read half the bytes and the
    # MXU consumes bf16 natively (weights cast to bf16 for those matmuls)
    fmap = finv = None
    if plan is not None and canon:
        # canonical-residual: x arrives in round-0 sorted order; rounds 1..
        # gather by the composed canonical→round-r maps, round 0 is free.
        assert share_heads, "static_keys plan requires share_heads"
        src, inv_perm, scoords, fmap, finv = plan
        x_rows = jnp.moveaxis(x_cols.reshape(d_model, n_ev, ne), 1, 0)
        x0 = x_rows.astype(jnp.bfloat16) if sort_pack else x_rows
        if c > 1:
            sx_rest = permute_gather(
                x_rows, fmap[1:], finv[1:], pack=sort_pack, out_bf16=sort_pack
            )  # (c-1, n_ev, d_model, ne)
            sxs = jnp.concatenate([x0[None].astype(sx_rest.dtype), sx_rest],
                                  axis=0)
        else:
            sxs = x0[None]
        scs = scoords  # pre-sorted coords (bf16 under sort_pack)
        q_src = None
        sxk = sxq = None
    elif plan is not None and plan_groups > 1:
        # TRANSPORT GROUPS: x arrives in σ ((region code, Morton) sorted)
        # order. The x/coords side uses the SAME column gathers as the
        # ungrouped static path, just with the plan's EXPANDED per-point
        # permutations (minor-axis take_along_axis has no per-row fetch
        # floor, and the projections keep their transpose-free column
        # einsums — feeding them ROW-major sorted x costs a relayout per
        # round instance: 351 vs 102 ms on nh2r8bs512, runs/r5). The g×
        # row-count win applies where rows were the wall: the [num|denom]
        # UNSORT, which gathers ne/g rows of g·w_row columns via the
        # group-level perms (plan[3:5]).
        assert share_heads and unsort_rows and not canon, \
            "plan_groups requires share_heads + unsort_rows, no canon"
        src, inv_perm, scoords = plan[:3]  # EXPANDED (c, n_ev, ne)
        x_rows = jnp.moveaxis(x_cols.reshape(d_model, n_ev, ne), 1, 0)
        sxs = permute_gather(
            x_rows, src, inv_perm, pack=sort_pack, out_bf16=sort_pack
        )  # (c, n_ev, d_model, ne) columns
        scs = scoords
        q_src = None
        sxk = sxq = None
    elif plan is not None:
        # static_keys: permutations precomputed once per step; reorder the
        # x columns by gather, reuse the plan's pre-sorted coords.
        assert share_heads, "static_keys plan requires share_heads"
        src, inv_perm, scoords = plan[:3]
        x_rows = jnp.moveaxis(x_cols.reshape(d_model, n_ev, ne), 1, 0)
        sxs = permute_gather(
            x_rows, src, inv_perm, pack=sort_pack, out_bf16=sort_pack
        )  # (c, n_ev, d_model, ne)
        scs = scoords  # pre-sorted coords (bf16 under sort_pack)
        q_src = src
        sxk = sxq = None
    elif share_heads:
        # one hash per OR round in [x|coords] space, shared across heads
        a1, a2 = alpha[0, :d_model, :], alpha[0, d_model:, :]
        gamma = sqrt_w.mean(axis=0)[:, None] * a2  # (cd, c)
        hashed = jax.lax.stop_gradient(
            jnp.einsum("ec,en->cn", a1, x_cols)
            + jnp.einsum("rc,rn->cn", gamma, coords_cols)
        )  # (c, n)
        hash_shift = hashed.max(axis=1, keepdims=True) - hashed.min(
            axis=1, keepdims=True
        )
        codes_s = jax.lax.stop_gradient(codes[:, 0]).astype(jnp.float32)
        k_key = hashed + codes_s * hash_shift  # (c, n)
        if invalid is not None:
            big = jnp.asarray(3.0e38, jnp.float32)
            k_key = jnp.where(invalid[None, :], big, k_key)
        if gather_sort:
            srcf, q_inv_flat = _argsort_keys(k_key.reshape(c * n_ev, ne))
            sxk_r = permute_gather_rows(
                xc_r, srcf, q_inv_flat, pack=sort_pack
            )  # (c·n_ev, ne, d_xc) rows
            if sort_pack:
                # values are already bf16-rounded by the pack — the cast is
                # exact and keeps the projection matmuls bf16 like the
                # sort-carry path (out_bf16=sort_pack)
                sxk_r = sxk_r.astype(jnp.bfloat16)
            q_src = srcf.reshape(c, n_ev, ne)
            sxq = sxk = None
        else:
            (sxk,), (q_src,) = grouped_sort_carry(
                [k_key.reshape(c, n_ev, ne)], [xc_rows],
                pack=sort_pack, n_ops=sort_ops,
                out_bf16=sort_pack,
            )  # sxk (c, n_ev, d_xc, ne); q_src (c, n_ev, ne)
            sxq = sxk
    else:
        # Compose the hash projections through the (bias-free) q/k/v
        # projections: hash_q = (W_q^T alpha1) . x + (sqrt_w ⊙ alpha2) . coords.
        a1, a2 = alpha[:, :d, :], alpha[:, d:, :]
        beta_q = jnp.einsum("hed,hdc->hec", wq, a1)  # (h, d_model, c)
        beta_k = jnp.einsum("hed,hdc->hec", wk, a1)
        gamma = sqrt_w[:, :, None] * a2  # (h, cd, c)
        coord_hash = jnp.einsum("hrc,rn->chn", gamma, coords_cols)
        both = jax.lax.stop_gradient(
            jnp.stack([
                jnp.einsum("hec,en->chn", beta_q, x_cols) + coord_hash,
                jnp.einsum("hec,en->chn", beta_k, x_cols) + coord_hash,
            ])
        )
        hash_shift = both.max(axis=(0, 3), keepdims=True) - both.min(
            axis=(0, 3), keepdims=True
        )
        q_hashed, k_hashed = both
        shift = jax.lax.stop_gradient(codes).astype(jnp.float32) * hash_shift[0]
        q_key = q_hashed + shift
        k_key = k_hashed + shift
        if invalid is not None:
            big = jnp.asarray(3.0e38, jnp.float32)
            q_key = jnp.where(invalid[None, None, :], big, q_key)
            k_key = jnp.where(invalid[None, None, :], big, k_key)

    if share_heads:
        pass  # sorted above (single shared key set, one row per event)
    elif shared_sort:
        # TPU fast mode: bucket queries by the KEY hash order — one sorted
        # copy of [x|coords] serves q, k and v, halving the sort call's
        # comparator rows and payload operands (the call is ~60% of the
        # step; probe_sort_model.py). Divergence from the reference, which
        # argsorts q and k hashes separately (hept.py:103-104): a query
        # joins the bucket its own KEY hash falls in, so q/k bucket
        # composition is identical instead of independently chosen. The
        # n_hashes OR rounds still diversify the grouping; convergence is
        # validated on the synthetic tracking task (PARITY.md divergences).
        if gather_sort:
            srcf, q_inv_flat = _argsort_keys(k_key.reshape(c * h * n_ev, ne))
            sxk_r = permute_gather_rows(
                xc_r, srcf, q_inv_flat, pack=sort_pack
            )  # (c·h·n_ev, ne, d_xc) rows
            if sort_pack:
                sxk_r = sxk_r.astype(jnp.bfloat16)  # exact; see share_heads
            sxq_r = sxk_r
            q_src = srcf.reshape(c, h * n_ev, ne)
            sxq = sxk = None
        else:
            xcb = jnp.broadcast_to(
                xc_rows[None], (h, n_ev, d_xc, ne)
            ).reshape(h * n_ev, d_xc, ne)
            (sxk,), (q_src,) = grouped_sort_carry(
                [k_key.reshape(c, h * n_ev, ne)], [xcb],
                pack=sort_pack, n_ops=sort_ops,
                out_bf16=sort_pack,
            )
            sxq = sxk  # (c, h*n_ev, d_xc, ne)
    elif gather_sort:
        q_srcf, q_inv_flat = _argsort_keys(q_key.reshape(c * h * n_ev, ne))
        k_srcf, k_invf = _argsort_keys(k_key.reshape(c * h * n_ev, ne))
        sxq_r = permute_gather_rows(xc_r, q_srcf, q_inv_flat, pack=sort_pack)
        sxk_r = permute_gather_rows(xc_r, k_srcf, k_invf, pack=sort_pack)
        if sort_pack:
            sxq_r = sxq_r.astype(jnp.bfloat16)  # exact; see share_heads
            sxk_r = sxk_r.astype(jnp.bfloat16)
        q_src = q_srcf.reshape(c, h * n_ev, ne)
        sxq = sxk = None
    else:
        xcb = jnp.broadcast_to(
            xc_rows[None], (h, n_ev, d_xc, ne)
        ).reshape(h * n_ev, d_xc, ne)
        (sxq, sxk), (q_src, _) = grouped_sort_carry(
            [q_key.reshape(c, h * n_ev, ne), k_key.reshape(c, h * n_ev, ne)],
            [xcb, xcb], pack=sort_pack, n_ops=sort_ops,
            out_bf16=sort_pack,
        )  # each (c, h*n_ev, d_xc, ne)

    # kernel_bf16: the bucket kernels consume bf16 operands (MXU-native one-
    # pass dots, half the kernel HBM bytes); values are already bf16-rounded
    # by sort_pack, so the extra rounding is one post-projection quantize.
    ptype = jnp.bfloat16 if kernel_bf16 else jnp.float32

    # kernel_center: subtract a per-bucket mean from the RPE columns of BOTH
    # q̂ and k̂ before any bf16 cast. The RBF logits equal -½|q̂-k̂|², so a
    # common per-bucket shift is exact in f32; what it buys is precision —
    # bf16 rounds relative to the RAW sqrt_w·coord magnitude while the
    # signal is sqrt_w·Δcoord = O(bucket diameter), and once training grows
    # sqrt_w the local differences drown in rounding noise (the measured
    # kernel_bf16/sort_pack 60k instability; see TransformerConfig). Valid
    # only when q and k ride the same sorted copy (share_heads/shared_sort),
    # so the shift is common per bucket by construction.
    if kernel_center:
        assert share_heads or shared_sort, \
            "kernel_center needs a shared q/k bucket grid"

    def _center(rpe):  # (..., ne) f32; buckets contiguous along ne
        if not kernel_center:
            return rpe
        shp = rpe.shape
        b = rpe.reshape(shp[:-1] + (ne // block_size, block_size))
        mu = jax.lax.stop_gradient(b.mean(axis=-1, keepdims=True))
        return (b - mu).reshape(shp)

    if share_heads:
        # sorted rows are per (hash, event) and shared by all heads;
        # rows_in = the sorted x is ROW-major (gather_sort's flat row
        # gathers)
        rows_in = plan is None and gather_sort
        if rows_in:
            r4 = sxk_r.reshape(c, n_ev, ne, d_xc)
            sxs = r4[..., :d_model]  # ROWS (c, n_ev, ne, d_model)
            # coords flip to columns for the rpe concat (34 MB, cheap)
            scs = jnp.moveaxis(r4[..., d_model:], -1, -2)  # (c, n_ev, cd, ne)
        elif plan is None:
            sxs = sxk[:, :, :d_model]  # (c, n_ev, d_model, ne)
            scs = sxk[:, :, d_model:]  # (c, n_ev, cd, ne)

        # rpe columns are identical for q̂ and k̂ (both sqrt_w·coords of the
        # same sorted copy): compute + center once, reuse in both.
        rpe_sh = _center(
            sqrt_w[None, None, :, :, None]
            * scs[:, :, None].astype(jnp.float32)
        ).astype(ptype)  # (c, n_ev, h, cd, ne)

        def project(xs, w):
            proj = jnp.einsum(
                "hed,cbne->cbhdn" if rows_in else "hed,cben->cbhdn",
                w.astype(xs.dtype), xs,
                preferred_element_type=ptype,
            )  # (c, n_ev, h, d, ne)
            return jnp.concatenate([proj, rpe_sh], axis=3)

        sq = project(sxs, wq).reshape(c * n_ev * h, d + cd, ne)
        sk = project(sxs, wk).reshape(c * n_ev * h, d + cd, ne)
        sv = jnp.einsum(
            "hed,cbne->cbhdn" if rows_in else "hed,cben->cbhdn",
            wv.astype(sxs.dtype), sxs,
            preferred_element_type=ptype,
        ).reshape(c * n_ev * h, dv, ne)
    elif gather_sort:
        def project_r(sx_r, w):  # sx_r ROWS (c·h·n_ev, ne, d_xc)
            sx5 = sx_r.reshape(c, h, n_ev, ne, d_xc)
            xs, cs = sx5[..., :d_model], sx5[..., d_model:]
            proj = jnp.einsum(
                "hed,chbne->chbdn", w.astype(xs.dtype), xs,
                preferred_element_type=ptype,
            )  # (c, h, n_ev, d, ne)
            rpe = _center(
                sqrt_w[None, :, None, :, None]
                * jnp.moveaxis(cs, -1, -2).astype(jnp.float32)
            ).astype(ptype)
            return jnp.concatenate([proj, rpe], axis=3)

        sq = project_r(sxq_r, wq).reshape(c * h * n_ev, d + cd, ne)
        sk = project_r(sxk_r, wk).reshape(c * h * n_ev, d + cd, ne)
        sv = jnp.einsum(
            "hed,chbne->chbdn", wv.astype(sxk_r.dtype),
            sxk_r.reshape(c, h, n_ev, ne, d_xc)[..., :d_model],
            preferred_element_type=ptype,
        ).reshape(c * h * n_ev, dv, ne)
    else:
        def project(sx, w):  # sx (c, h*n_ev, d_xc, ne)
            sx = sx.reshape(c, h, n_ev, d_xc, ne)
            xs, cs = sx[:, :, :, :d_model], sx[:, :, :, d_model:]
            proj = jnp.einsum(
                "hed,chben->chbdn", w.astype(xs.dtype), xs,
                preferred_element_type=ptype,
            )  # (c, h, n_ev, d, ne)
            rpe = _center(
                sqrt_w[None, :, None, :, None] * cs.astype(jnp.float32)
            ).astype(ptype)
            return jnp.concatenate([proj, rpe], axis=3)

        sq = project(sxq, wq).reshape(c * h * n_ev, d + cd, ne)
        sk = project(sxk, wk).reshape(c * h * n_ev, d + cd, ne)
        sxk_x = sxk.reshape(c, h, n_ev, d_xc, ne)[:, :, :, :d_model]
        sv = jnp.einsum(
            "hed,chben->chbdn", wv.astype(sxk_x.dtype), sxk_x,
            preferred_element_type=ptype,
        ).reshape(c * h * n_ev, dv, ne)

    if impl in ("pallas", "hybrid", "hybrid2", "hybrid2l", "loop2", "slab",
                "slab2", "hybrid_slab") \
            and jax.default_backend() == "tpu":
        from .bucket_attn_pallas import bucket_rbf_attention_cols_pallas

        denom, so = bucket_rbf_attention_cols_pallas(
            sq, sk, sv, block_size=block_size, hybrid=impl)
    else:
        denom, so = bucket_rbf_attention_cols_xla(sq, sk, sv, block_size)

    # unsort precision: see hept_attention_core_cols. unsort_pack="fp8"
    # moves e4m3 quads + a bf16 last column — but the raw numerators exceed
    # e4m3's 448 max (e4m3fn has no inf: overflow converts to NaN; measured
    # loss=nan from step 1, scripts/validate_fp8_unsort.py), so the fp8
    # transport is RATIO-REPARAMETRIZED: carry [num/den | den] (the per-round
    # ratio is a convex combination of values, bounded by max|v|) and
    # reconstruct num = ratio · den after the unsort. Incompatible with
    # fold_unsort's head-interleaved column layout.
    assert not (fold_unsort and unsort_pack == "fp8"), \
        "fold_unsort interleaves heads; fp8 unsort needs denom-last groups"
    if unsort_pack == "fp8":
        od = jnp.concatenate([stable_ratio(so, denom), denom], axis=1)
    else:
        od = jnp.concatenate([so, denom], axis=1)  # (rows, dv + 1, ne)
    if unsort_rows:
        # ROW-MAJOR unsort: one lane transpose turns the per-point
        # [num|denom] of all heads into contiguous (h·(dv+1))-feature rows,
        # then the reorder is a flat ROW GATHER (contiguous 400-800 B
        # fetches on the sublane axis) instead of a minor-axis lax.sort —
        # ~2x the unsort wall (scripts/probe_unsort_row.py). The OR-combine,
        # ratio and output then STAY row-major: the consumer (out_linear)
        # reads (n, h·dv) rows, so the column pipeline's final
        # (h·dv, n) -> (n, h·dv) transpose disappears instead of coming
        # back. With a static plan the inverse permutations are precomputed
        # (under canon round 0 is free and rounds 1.. gather by the composed
        # canonical-position maps; without canon — e.g. the static_rounds
        # union stacks, where pinning round 0 would shrink the union — every
        # round gathers by its own inverse permutation); with DYNAMIC
        # per-step keys (the reference-parity per-head pipeline included)
        # the inverses come from one cheap 2-operand argsort of q_src.
        assert unsort_pack != "fp8", "unsort_rows: fp8 transport unsupported"

        def _argsort_rows(srcf):
            # inverse permutation of each (R, ne) row: one cheap 2-operand
            # u32 sort (vs the (dv+1)-operand payload-carrying unsort sort
            # it replaces, which re-runs the comparator per VMEM chunk).
            iota = jnp.broadcast_to(
                jnp.arange(srcf.shape[-1], dtype=jnp.uint32), srcf.shape
            )
            _, invf = jax.lax.sort(
                [srcf.astype(jnp.uint32), iota], dimension=-1, num_keys=1,
                is_stable=False,
            )
            return invf.astype(jnp.int32)

        if plan is None and not share_heads:
            # DYNAMIC keys, one permutation per (round, head, event) sort row
            # (the reference-parity per-head pipeline and shared_sort): the
            # natural position j of head g's round-r output is sorted slot
            # inv[r, g, j] with inv = argsort(q_src) — a flat row gather of
            # each head's [num|denom] rows, exact (f32 bitcast; bf16 pairs
            # under unsort_pack), same values/sum order as the sort-carry
            # unsort. Heads keep separate rows (their permutations differ).
            R = c * h * n_ev
            srcf = q_src.reshape(R, ne)
            invf = q_inv_flat if q_inv_flat is not None \
                else _argsort_rows(srcf)
            rows3 = jnp.swapaxes(
                od.reshape(R, dv + 1, ne), -1, -2
            )  # (R, ne, dv+1) — one lane transpose
            rows3 = permute_gather_rows(
                rows3, invf, srcf, pack=bool(unsort_pack)
            )
            comb = rows3.reshape(c, h, n_ev, ne, dv + 1).sum(axis=0)
            o_sum, l_sum = comb[..., :dv], comb[..., dv:]  # (h, n_ev, ne, ·)
            if hash_axis is not None:
                o_sum = jax.lax.psum(o_sum, hash_axis)
                l_sum = jax.lax.psum(l_sum, hash_axis)
            out = stable_ratio(o_sum, l_sum)  # (h, n_ev, ne, dv)
            return out.transpose(1, 2, 0, 3).reshape(n, h * dv)
        w_row = h * (dv + 1)
        od5 = od.reshape(c, n_ev, h, dv + 1, ne)
        rows4 = od5.transpose(0, 1, 4, 2, 3).reshape(c, n_ev, ne, w_row)
        if plan is None:
            # share_heads with per-step (dynamic) keys: all heads share the
            # per-(round, event) permutation — argsort q_src once, one
            # merged-row gather (same row layout as the static-plan path).
            srcf = q_src.reshape(c * n_ev, ne)
            invf = q_inv_flat if q_inv_flat is not None \
                else _argsort_rows(srcf)
            rows4 = permute_gather_rows(
                rows4.reshape(c * n_ev, ne, w_row), invf, srcf,
                pack=bool(unsort_pack),
            ).reshape(c, n_ev, ne, w_row)
        elif canon:
            if c > 1:
                # canonical position j takes round-r slot finv[r, j]; VJP
                # gathers back by fmap (its inverse).
                g = permute_gather_rows(
                    rows4[1:].reshape((c - 1) * n_ev, ne, w_row),
                    finv[1:].reshape((c - 1) * n_ev, ne),
                    fmap[1:].reshape((c - 1) * n_ev, ne),
                    pack=bool(unsort_pack),
                ).reshape(c - 1, n_ev, ne, w_row)
                rows4 = jnp.concatenate([rows4[:1], g], axis=0)
        elif plan_groups > 1:
            # transport groups: σ group j takes round-r group slot
            # ginv_g[r, j] — ne/g rows of g·w_row columns per round (issue-
            # rate-bound, so g× cheaper; the per-point rows of a group are
            # contiguous on both sides, so the reshapes are free).
            gsz = plan_groups
            ng = ne // gsz
            gsrc_g, ginv_g = plan[3], plan[4]  # group-level (c, n_ev, ng)
            rows4 = permute_gather_rows(
                rows4.reshape(c * n_ev, ng, gsz * w_row),
                ginv_g.reshape(c * n_ev, ng),
                gsrc_g.reshape(c * n_ev, ng),
                pack=bool(unsort_pack),
            ).reshape(c, n_ev, ne, w_row)
        else:
            # natural position j takes round-r sorted slot inv[r, j]; VJP
            # gathers back by src (its inverse).
            rows4 = permute_gather_rows(
                rows4.reshape(c * n_ev, ne, w_row),
                inv_perm.reshape(c * n_ev, ne),
                src.reshape(c * n_ev, ne),
                pack=bool(unsort_pack),
            ).reshape(c, n_ev, ne, w_row)
        combined = rows4.sum(axis=0).reshape(n_ev, ne, h, dv + 1)
        o_sum, l_sum = combined[..., :dv], combined[..., dv:]
        if hash_axis is not None:
            o_sum = jax.lax.psum(o_sum, hash_axis)
            l_sum = jax.lax.psum(l_sum, hash_axis)
        out = stable_ratio(o_sum, l_sum)  # (n_ev, ne, h, dv)
        return out.reshape(n, h * dv)  # ROW-major (consumer: out_linear)
    if canon:
        # canonical-residual: round 0's output is already in the canonical
        # order — only rounds 1.. ride the unsort (keyed by the composed
        # canonical-position maps), cutting the unsort's comparator rows and
        # payload by 1/c in both directions. Round 0 also skips the
        # unsort_pack bf16 rounding (strictly less rounding than the
        # static_keys path).
        od5 = od.reshape(c, n_ev, h, dv + 1, ne)
        if c == 1:
            od_unsorted = od5
        elif fold_unsort:
            od_f = od5[1:].reshape(c - 1, n_ev, h * (dv + 1), ne)
            (odu,), _ = grouped_sort_carry([fmap[1:]], [od_f],
                                           pack=unsort_pack, n_ops=sort_ops)
            od_unsorted = jnp.concatenate(
                [od5[:1], odu.reshape(c - 1, n_ev, h, dv + 1, ne)], axis=0
            )
        else:
            f_b = jnp.broadcast_to(
                fmap[1:, :, None], (c - 1, n_ev, h, ne)
            ).reshape(c - 1, n_ev * h, ne)
            (odu,), _ = grouped_sort_carry(
                [f_b], [od5[1:].reshape(c - 1, n_ev * h, dv + 1, ne)],
                pack=unsort_pack, n_ops=sort_ops,
            )
            od_unsorted = jnp.concatenate(
                [od5[:1], odu.reshape(c - 1, n_ev, h, dv + 1, ne)], axis=0
            )
    elif share_heads and fold_unsort:
        # all heads share the per-(hash, event) permutation: the unsort rides
        # c·n_ev comparator rows with every head's [num|denom] as payload
        # columns. CAVEAT: one lax.sort operand per packed column pair =>
        # ~h·(dv+1)/2 operands, and XLA TPU sort compile time scales
        # ~linearly in operand count (>10 min at ~100 operands) — opt-in
        # until the one-time compile is paid into the persistent cache.
        od_f = od.reshape(c, n_ev, h * (dv + 1), ne)
        (odu,), _ = grouped_sort_carry([q_src], [od_f], pack=unsort_pack,
                                       n_ops=sort_ops)
        od_unsorted = odu.reshape(c, n_ev, h, dv + 1, ne)
    elif share_heads:
        # broadcast the shared permutation to all heads: same call shape as
        # the per-head unsort (c·h·n_ev comparator rows, (dv+1)/2 operands)
        src_b = jnp.broadcast_to(
            q_src[:, :, None], (c, n_ev, h, ne)
        ).reshape(c, n_ev * h, ne)
        (odu,), _ = grouped_sort_carry(
            [src_b], [od.reshape(c, n_ev * h, dv + 1, ne)],
            pack=unsort_pack, n_ops=sort_ops,
        )
        od_unsorted = odu.reshape(c, n_ev, h, dv + 1, ne)
    else:
        (odu,), _ = grouped_sort_carry(
            [q_src], [od.reshape(c, h * n_ev, dv + 1, ne)],
            pack=unsort_pack, n_ops=sort_ops,
        )
        od_unsorted = odu.reshape(c, h, n_ev, dv + 1, ne).transpose(
            0, 2, 1, 3, 4
        )
    # (c, n_ev, h, dv + 1, ne)
    o, logits = od_unsorted[:, :, :, :dv], od_unsorted[:, :, :, dv:]
    if unsort_pack == "fp8":
        o = o * logits  # undo the ratio reparametrization: num = ratio * den
    o_sum, l_sum = o.sum(axis=0), logits.sum(axis=0)  # (n_ev, h, ·, ne)
    if hash_axis is not None:
        o_sum = jax.lax.psum(o_sum, hash_axis)
        l_sum = jax.lax.psum(l_sum, hash_axis)
    out = stable_ratio(o_sum, l_sum)  # (n_ev, h, dv, ne)
    return jnp.moveaxis(out, 0, 2).reshape(h, dv, n)
