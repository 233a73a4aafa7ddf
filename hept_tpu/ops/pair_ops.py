"""Windowed pair gather / scatter-add: the InfoNCE hot-path primitives.

The contrastive loss gathers ~1M pair-endpoint embeddings from ~60k rows and
scatter-adds their cotangents back every step. XLA lowers both to per-element
scatter/gather (~8 GB/s); these ops exploit the pack-time invariant
(`data/batching.py window_pad_pairs`): pairs are ANCHOR-SORTED and
partitioned into aligned 128-pair windows whose real anchors span < 128
consecutive rows. Each window then becomes a dense (pairs x window) one-hot
matmul against a dynamically sliced 256-row embedding window — MXU work at
~GFLOP scale instead of element-wise HBM scatter.

Semantics note: indices falling outside their window's 256-row span are
DROPPED by the TPU kernels (one-hot has no match). The pack-time invariant
guarantees this never happens for real (unmasked) pairs; window pads are
masked and carry zero cotangents. The CPU/XLA fallback is permissive (plain
take / segment_sum).

Layout: values travel as (d, E) columns, embeddings as (n, d) rows
(transposed around the kernels).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl

GROUP = 128  # pairs per window (must match window_pad_pairs)
WIN = 256  # embedding rows reachable per window (aligned slice)


def _starts_from_idx(idx: Array) -> Array:
    """Aligned window start per 128-pair group: align_down(first anchor)."""
    first = idx.reshape(-1, GROUP)[:, 0]
    return (first // GROUP) * GROUP


def _use_pallas(e: int | None = None) -> bool:
    if e is not None and e % GROUP:
        return False  # windowed layout requires whole 128-pair groups
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------- scatter-add
def _scatter_kernel(starts_ref, idx_ref, vals_ref, out_ref, *, t: int, d: int):
    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    groups = t // GROUP
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (GROUP, WIN), 1)
    for j in range(groups):
        start = starts_ref[pid * groups + j]
        idx_l = idx_ref[0, j * GROUP : (j + 1) * GROUP] - start  # (128,)
        onehot = (idx_l[:, None] == iota_w).astype(jnp.float32)  # (128p, 256w)
        part = jax.lax.dot_general(  # (d, 128p) @ (128p, 256w) -> (d, 256w)
            vals_ref[:, pl.ds(j * GROUP, GROUP)], onehot,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        win = pl.ds(pl.multiple_of(start, GROUP), WIN)
        out_ref[:, win] += part


def _scatter_add_tpu(vals_cols: Array, idx: Array, n: int) -> Array:
    from jax.experimental import pallas as pl_mod
    from jax.experimental.pallas import tpu as pltpu

    d, e = vals_cols.shape
    t = 8192 if e % 8192 == 0 else GROUP * max(1, min(64, e // GROUP))
    while e % t:
        t -= GROUP
    starts = _starts_from_idx(idx)
    n_pad = ((n + GROUP - 1) // GROUP) * GROUP + WIN
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(e // t,),
        in_specs=[
            pl_mod.BlockSpec((1, t), lambda i, s: (0, i),
                             memory_space=pltpu.VMEM),
            pl_mod.BlockSpec((d, t), lambda i, s: (0, i),
                             memory_space=pltpu.VMEM),
        ],
        out_specs=pl_mod.BlockSpec((d, n_pad), lambda i, s: (0, 0),
                                   memory_space=pltpu.VMEM),
    )
    out = pl_mod.pallas_call(
        functools.partial(_scatter_kernel, t=t, d=d),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((d, n_pad), jnp.float32),
    )(starts, idx.reshape(1, e), vals_cols)
    return out[:, :n]


# ---------------------------------------------------------------- gather
def _gather_kernel(starts_ref, idx_ref, emb_ref, out_ref, *, t: int, d: int):
    pid = pl.program_id(0)
    groups = t // GROUP
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (WIN, GROUP), 0)
    for j in range(groups):
        start = starts_ref[pid * groups + j]
        idx_l = idx_ref[0, j * GROUP : (j + 1) * GROUP] - start
        onehot = (iota_w == idx_l[None, :]).astype(jnp.float32)  # (256w, 128p)
        win = pl.ds(pl.multiple_of(start, GROUP), WIN)
        out_ref[:, pl.ds(j * GROUP, GROUP)] = jax.lax.dot_general(
            emb_ref[:, win], onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )


def _gather_tpu(emb_cols: Array, idx: Array) -> Array:
    from jax.experimental import pallas as pl_mod
    from jax.experimental.pallas import tpu as pltpu

    d, n = emb_cols.shape
    e = idx.shape[0]
    t = 8192 if e % 8192 == 0 else GROUP * max(1, min(64, e // GROUP))
    while e % t:
        t -= GROUP
    starts = _starts_from_idx(idx)
    n_pad = ((n + GROUP - 1) // GROUP) * GROUP + WIN
    emb_pad = jnp.pad(emb_cols, [(0, 0), (0, n_pad - n)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(e // t,),
        in_specs=[
            pl_mod.BlockSpec((1, t), lambda i, s: (0, i),
                             memory_space=pltpu.VMEM),
            pl_mod.BlockSpec((d, n_pad), lambda i, s: (0, 0),
                             memory_space=pltpu.VMEM),
        ],
        out_specs=pl_mod.BlockSpec((d, t), lambda i, s: (0, i),
                                   memory_space=pltpu.VMEM),
    )
    out = pl_mod.pallas_call(
        functools.partial(_gather_kernel, t=t, d=d),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((d, e), jnp.float32),
    )(starts, idx.reshape(1, e), emb_pad)
    return out


# ------------------------------------------------------- public custom-vjp ops
@jax.custom_vjp
def pair_gather(emb: Array, idx: Array) -> Array:
    """emb (n, d) gathered at windowed anchor-sorted idx (E,) -> (E, d).

    VJP scatter-adds the cotangents with the windowed MXU kernel instead of
    XLA's element scatter (the InfoNCE backward's dominant cost).
    """
    if _use_pallas(idx.shape[0]):
        return _gather_tpu(emb.T, idx).T
    return jnp.take(emb, idx, axis=0)


def _pair_gather_fwd(emb, idx):
    return pair_gather(emb, idx), (idx, emb.shape[0])


def _pair_gather_bwd(res, g):
    idx, n = res
    if _use_pallas(idx.shape[0]):
        d_emb = _scatter_add_tpu(g.T, idx, n).T
    else:
        d_emb = jax.ops.segment_sum(g, idx, num_segments=n)
    return d_emb, None


pair_gather.defvjp(_pair_gather_fwd, _pair_gather_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def anchor_segment_sum(vals: Array, idx: Array, n: int) -> Array:
    """Sum vals (E,) into (n,) segments keyed by windowed anchor idx."""
    if _use_pallas(idx.shape[0]):
        return _scatter_add_tpu(vals[None, :], idx, n)[0]
    return jax.ops.segment_sum(vals, idx, num_segments=n)


def _anchor_sum_fwd(vals, idx, n):
    return anchor_segment_sum(vals, idx, n), idx


def _anchor_sum_bwd(n, res, g):
    idx = res
    if _use_pallas(idx.shape[0]):
        d_vals = _gather_tpu(g[None, :], idx)[0]
    else:
        d_vals = jnp.take(g, idx)
    return d_vals, None


anchor_segment_sum.defvjp(_anchor_sum_fwd, _anchor_sum_bwd)


@jax.custom_vjp
def partner_gather(emb: Array, p1: Array, p0: Array, rev: Array,
                   mask: Array) -> Array:
    """emb (n, d) gathered at the PARTNER index p1 (E,) -> (E, d).

    p1 is arbitrary (not windowed), so the forward is a plain take; the
    backward's scatter-add by p1 — XLA's element scatter, the loss
    backward's dominant cost — is rewritten via the pack-time reverse-pair
    index (`data/batching.py _pair_rev_index`):

        d_emb[i] = Σ_{e: p1[e]=i} g[e]  =  Σ_{e': p0[e']=i} g[rev[e']]

    (substitute e = rev[e']; p1[rev[e']] = p0[e'] because rev maps each real
    pair to its reverse, and the real pair set is reversal-closed). The right
    side is an ANCHOR-side scatter, which rides the windowed MXU kernel.
    Pad slots are masked out of the reversed cotangents (their own cotangent
    is zero, but rev[pad] aliases a real pair).
    """
    del p0, rev, mask
    return jnp.take(emb, p1, axis=0)


def _partner_gather_fwd(emb, p1, p0, rev, mask):
    return jnp.take(emb, p1, axis=0), (p1, p0, rev, mask, emb.shape[0])


def _partner_gather_bwd(res, g):
    p1, p0, rev, mask, n = res
    if _use_pallas(p1.shape[0]):
        g_rev = jnp.where(mask[:, None], jnp.take(g, rev, axis=0), 0.0)
        d_emb = _scatter_add_tpu(g_rev.T, p0, n).T
    else:
        d_emb = jax.ops.segment_sum(g, p1, num_segments=n)
    return d_emb, None, None, None, None


partner_gather.defvjp(_partner_gather_fwd, _partner_gather_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def pair_l2rbf_sim(emb: Array, p0: Array, p1: Array, rev: Array,
                   mask: Array, sigma: float = 0.75) -> Array:
    """Per-pair RBF similarity sim_e = exp(-|e0-e1| / (2σ²)) with a
    symmetry-folded backward.

    For a symmetric similarity sim(x, y) = f(|x-y|), the p1-side gradient
    contribution Σ_e c_e · ∂sim_e/∂e1 at row p1[e] equals, by substituting
    each pair's reverse (x and y swap, the coefficient comes from the
    reversed pair), Σ_e c_rev[e] · ∂sim_e/∂e0 at row p0[e]. The whole
    backward is therefore ONE anchor-side windowed scatter of
    (c_e + c_rev[e]) ⊙ ∂sim_e/∂e0 — the reverse lookup moves a SCALAR (E,)
    instead of the (E, d) cotangent rows (9.7 ms -> ~0.8 at tracking-60k
    shapes, scripts/probe_loss4 canary), and no separate p1 scatter exists.

    Requires the pack-time reversal-closed windowed pair layout
    (data/batching.py). Pads produce finite sims with zero cotangent flow.
    """
    e0 = pair_gather(emb, p0) if _use_pallas(p0.shape[0]) else emb[p0]
    e1 = jnp.take(emb, p1, axis=0)
    d = jnp.sqrt(jnp.sum((e0 - e1) ** 2, axis=-1) + 1e-12)
    return jnp.exp(-d / (2 * sigma**2))


def _pair_sim_fwd(emb, p0, p1, rev, mask, sigma):
    if _use_pallas(p0.shape[0]):
        e0 = _gather_tpu(emb.T, p0).T
    else:
        e0 = emb[p0]
    e1 = jnp.take(emb, p1, axis=0)
    diff = e0 - e1
    d = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
    sim = jnp.exp(-d / (2 * sigma**2))
    return sim, (diff, d, sim, p0, p1, rev, mask, emb.shape[0])


def _pair_sim_bwd(sigma, res, c):
    diff, d, sim, p0, p1, rev, mask, n = res
    # v_e = ∂sim/∂e0 = -sim / (2σ² d) · (e0 - e1)
    g = (-sim / (2 * sigma**2 * d))[:, None] * diff  # (E, d)
    if _use_pallas(p0.shape[0]):
        c2 = jnp.where(mask, c + jnp.take(c, rev), 0.0)
        d_emb = _scatter_add_tpu((c2[:, None] * g).T, p0, n).T
    else:
        cg = c[:, None] * g
        d_emb = jax.ops.segment_sum(cg, p0, num_segments=n)
        d_emb = d_emb + jax.ops.segment_sum(-cg, p1, num_segments=n)
    return d_emb, None, None, None, None


pair_l2rbf_sim.defvjp(_pair_sim_fwd, _pair_sim_bwd)
