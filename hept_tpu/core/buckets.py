"""Sort/gather plumbing: AND-code packing, bucket sort, inverse permutation.

Rebuilds the reference's sort-to-buckets pipeline
(`/root/reference/src/models/attention/hept.py:9-19`,
`/root/reference/src/models/model_utils/hash_utils.py:42-89`,
`/root/reference/example/transformer.py:10-13`) with XLA-friendly primitives:
batch-folded two-operand sorts that stream payload columns through the sort
(`_folded_sort`; constant compile cost, no gathers) plus flat-row gather and
scatter-invert fallbacks used by tests and non-hot paths.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax import Array


def bit_shift(base: Array, shift_idx: Array) -> Array:
    """Pack `shift_idx` into the high bits above `base`.

    `num_bits = ceil(log2(max(base) + 1))` per row (axis 1 of a (R, n) array),
    then `(shift_idx << num_bits) | base` — the example variant's AND-code
    packing (example/transformer.py:10-13), used to fold the batch index into
    the sort key for flat ragged batches.
    """
    base = base.astype(jnp.int32)
    shift_idx = shift_idx.astype(jnp.int32)
    max_base = base.max(axis=1, keepdims=True)
    num_bits = jnp.ceil(jnp.log2(max_base.astype(jnp.float32) + 1.0)).astype(jnp.int32)
    return jnp.left_shift(shift_idx, num_bits) | base


def invert_permutation(perm: Array) -> Array:
    """O(n) inverse of a permutation along the last axis.

    `inv[perm[i]] = i` — the scatter formulation of
    reference hash_utils.py:42-53 / example/hept_utils.py:50-61.
    """
    n = perm.shape[-1]
    ar = jnp.arange(n, dtype=perm.dtype)
    if perm.ndim == 1:
        return jnp.zeros_like(perm).at[perm].set(ar)
    flat = perm.reshape(-1, n)
    inv = jax.vmap(lambda p: jnp.zeros_like(p).at[p].set(ar))(flat)
    return inv.reshape(perm.shape)


def gather_rows(x: Array, perm: Array) -> Array:
    """Permute rows of per-(hash, head) feature arrays, fast on TPU.

    Args:
      x: (h, n, d) (shared across OR-hashes) or (c, h, n, d).
      perm: (c, h, n) row indices into the n axis.
    Returns: (c, h, n, d).

    Implementation note: XLA's TPU lowering of `take_along_axis` on a
    broadcast (c, h, n, d) operand runs at a few GB/s; flattening to 2-D and
    indexing rows with a flat integer array is ~5x faster (same bytes, a
    gather the compiler recognizes as contiguous row fetches) — see
    scripts/profile_gather.py.
    """
    c, h, n = perm.shape
    d = x.shape[-1]
    if x.ndim == 3:
        flat = x.reshape(h * n, d)
        offs = (jnp.arange(h, dtype=perm.dtype) * n)[None, :, None]
    else:
        flat = x.reshape(c * h * n, d)
        offs = (jnp.arange(c * h, dtype=perm.dtype) * n).reshape(c, h, 1)
    fidx = (perm + offs).reshape(-1)
    return flat[fidx].reshape(c, h, n, d)


def _float0_zero(x):
    import numpy as np

    return np.zeros(x.shape, dtype=jax.dtypes.float0)


def _payload_to_u32_rows(payload: Array, pack: bool) -> tuple[Array, int]:
    """(c, h, n, d) float payload -> (c, h, D, n) u32 'column rows' for the
    batch-folded sort. pack=True packs adjacent column pairs as bf16 into one
    u32 (half the bytes, ~0.4% relative rounding); pack=False bitcasts f32
    exactly (D == d)."""
    c, h, n, d = payload.shape
    if pack:
        if d % 2:
            payload = jnp.pad(payload, [(0, 0)] * 3 + [(0, 1)])
        pairs = payload.astype(jnp.bfloat16).reshape(c, h, n, -1, 2)
        u32 = jax.lax.bitcast_convert_type(pairs, jnp.uint32)  # (c,h,n,D)
    else:
        u32 = jax.lax.bitcast_convert_type(
            payload.astype(jnp.float32), jnp.uint32
        )
    return jnp.swapaxes(u32, -1, -2), d


def _u32_rows_to_payload(rows: Array, d: int, pack: bool) -> Array:
    """Inverse of `_payload_to_u32_rows` ((c, h, D, n) -> (c, h, n, d))."""
    u32 = jnp.swapaxes(rows, -1, -2)  # (c,h,n,D)
    if pack:
        pairs = jax.lax.bitcast_convert_type(u32, jnp.bfloat16)  # (c,h,n,D,2)
        out = pairs.reshape(*u32.shape[:-1], -1).astype(jnp.float32)
        return out[..., :d]
    return jax.lax.bitcast_convert_type(u32, jnp.float32)


def _folded_sort(keys: Array, payload: Array, pack: bool, with_iota: bool):
    """Sort payload rows by keys as ONE two-operand XLA sort.

    Each payload column is bitcast to a u32 row stacked on a new batch axis,
    and the keys are broadcast across that axis, so XLA sees a 2-operand sort
    over (c, h, D[+1], n) — batch dims sort independently but identical keys
    produce identical permutations per column. XLA sort *compile* time on
    TPU scales with operand count (~20 s at 2 operands vs >10 min at 87 at
    60k points), while runtime scales with bytes; this formulation gets the
    streaming-sort runtime (no gathers) at constant compile cost, ~2x the
    bytes of the ideal variadic sort for the duplicated keys
    (scripts/profile_gather.py, /tmp canaries 2026-08).

    Tie safety: key ties can order payload columns differently per batch row,
    but ties only occur for padding rows (identical +BIG keys) and
    replication pads (exact duplicates of a real row) — in both cases the
    tied rows carry identical payloads, so any per-column resolution yields
    the same result.
    """
    c, h, n = keys.shape
    rows, d = _payload_to_u32_rows(payload, pack)
    if with_iota:
        iota = jnp.broadcast_to(
            jnp.arange(n, dtype=jnp.uint32), (c, h, 1, n)
        )
        rows = jnp.concatenate([rows, iota], axis=2)
    kb = jnp.broadcast_to(keys[:, :, None, :], rows.shape)
    # XLA's TPU sort runs 2-D batches at full speed but hits a ~50-250x
    # slow path on >=3-D operands (measured: (2136, 61440) 90 ms vs
    # (24, 89, 61440) 23 s) — flatten the batch dims around the call.
    flat = (rows.shape[0] * rows.shape[1] * rows.shape[2], rows.shape[3])
    _, sorted_flat = jax.lax.sort(
        [kb.reshape(flat), rows.reshape(flat)],
        dimension=-1, num_keys=1, is_stable=False,
    )
    sorted_rows = sorted_flat.reshape(rows.shape)
    src = None
    if with_iota:
        src = sorted_rows[:, :, -1, :].astype(jnp.int32)
        sorted_rows = sorted_rows[:, :, :-1, :]
    return _u32_rows_to_payload(sorted_rows, d, pack), src


def _cols_to_u32(cols: Array, pack) -> tuple[Array, int]:
    """(c, h, d, n) float column payload -> (c, h, D, n) u32 rows (no
    transpose; column layout is the native sort layout).

    pack modes: False = exact f32 bitcast (D == d); True = adjacent column
    PAIRS as bf16 into u32 (half the bytes, ~0.4% rounding); "fp8" = all but
    the LAST column as float8_e4m3fn QUADS into u32 (quarter the bytes, ~6%
    rounding) with the last column as a bf16 pair — the [numerator | denom]
    unsort encoding (the denominator must keep bf16 range: e4m3 flushes the
    1e-20 eps floor to zero)."""
    c, h, d, n = cols.shape
    if pack == "fp8":
        num, den = cols[:, :, :-1], cols[:, :, -1:]
        pad4 = (-num.shape[2]) % 4
        if pad4:
            num = jnp.pad(num, [(0, 0), (0, 0), (0, pad4), (0, 0)])
        f8 = num.astype(jnp.float8_e4m3fn).reshape(c, h, -1, 4, n)
        f8 = jnp.swapaxes(f8, -2, -1)  # (c,h,D8,n,4)
        u_num = jax.lax.bitcast_convert_type(f8, jnp.uint32)  # (c,h,D8,n)
        bf = jnp.concatenate(
            [den.astype(jnp.bfloat16), jnp.zeros_like(den, jnp.bfloat16)],
            axis=2,
        ).reshape(c, h, 1, 2, n)
        u_den = jax.lax.bitcast_convert_type(
            jnp.swapaxes(bf, -2, -1), jnp.uint32
        )  # (c,h,1,n)
        return jnp.concatenate([u_num, u_den], axis=2), d
    if pack:
        if d % 2:
            cols = jnp.pad(cols, [(0, 0), (0, 0), (0, 1), (0, 0)])
        bf = cols.astype(jnp.bfloat16).reshape(c, h, -1, 2, n)
        # pair the two bf16 rows along a trailing unit axis for the bitcast
        bf = jnp.swapaxes(bf, -2, -1)  # (c,h,D,n,2)
        u32 = jax.lax.bitcast_convert_type(bf, jnp.uint32)  # (c,h,D,n)
    else:
        u32 = jax.lax.bitcast_convert_type(cols.astype(jnp.float32), jnp.uint32)
    return u32, d


def _u32_to_cols(rows: Array, d: int, pack, out_bf16: bool = False) -> Array:
    """Inverse of `_cols_to_u32`. out_bf16 skips the f32 upcast (the values
    are bf16-rounded under pack anyway): downstream matmuls read half the
    bytes and feed the MXU natively."""
    if pack == "fp8":
        u_num, u_den = rows[:, :, :-1], rows[:, :, -1:]
        f8 = jax.lax.bitcast_convert_type(u_num, jnp.float8_e4m3fn)
        f8 = jnp.swapaxes(f8, -2, -1)  # (c,h,D8,4,n)
        num = f8.reshape(*rows.shape[:2], -1, rows.shape[-1])[:, :, :d - 1]
        den = jax.lax.bitcast_convert_type(u_den, jnp.bfloat16)[..., 0]
        return jnp.concatenate(
            [num.astype(jnp.float32), den.astype(jnp.float32)], axis=2
        )
    if pack:
        bf = jax.lax.bitcast_convert_type(rows, jnp.bfloat16)  # (c,h,D,n,2)
        bf = jnp.swapaxes(bf, -2, -1)  # (c,h,D,2,n)
        out = bf.reshape(*rows.shape[:2], -1, rows.shape[-1])
        if not out_bf16:
            out = out.astype(jnp.float32)
        return out[:, :, :d]
    return jax.lax.bitcast_convert_type(rows, jnp.float32)


# Max payload operands per variadic lax.sort call (see chunking note below).
# XLA scopes ~0.5 MB VMEM per operand with a 16 MB budget (hard fail at 32
# operands, measured); 20 is the validated-safe default. Env-overridable so
# the parity-mode chunk-size experiment (fewer comparator re-runs per f32
# 25-31-operand group) can A/B without a code change.
import os as _os

_MAX_SORT_OPS = int(_os.environ.get("HEPT_MAX_SORT_OPS", "20"))


def _grouped_sort_impl(keys_list, payload_list, pack, n_ops=1,
                       out_bf16=False):
    """Sort several column-payload groups, each by its own keys, with
    VARIADIC multi-operand lax.sort calls: one operand per u32 payload row
    plus an iota operand, groups with equal row counts stacked onto one call.

    Round-2 finding, re-measured honestly in scripts/probe_sort_model.py
    (probe_variadic_sort.py's first numbers were DCE artifacts — it only
    consumed one operand): at tracking-60k shapes (24 batch rows, n=60000)
    a sort call costs ~3.9 ms for the comparator alone plus ~0.39 ms per
    u32 payload operand, linear in batch rows, with a ~4-5 ms per-call
    floor. The round-1 batch-folded formulation (payload rows stacked on
    the batch axis with duplicated keys) re-ran the comparator once per
    payload row: 32.2 ms vs 9.75 ms for the equivalent 16-operand variadic
    call — 3.3x. Compile time grows ~linearly with operand count (~15-30
    operands here, cached persistently).

    `n_ops` is accepted for API compatibility and ignored."""
    del n_ops
    c, h, n = keys_list[0].shape
    prepped = []  # (key_rows (c*h, n), u32 rows list, d, meta)
    for keys, cols in zip(keys_list, payload_list):
        if cols.ndim == 2:  # (d, n): shared across hashes AND heads
            cols = jnp.broadcast_to(cols[None, None], (c, h) + cols.shape)
        elif cols.ndim == 3:  # (h, d, n): shared across hashes
            cols = jnp.broadcast_to(cols[None], (c,) + cols.shape)
        u32, d = _cols_to_u32(cols, pack)  # (c, h, D, n)
        rows = [u32[:, :, j].reshape(c * h, n) for j in range(u32.shape[2])]
        rows.append(
            jnp.broadcast_to(jnp.arange(n, dtype=jnp.uint32), (c * h, n))
        )
        prepped.append([keys.reshape(c * h, n), rows, d])

    # one lax.sort per distinct row count; equal-width groups stack rows.
    # Calls are CHUNKED to at most _MAX_SORT_OPS payload operands: XLA's TPU
    # sort scopes ~0.5 MB of VMEM per operand and hard-fails past ~31
    # operands at 60k points ("scoped vmem limit exceeded", hit by the f32
    # reference-parity config), and compile time grows ~5 s/operand. Chunks
    # share the keys, so every chunk applies the same permutation — key ties
    # occur only between rows with identical payloads (padding / replicate
    # duplicates), where any per-chunk resolution yields identical bytes
    # (see _folded_sort's tie-safety note).
    outs = [None] * len(prepped)
    srcs = [None] * len(prepped)
    by_width: dict = {}
    for gi, (kr, rows, d) in enumerate(prepped):
        by_width.setdefault(len(rows), []).append(gi)
    for width, gis in by_width.items():
        keys_st = jnp.concatenate([prepped[gi][0] for gi in gis], axis=0)
        cols = [
            jnp.concatenate([prepped[gi][1][j] for gi in gis], axis=0)
            for j in range(width)
        ]
        sorted_cols = []
        for ci, lo in enumerate(range(0, width, _MAX_SORT_OPS)):
            chunk = cols[lo : lo + _MAX_SORT_OPS]
            k = keys_st
            if ci:
                # XLA's sort-merger CSE re-fuses same-key sorts into one
                # variadic call (measured on TPU: two 4-op sorts compiled to
                # one 7-op sort), undoing the chunking and re-busting scoped
                # VMEM. A per-chunk order-preserving key transform defeats
                # it: f32 *2**ci multiplies the exponent exactly (pads
                # saturate to +inf together — identical payloads, tie-safe);
                # int +ci shifts unique indices uniformly.
                k = (
                    keys_st * jnp.float32(2.0**ci)
                    if jnp.issubdtype(keys_st.dtype, jnp.floating)
                    else keys_st + jnp.asarray(ci, keys_st.dtype)
                )
            sorted_cols.extend(
                jax.lax.sort(
                    [k] + chunk, dimension=-1, num_keys=1,
                    is_stable=False,
                )[1:]
            )
        for sl, gi in enumerate(gis):
            d = prepped[gi][2]
            rows_s = [
                op[sl * c * h : (sl + 1) * c * h] for op in sorted_cols
            ]
            srcs[gi] = rows_s[-1].reshape(c, h, n).astype(jnp.int32)
            grp = jnp.stack(rows_s[:-1], axis=1).reshape(c, h, width - 1, n)
            outs[gi] = _u32_to_cols(grp, d, pack, out_bf16)
    return outs, srcs


def _make_grouped_sort_carry(pack: bool, n_groups: int, n_ops: int,
                             out_bf16: bool = False):
    @jax.custom_vjp
    def f(keys_tuple, payload_tuple):
        outs, srcs = _grouped_sort_impl(
            list(keys_tuple), list(payload_tuple), pack, n_ops, out_bf16
        )
        return tuple(outs), tuple(srcs)

    def fwd(keys_tuple, payload_tuple):
        outs, srcs = _grouped_sort_impl(
            list(keys_tuple), list(payload_tuple), pack, n_ops, out_bf16
        )
        in_ndim = tuple(p.ndim for p in payload_tuple)
        return (tuple(outs), tuple(srcs)), (tuple(srcs), keys_tuple, in_ndim)

    def bwd(res, cotangents):
        srcs, keys_tuple, in_ndim = res
        g_outs, _ = cotangents
        # sorted[s] = payload[src[s]] => d payload = unsort(g) = re-sort g on
        # src. All groups ride the SAME backward sort call. Broadcast
        # payloads ((h,d,n) over hashes; (d,n) over hashes and heads) sum
        # their cotangents over the broadcast axes.
        gps, _ = _grouped_sort_impl(list(srcs), list(g_outs), pack, n_ops)
        gps = [
            g.sum(axis=(0, 1)) if nd == 2 else (g.sum(axis=0) if nd == 3 else g)
            for g, nd in zip(gps, in_ndim)
        ]
        gks = tuple(
            _float0_zero(k)
            if jnp.issubdtype(k.dtype, jnp.integer)
            else jnp.zeros_like(k)
            for k in keys_tuple
        )
        return gks, tuple(gps)

    f.defvjp(fwd, bwd)
    return f


_grouped_sort_carry_cache: dict = {}


def grouped_sort_carry(keys_list, payload_list, pack: bool = False,
                       n_ops: int = 1, out_bf16: bool = False):
    """Sort several column-payload groups, each by its own keys, in ONE XLA
    sort call (each lax.sort costs ~75-85 ms on TPU regardless of size or
    payload width — the per-call latency, not bytes, is the budget).

    Args:
      keys_list: list of (c, h, n) sort keys (float or int; unsort = pass the
        src indices back as keys).
      payload_list: matching list of (c, h, d_i, n) column payloads
        ((h, d_i, n) broadcasts over hashes).
      pack: False = exact f32; True = bf16 pairs (half the traffic, bf16
        rounding); "fp8" = e4m3 quads for all but the last column + bf16
        last column (quarter traffic; the [num|denom] unsort encoding).
      n_ops: payload operands per sort call (keys duplicated 1/n_ops as much;
        compile time grows ~5 s/operand, cached persistently).
    Returns:
      (sorted_payloads, srcs): column payloads reordered per group and the
      (c, h, n) source index of each group (original row now at slot s) —
      for an unsort call the returned src is the forward permutation.

    The custom VJP re-applies the inverse permutations with one backward
    sort call (no scatter-invert, no gathers).
    """
    key = (pack if isinstance(pack, str) else bool(pack),
           len(keys_list), int(n_ops), bool(out_bf16))
    fn = _grouped_sort_carry_cache.get(key)
    if fn is None:
        fn = _make_grouped_sort_carry(*key)
        _grouped_sort_carry_cache[key] = fn
    outs, srcs = fn(tuple(keys_list), tuple(payload_list))
    return list(outs), list(srcs)


def _permute_gather_impl(payload, src, pack, out_bf16):
    """payload (n_ev, d, ne); src (c, n_ev, ne) -> (c, n_ev, d, ne) with
    out[r, b, :, s] = payload[b, :, src[r, b, s]]."""
    u32, d = _cols_to_u32(payload[None], pack)  # (1, n_ev, D, ne)
    g = jnp.take_along_axis(u32, src[:, :, None, :], axis=3)  # (c, n_ev, D, ne)
    return _u32_to_cols(g, d, pack, out_bf16)


def _make_permute_gather(pack, out_bf16):
    @jax.custom_vjp
    def f(payload, src, inv):
        return _permute_gather_impl(payload, src, pack, out_bf16)

    def fwd(payload, src, inv):
        return _permute_gather_impl(payload, src, pack, out_bf16), (src, inv)

    def bwd(res, ct):
        src, inv = res
        # out[r, b, :, s] = payload[b, :, src[r, b, s]] and src is a
        # permutation per (r, b) row, so d payload[b, :, i] =
        # Σ_r ct[r, b, :, inv[r, b, i]] — the transpose of a permutation
        # gather is the gather by its inverse. Cotangents move with the same
        # packing as the forward (matches grouped_sort_carry's VJP).
        u32, d = _cols_to_u32(ct, pack)  # (c, n_ev, D, ne)
        g = jnp.take_along_axis(u32, inv[:, :, None, :], axis=3)
        gp = _u32_to_cols(g, d, pack, False).sum(axis=0)
        return gp, _float0_zero(src), _float0_zero(inv)

    f.defvjp(fwd, bwd)
    return f


_permute_gather_cache: dict = {}


def permute_gather(payload: Array, src: Array, inv: Array,
                   pack: bool = False, out_bf16: bool = False) -> Array:
    """Apply KNOWN per-round permutations to a column payload via XLA
    gathers — no lax.sort call.

    Args:
      payload: (n_ev, d, ne) column payload (one row per sort-batch event).
      src: (c, n_ev, ne) int32 — source slot of each sorted position (the
        `src` a `grouped_sort_carry` forward returns).
      inv: (c, n_ev, ne) int32 — argsort(src) per row (inverse permutation),
        used by the custom VJP to gather cotangents back.
      pack: move columns as bf16 pairs in u32 (half the gathered rows; the
        same rounding as the sort-carry's pack).
    Returns: (c, n_ev, d, ne) — payload[b, :, src[r, b, s]] at [r, b, :, s].

    Why this exists (scripts/probe_gather_r3.py): a minor-axis
    take_along_axis costs ~0.03 ms per moved column-row with NO per-call
    floor, while every lax.sort call pays a ~5 ms floor + comparator. For
    the per-layer x-reorder under static bucket keys (<=15 packed rows per
    round) the gather wins ~4x both directions; big payloads (the 600
    column-row [num|denom] unsort) still favor the sort.
    """
    key = (pack if isinstance(pack, str) else bool(pack), bool(out_bf16))
    fn = _permute_gather_cache.get(key)
    if fn is None:
        fn = _make_permute_gather(*key)
        _permute_gather_cache[key] = fn
    return fn(payload, src, inv)


def _rows_to_u32(rows: Array, pack: bool) -> tuple[Array, int]:
    """(..., ne, W) float row payload -> (..., ne, Wp) u32 (bf16 pairs on the
    minor axis when pack; exact f32 bitcast otherwise)."""
    w = rows.shape[-1]
    if pack:
        if w % 2:
            rows = jnp.pad(rows, [(0, 0)] * (rows.ndim - 1) + [(0, 1)])
        bf = rows.astype(jnp.bfloat16).reshape(*rows.shape[:-1], -1, 2)
        return jax.lax.bitcast_convert_type(bf, jnp.uint32), w
    return jax.lax.bitcast_convert_type(rows.astype(jnp.float32), jnp.uint32), w


def _u32_to_rows(u32: Array, w: int, pack: bool) -> Array:
    if pack:
        bf = jax.lax.bitcast_convert_type(u32, jnp.bfloat16)
        return bf.reshape(*u32.shape[:-1], -1).astype(jnp.float32)[..., :w]
    return jax.lax.bitcast_convert_type(u32, jnp.float32)


# Opt-in Pallas DMA backend for the flat row gather (ops/gather_pallas.py):
# set HEPT_ROW_GATHER=pallas to route rows of <=128 packed u32 words through
# the per-row pipelined DMA kernel instead of the XLA gather. Off by default
# until the queue35 hardware probe proves it faster than XLA's ~13 ns/row.
_ROW_GATHER_BACKEND = _os.environ.get("HEPT_ROW_GATHER", "xla")


def _permute_gather_rows_impl(rows, idx, pack):
    """rows (S, ne, W); idx (R, ne) with R a multiple of S ->
    out[r, p, :] = rows[r % S, idx[r, p], :] as ONE flat row gather
    (contiguous row fetches; scripts/probe_unsort_row: the u32-packed row
    gather moves the [num|denom] unsort ~3.6x faster than the minor-axis
    sort-carry — wide rows ride the sublane axis at DMA row-fetch speed
    instead of ~16 GB/s lane-axis shuffles). S < R is the broadcast-source
    case (one payload copy serving every OR round / head, e.g. the
    gather_sort forward): the source is never materialized R/S times —
    only the gathered output is."""
    u32, w = _rows_to_u32(rows, pack)
    S, ne, wp = u32.shape
    R = idx.shape[0]
    if _ROW_GATHER_BACKEND == "pallas" and wp <= 128:
        from ..ops.gather_pallas import row_gather_dma

        out = row_gather_dma(u32, idx)[..., :wp]
        return _u32_to_rows(out, w, pack)
    flat = u32.reshape(S * ne, wp)
    offs = ((jnp.arange(R, dtype=idx.dtype) % S) * ne)[:, None]
    out = flat[(idx + offs).reshape(-1)].reshape(R, ne, wp)
    return _u32_to_rows(out, w, pack)


def _make_permute_gather_rows(pack):
    @jax.custom_vjp
    def f(rows, idx, inv):
        return _permute_gather_rows_impl(rows, idx, pack)

    def fwd(rows, idx, inv):
        return _permute_gather_rows_impl(rows, idx, pack), \
            (idx, inv, rows.shape[0])

    def bwd(res, ct):
        idx, inv, S = res
        # out[p] = rows[idx[p]], idx a permutation => d rows[s] = ct[inv[s]]
        # where inv is idx's inverse — the same row gather, same packing.
        # Broadcast sources (S < R) sum their R/S copies' cotangents.
        g = _permute_gather_rows_impl(ct, inv, pack)  # (R, ne, W)
        if g.shape[0] != S:
            g = g.reshape(-1, S, *g.shape[1:]).sum(axis=0)
        return g, _float0_zero(idx), _float0_zero(inv)

    f.defvjp(fwd, bwd)
    return f


_permute_gather_rows_cache: dict = {}


def permute_gather_rows(rows: Array, idx: Array, inv: Array,
                        pack: bool = False) -> Array:
    """Apply KNOWN per-batch-row permutations to a ROW-major payload via one
    flat XLA row gather (no lax.sort, no lane-axis movement).

    Args:
      rows: (S, ne, W) row payload (one feature row per point). S may be a
        DIVISOR of R (broadcast source): out row r reads source row r % S —
        one payload copy serves every OR round/head without materializing
        the broadcast (the gather_sort forward), and the VJP sums the R/S
        copies' cotangents back.
      idx: (R, ne) int32 — out[r, p, :] = rows[r % S, idx[r, p], :].
      inv: (R, ne) int32 — idx's inverse permutation (for the VJP).
      pack: move rows as bf16 pairs bitcast to u32 (half the gathered bytes;
        same rounding as the sort-carry's pack).
    Returns: (R, ne, W) f32.
    """
    fn = _permute_gather_rows_cache.get(bool(pack))
    if fn is None:
        fn = _make_permute_gather_rows(bool(pack))
        _permute_gather_rows_cache[bool(pack)] = fn
    return fn(rows, idx, inv)


def _sort_carry_impl(keys, payload, pack):
    c, h, n = keys.shape
    if payload.ndim == 3:
        payload = jnp.broadcast_to(payload[None], (c,) + payload.shape)
    return _folded_sort(keys, payload, pack, with_iota=True)


def _unsort_carry_impl(source_index, payload, pack):
    out, _ = _folded_sort(source_index, payload, pack, with_iota=False)
    return out


def _make_sort_carry(pack: bool):
    @jax.custom_vjp
    def f(keys, payload):
        return _sort_carry_impl(keys, payload, pack)

    def fwd(keys, payload):
        out = _sort_carry_impl(keys, payload, pack)
        return out, (out[1], keys, payload.ndim == 3)

    def bwd(res, cotangents):
        src, keys, was_3d = res
        g_sorted, _ = cotangents  # integer source_index output has no grad
        # sorted[s] = payload[src[s]]  =>  d payload[r] = g_sorted[inv[r]],
        # which is exactly the unsort: re-sort g_sorted on the carried
        # source indices (no scatter-invert, no gather).
        gp = _unsort_carry_impl(src, g_sorted, pack)  # (c, h, n, d)
        if was_3d:
            gp = gp.sum(axis=0)  # broadcast over hashes sums in reverse
        gk = (
            _float0_zero(keys)
            if jnp.issubdtype(keys.dtype, jnp.integer)
            else jnp.zeros_like(keys)
        )
        return gk, gp

    f.defvjp(fwd, bwd)
    return f


def _make_unsort_carry(pack: bool):
    @jax.custom_vjp
    def f(source_index, payload):
        return _unsort_carry_impl(source_index, payload, pack)

    def fwd(source_index, payload):
        # Carry an iota row through the unsort: sorted by src (a
        # permutation), slot i receives iota j with src[j] = i, i.e. inv[i]
        # — the inverse permutation for free inside the sort anyway.
        out, inv = _folded_sort(source_index, payload, pack, with_iota=True)
        return out, (source_index, inv)

    def bwd(res, g):
        source_index, inv = res
        # out[src[s]] = payload[s]  =>  d payload[s] = g[src[s]]; sorting g
        # on inv places g[j] with inv[j] = s at slot s, i.e. j = src[s] —
        # sort-based forward-permutation apply, no gather.
        gp = _unsort_carry_impl(inv, g, pack)
        return _float0_zero(source_index), gp

    f.defvjp(fwd, bwd)
    return f


_sort_carry = {False: _make_sort_carry(False), True: _make_sort_carry(True)}
_unsort_carry = {False: _make_unsort_carry(False), True: _make_unsort_carry(True)}


def sort_carry(keys: Array, payload: Array, pack: bool = False):
    """Sort payload rows by keys; no argsort, no gather, no inverse perm.

    Args:
      keys: (c, h, n) sort keys (float or int).
      payload: (h, n, d) (broadcast over hashes) or (c, h, n, d).
      pack: move payload as bf16 pairs (half the sort traffic, bf16 rounding).
    Returns:
      (sorted_payload (c, h, n, d) f32, source_index (c, h, n) i32) where
      source_index[s] is the original row now at sorted slot s.

    Replaces the reference's argsort + batched_index_select pipeline
    (src/models/attention/hept.py:103-108, hash_utils.py:79-89) with the
    batch-folded two-operand sort (`_folded_sort`) — the TPU-fast AND
    TPU-compile-fast formulation. A custom VJP re-applies the permutation
    with the same sort machinery instead of differentiating the sort.
    """
    return _sort_carry[bool(pack)](keys, payload)


def unsort_carry(source_index: Array, payload: Array, pack: bool = False):
    """Inverse of `sort_carry`: restore original row order by sorting on the
    carried source indices (unique ints, so unstable sort is exact).

    Args: source_index (c, h, n); payload (c, h, n, d). Returns (c, h, n, d).
    """
    return _unsort_carry[bool(pack)](source_index, payload)


def sort_to_buckets(x: Array, perm: Array, block_size: int) -> Array:
    """Gather rows of x into sorted fixed-size buckets.

    Args:
      x: (h, n, d) per-head features (shared across OR-hashes) or
         (c, h, n, d) per-hash features.
      perm: (c, h, n) argsort positions of the combined hash keys.
      block_size: bucket size B; n must be a multiple of B.
    Returns:
      (c, h, n // B, B, d) bucketed features
      (reference hept.py:9-14 / hash_utils.py:79-89).
    """
    c, h, n = perm.shape
    return gather_rows(x, perm).reshape(c, h, n // block_size, block_size, -1)


def unsort_from_buckets(s_x: Array, perm_inverse: Array) -> Array:
    """Scatter bucketed outputs back to original point order.

    Args:
      s_x: (c, h, nb, B, d); perm_inverse: (c, h, n).
    Returns: (c, h, n, d). (reference hept.py:17-19)
    """
    c, h, nb, bs, d = s_x.shape
    return gather_rows(s_x.reshape(c, h, nb * bs, d), perm_inverse)
