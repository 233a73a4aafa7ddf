"""Pallas TPU bitonic multi-operand sort — a WORKING but SLOWER
alternative to lax.sort for the bucket pipeline's hot sorts
(core/buckets.grouped_sort_carry). Kept as a validated negative result.

Measured (scripts/probe_pallas_sort.py, v5e, tracking-60k shapes): exact
bitwise agreement with `lax.sort(num_keys=2)` at 24 rows x 16 operands, but
56.6 ms vs 11.9 ms. The bitonic network's ~log²(n)/2 = 136 substages each
traverse the full 17-operand VMEM state (~3 traversals/substage after
Mosaic's concat/where materializations), which exceeds XLA's ~17-pass
merge-network HBM traffic by ~8x in passes — VMEM's ~5x bandwidth advantage
over HBM cannot make that up, and data-dependent addressing (the thing a
merge network needs) has no fast Mosaic lowering (cross-lane-group dynamic
gathers are unsupported). Conclusion recorded in ROADMAP.md: XLA's variadic
sort stays the production path.

Design notes (probe_bitonic.py, probe_refs/probe_dma canaries 2026-08):
  * State lives in OUTPUT refs + a VMEM keys scratch; every substage
    reads-modifies-writes the refs. Long chains of VALUE temporaries blow
    VMEM (Mosaic does not reuse buffers across unrolled iterations) and
    crash the compiler at ~5 substages.
  * The 136-substage network would also explode compile time if unrolled;
    instead a fori_loop over a precomputed (log2 k, log2 s) schedule
    dispatches via lax.switch to ONE static branch per stride value
    (sublane reshape-flip for s >= 128, lane roll pair for s < 128), so the
    program contains each substage variant once.
  * Keys compare as (f32 key, u32 row index) lexicographic — ties resolve
    by original position (stable), which grouped_sort_carry's pad/replicate
    tie-safety requires, and pads (+BIG keys, trailing indices) sort last.
  * n is padded to a power of two by the wrapper (keys +BIG, indices past n).

One grid step per batch row; rows are independent sort problems.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.0e38  # matches the invalid-row key in ops/bucket_attn.py


def _schedule(n: int) -> list[tuple[int, int]]:
    """Bitonic network substages as (log2 block, log2 stride) pairs."""
    sched = []
    lk = 1
    while (1 << lk) <= n:
        for ls in range(lk - 1, -1, -1):
            sched.append((lk, ls))
        lk += 1
    return sched


def _kernel(lk_ref, ls_ref, keys_ref, pay_ref, po_ref, kscr_ref, *, n: int,
            ops: int, n_sub: int):
    """One grid step = one full bitonic sort of (n,) with `ops` payloads."""
    r = n // 128

    # ---- load state: keys scratch + payload output refs
    kscr_ref[:] = keys_ref[0]
    for j in range(ops):
        po_ref[0, j] = pay_ref[0, j]

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (r, 128), 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (r, 128), 1)
    # global element index (row-major): idx = row * 128 + lane
    idx = row_iota * 128 + lane_iota

    def substage(ls_static, k_log):
        """One compare-exchange pass at static stride 2**ls_static; block
        size 2**k_log (dynamic scalar, only used for direction masks)."""
        s = 1 << ls_static
        k = jnp.int32(1) << k_log
        keys = kscr_ref[:]
        ti = po_ref[0, ops - 1]  # iota operand = tie-break index

        if s >= 128:
            sr = s // 128
            a = n // (2 * s)

            def flip(x):
                # swap the two stride-halves of every 2s block (Mosaic has
                # no `rev` lowering; concat of swapped slices instead)
                x4 = x.reshape(a, 2, sr, 128)
                return jnp.concatenate(
                    [x4[:, 1:2], x4[:, 0:1]], axis=1
                ).reshape(r, 128)
        else:

            def flip(x):
                fwd = pltpu.roll(x, shift=128 - s, axis=1)  # x[l+s] at l
                bwd = pltpu.roll(x, shift=s, axis=1)  # x[l-s] at l
                lo = (lane_iota & s) == 0
                return jnp.where(lo, fwd, bwd)

        pk = flip(keys)
        pti = flip(ti)
        mine_first = jnp.logical_or(
            keys < pk, jnp.logical_and(keys == pk, ti < pti)
        )
        is_hi = (idx & s) != 0
        is_desc = (idx & k) != 0
        keep_own = jnp.logical_xor(jnp.logical_xor(mine_first, is_hi), is_desc)
        kscr_ref[:] = jnp.where(keep_own, keys, pk)
        for j in range(ops):
            x = po_ref[0, j]
            po_ref[0, j] = jnp.where(keep_own, x, flip(x))

    n_strides = (n - 1).bit_length()  # log2(n)

    def body(t, _):
        lk = lk_ref[t]
        ls = ls_ref[t]
        branches = [
            functools.partial(substage, ls_static)
            for ls_static in range(n_strides)
        ]
        jax.lax.switch(ls, branches, lk)
        return 0

    jax.lax.fori_loop(0, n_sub, body, 0)


_sort_cache: dict = {}


def _get_sorter(rows: int, n: int, ops: int):
    key = (rows, n, ops)
    fn = _sort_cache.get(key)
    if fn is not None:
        return fn
    sched = _schedule(n)
    n_sub = len(sched)
    import numpy as np

    lk_arr = jnp.asarray(np.array([k for k, _ in sched], np.int32))
    ls_arr = jnp.asarray(np.array([s for _, s in sched], np.int32))
    r = n // 128

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # lk / ls schedules
        grid=(rows,),
        in_specs=[
            pl.BlockSpec((1, r, 128), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ops, r, 128), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ops, r, 128), lambda i, *_: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((r, 128), jnp.float32)],
    )

    call = pl.pallas_call(
        functools.partial(_kernel, n=n, ops=ops, n_sub=n_sub),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows, ops, r, 128), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(14e6),
        ),
        cost_estimate=pl.CostEstimate(
            flops=rows * n * n_sub * (ops + 4),
            bytes_accessed=rows * n * 4 * (2 * ops + 2),
            transcendentals=0,
        ),
    )

    def fn(keys, pays):
        return call(lk_arr, ls_arr, keys, pays)

    _sort_cache[key] = fn
    return fn


def bitonic_sort_rows(keys: Array, payload_ops: list[Array]) -> list[Array]:
    """Sort each row of `keys` (rows, n) f32 ascending, carrying
    `payload_ops` (each (rows, n) u32) through the same permutation.

    The LAST payload operand must be the row-position iota (uint32) — it is
    used as the tie-break key (stable order) — which grouped_sort_carry
    appends anyway as the source-index carry.

    Returns the sorted payload operands (keys are not returned; callers
    don't use them). n is padded internally to a power of two (pad keys
    +BIG, pad indices continue past n, other payloads zero), and results
    sliced back; pads sort strictly last.
    """
    rows, n = keys.shape
    ops = len(payload_ops)
    n_pad = 1 << (n - 1).bit_length()
    if n_pad != n:
        pad = n_pad - n
        keys = jnp.pad(keys, [(0, 0), (0, pad)], constant_values=_BIG)
        padded = []
        for j, op in enumerate(payload_ops):
            if j == ops - 1:  # iota: continue counting so pads stay unique
                tail = jnp.broadcast_to(
                    jnp.arange(n, n_pad, dtype=jnp.uint32), (rows, pad)
                )
                padded.append(jnp.concatenate([op, tail], axis=1))
            else:
                padded.append(jnp.pad(op, [(0, 0), (0, pad)]))
        payload_ops = padded
    k3 = keys.reshape(rows, n_pad // 128, 128)
    p4 = jnp.stack(payload_ops, axis=1).reshape(rows, ops, n_pad // 128, 128)
    out = _get_sorter(rows, n_pad, ops)(k3, p4)
    out = out.reshape(rows, ops, n_pad)[:, :, :n]
    return [out[:, j] for j in range(ops)]
