"""Distributed payload routing for bucket-axis SP: the sharded sort/unsort.

parallel/bp.py shards the MXU-hot bucket attention but keeps BOTH transport
sorts replicated — every chip carries the full (rows, n) payload through
`grouped_sort_carry` twice per layer. That is the Amdahl term: at tracking
shapes the payload carriage (~0.39 ms/operand/call on v5e) dwarfs the
comparator (~3.9 ms/call) — BASELINE.md "Honest sort cost model".

The TPU-native split implemented here:

  replicated   — the COMPARATOR-ONLY sort: keys (c, n) f32 + original index,
                 one cheap lax.sort per round; every chip derives the exact
                 global permutation. Keys are 1 row vs 30-200 payload rows,
                 so the replicated work shrinks 30-200x.
  distributed  — `shard_permute`: the payload (rows, n/P per chip) moves to
                 its sorted position through ONE capped all-to-all over ICI.
                 Each (src chip -> dst chip) cell is padded to a static
                 `cap` (static shapes; E2LSH keys spread ~uniformly, so
                 cells concentrate at n/P² — cap 2n/P² in practice). An
                 overflow FLAG (replicated boolean, computed from the
                 permutation alone) reports when any cell exceeds the cap
                 and the routed result would be wrong — callers fall back
                 to the replicated path or raise.

The permutation is integer math on stop-gradient keys; the payload path is
scatter -> all_to_all -> gather, all linear, so shard_map's AD transposes
it exactly (all_to_all transposes to the reverse all_to_all).

Single-device equivalence: lax.sort is stable, so the key sort with an
index tiebreaker reproduces `grouped_sort_carry`'s permutation bit-exactly;
`shard_permute` then applies that permutation exactly (tests/test_dsort.py
checks bitwise equality against the replicated carry sort on the 8-device
CPU mesh, forward and gradients).

Reference semantics being distributed: the argsort + gather transport of
hept.py:103-115; the reference has no multi-GPU analogue (SURVEY §2.9).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def sort_perm(keys: jnp.ndarray, invalid=None) -> jnp.ndarray:
    """Exact global sort permutation from keys (..., n) — comparator only.

    Returns src (..., n) int32: output position j takes input element
    src[..., j]. Matches grouped_sort_carry's stable key sort bit-exactly
    (lax.sort is stable; the index operand breaks ties by original
    position, which is what stability means).
    """
    n = keys.shape[-1]
    if invalid is not None:
        big = jnp.asarray(3.0e38, keys.dtype)
        keys = jnp.where(invalid, big, keys)
    idx = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32), keys.shape
    )
    _, src = jax.lax.sort_key_val(
        jax.lax.stop_gradient(keys), idx, dimension=-1
    )
    return src


def invert_perm(src: jnp.ndarray) -> jnp.ndarray:
    """inv such that inv[..., src[..., j]] = j — routes sorted data back to
    input order through the same `shard_permute` machinery."""
    n = src.shape[-1]
    flat = src.reshape(-1, n)
    j = jnp.arange(n, dtype=src.dtype)

    def one(s):
        return jnp.zeros((n,), src.dtype).at[s].set(j, unique_indices=True)

    return jax.vmap(one)(flat).reshape(src.shape)


def permute_overflows(perm: jnp.ndarray, n_shards: int, cap: int):
    """Replicated check: does any (src, dst) cell of the routed permutation
    exceed `cap`? perm (c, n); True means shard_permute would be WRONG."""
    c, n = perm.shape
    ne = n // n_shards
    dst = jnp.arange(n, dtype=jnp.int32) // ne  # (n,)
    srcc = perm // ne  # (c, n)
    cell = srcc * n_shards + dst[None, :]  # (c, n)
    counts = jax.vmap(
        lambda ce: jnp.zeros((n_shards * n_shards,), jnp.int32)
        .at[ce].add(1)
    )(cell)
    return jnp.max(counts) > cap


def route_local(perm, payload_local, *, axis: str, n_shards: int, cap: int):
    """SPMD body of `shard_permute`, callable INSIDE an existing shard_map
    over `axis` (shard_maps don't nest). perm (c, n) int32 replicated;
    payload_local (c, rows, ne=n/P) this chip's shard of the LAST axis.
    Returns this chip's (c, rows, ne) shard of payload[..., perm]."""
    c, n = perm.shape
    rows = payload_local.shape[1]
    ne = n // n_shards
    me = jax.lax.axis_index(axis)

    # ---- replicated integer plan (identical on every chip) ----
    pos = jnp.arange(n, dtype=jnp.int32)
    dst_chip = pos // ne  # (n,) destination chip of output position
    src_chip = perm // ne  # (c, n) source chip of that element
    src_loc = perm % ne  # (c, n) its index within the source chip
    # rank of output position j within its (src->dst) cell: count of
    # earlier positions in the same dst block with the same src chip
    # (consecutive ne output positions share a dst block)
    sblk = src_chip.reshape(c, n_shards, ne)

    def ranks_one(sb):  # (ne,) src chips within one dst block
        oh = jax.nn.one_hot(sb, n_shards, dtype=jnp.int32)
        run = jnp.cumsum(oh, axis=0) - oh  # exclusive count per src
        return jnp.take_along_axis(run, sb[:, None], axis=1)[:, 0]

    rank = jax.vmap(jax.vmap(ranks_one))(sblk).reshape(c, n)  # (c, n)

    # ---- sender: pack my cells (me -> every dst) ----
    # positions whose source is me, keyed by (dst, rank); my local
    # payload column for them is src_loc
    mine = src_chip == me  # (c, n)
    send = jnp.zeros((n_shards, c, cap, rows), payload_local.dtype)
    # scatter payload[c, :, src_loc] into send[dst, c, rank]; masked
    # (not-mine) entries are routed to an out-of-range slot and dropped
    slot = jnp.where(mine, rank, cap)  # (c, n) -> drop when not mine
    rows_v = jnp.moveaxis(payload_local, 1, 2)  # (c, ne, rows) columns
    gathered = jnp.take_along_axis(
        rows_v, jnp.where(mine, src_loc, 0)[:, :, None], axis=1
    )  # (c, n, rows) value for each output position (junk if not mine)
    ci = jnp.broadcast_to(jnp.arange(c, dtype=jnp.int32)[:, None], (c, n))
    send = send.at[dst_chip[None, :], ci, slot].set(
        jnp.where(mine[..., None], gathered, 0), mode="drop"
    )

    # ---- exchange: one all_to_all over the bucket axis ----
    recv = jax.lax.all_to_all(
        send, axis, split_axis=0, concat_axis=0
    )  # (n_shards=src, c, cap, rows)

    # ---- receiver: place my slab (output positions me*ne..) ----
    sl = lambda a: jax.lax.dynamic_slice_in_dim(a, me * ne, ne, axis=-1)
    src_chip_my = sl(src_chip)  # (c, ne)
    rank_my = sl(rank)
    out = recv[src_chip_my, ci[:, :ne], rank_my]  # (c, ne, rows)
    return jnp.moveaxis(out, 2, 1)  # (c, rows, ne)


def make_shard_permute(mesh: Mesh, axis: str, *, cap: int):
    """Distributed application of a replicated permutation.

    Returns fn(perm (c, n) int32 REPLICATED, payload (c, rows, n) sharded
    on the last axis) -> (c, rows, n) sharded on the last axis, where
    out[c, :, j] = payload[c, :, perm[c, j]] globally. One all_to_all of
    (P, c, cap, rows) cells per call. Results are garbage if
    `permute_overflows(perm, P, cap)` — check it (replicated, cheap) or
    size cap generously (2·n/P² holds for ~uniform hash keys).
    """
    n_shards = mesh.shape[axis]

    def spmd(perm, payload_local):
        return route_local(
            perm, payload_local, axis=axis, n_shards=n_shards, cap=cap
        )

    return jax.shard_map(
        spmd,
        mesh=mesh,
        in_specs=(P(), P(None, None, axis)),
        out_specs=P(None, None, axis),
    )
