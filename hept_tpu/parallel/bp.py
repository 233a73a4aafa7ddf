"""Bucket-axis intra-event sequence parallelism (SURVEY §2.9 "stretch" SP).

After the LSH bucket sort, HEPT attention is block-diagonal over the
(rounds × n_buckets) grid of independent block_size×block_size tiles
(SURVEY §5: "shardable across chips with one gather and one scatter-add per
layer" — the HEPT-shaped analogue of ring attention). head-TP and hash-TP
(parallel/tp.py) cap intra-event scaling at num_heads × n_hashes chips and
shrink to 2-8 under the fast stack; sharding the bucket grid itself has no
such cap — P chips each own nb/P whole buckets of every round.

Decomposition per layer (transport="replicated", the v1 prototype):
  replicated  — E2LSH keys + the global bucket sort (`grouped_sort_carry`):
                every chip computes the same sorted [x|coords] copy. This
                was the Amdahl term (~1/3 of a layer on v5e, BASELINE.md);
                transport="distributed" (round 4) removes it: only the
                1-row key COMPARATOR sort stays replicated and the payload
                moves through capped all_to_alls (parallel/dsort.py).
  sharded     — the per-head projections + RPE fold + the per-bucket RBF
                kernel (the MXU-hot ~2/3): each chip slices its contiguous
                ne/P slab of the sorted axis (whole buckets, so tiles never
                cross chips) and attends locally with ZERO communication.
  collective  — ONE tiled `all_gather` of the local [num | denom] slabs over
                the bucket axis per layer; the unsort back to input order
                and the OR-combine across rounds then run replicated
                (psum-free: the gather reassembles exact slabs, nothing is
                summed across chips).

Numerics match `hept_attention_core_xcols(share_heads=True)` exactly in f32
(same op order per tile; the slab slice only re-groups the einsum batch).
Gradients flow through `shard_map` (the all_gather transposes to a
psum_scatter, the slice to a pad) — tested against the unsharded VJP.

Reference semantics being sharded: hept.py:103-115 (argsort → bucketed
qkv_res → unsort → OR-combine), reference has no distributed analogue
(SURVEY §2.9: "What the reference has: none").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core.buckets import grouped_sort_carry
from ..ops.bucket_attn import bucket_rbf_attention_cols_xla, stable_ratio
from .dsort import invert_perm, permute_overflows, route_local, sort_perm


def bucket_sharded_core(
    x_cols, coords_cols, wq, wk, wv, sqrt_w, alpha, codes, invalid,
    *,
    axis: str,
    n_shards: int,
    block_size: int,
    sort_ops: int = 8,
    transport: str = "replicated",
    cap_factor: float = 2.0,
):
    """Bucket-sharded `share_heads`-style HEPT attention core.

    Callable from INSIDE any enclosing `shard_map` whose mesh carries
    `axis` (it addresses the axis only by name: `lax.axis_index`, `psum`,
    `all_to_all`) — this is what lets the full HeptTransformer run the
    bucket-sharded attention per layer from a model-level shard_map
    (`make_bucket_train_step`) as well as from the layer-level wrapper
    (`make_bucket_sharded_attention`). Inputs are replicated over `axis`;
    the output is replicated. Matches `hept_attention_core_xcols` with
    share_heads=True, f32 transport, XLA kernels, exactly in f32.

    transport="replicated": every chip carries the full payload through the
    bucket sort and unsort (the v1 Amdahl term). transport="distributed":
    only the 1-row key COMPARATOR sort is replicated; the 30-200-row
    payloads move through `parallel.dsort.route_local` — one capped
    all_to_all each way per layer (see dsort.py; cap =
    ceil(cap_factor·n/P²), honest failure = the replicated
    `permute_overflows` flag, raised here as a poisoned output via NaN so
    it can never be silently wrong). Note the comparator sort and the
    projection weight math stay replicated on every chip in BOTH modes —
    acceptable for v1: the MXU-hot per-bucket kernel and the projections'
    activations are the sharded ~2/3 of a layer.
    """
    assert transport in ("replicated", "distributed"), transport

    def spmd(x_cols, coords_cols, wq, wk, wv, sqrt_w, alpha, codes, invalid):
        h, d_model, d = wq.shape
        cd = coords_cols.shape[0]
        c = alpha.shape[-1]
        n = x_cols.shape[-1]
        dv = wv.shape[-1]
        assert n % (n_shards * block_size) == 0, (
            f"n={n} must divide by n_shards*block_size="
            f"{n_shards * block_size}"
        )

        if invalid is not None:
            keep = jnp.logical_not(invalid)[None, :]
            x_cols = jnp.where(keep, x_cols, 0.0)
            coords_cols = jnp.where(keep, coords_cols, 0.0)

        # --- replicated: shared-grid E2LSH keys + ONE global bucket sort
        # (identical math to the share_heads branch of
        # ops/bucket_attn.py:hept_attention_core_xcols) ---
        xc = jnp.concatenate([x_cols, coords_cols], axis=0)  # (d_xc, n)
        d_xc = d_model + cd
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
        k_key = hashed + codes_s * hash_shift
        if invalid is not None:
            big = jnp.asarray(3.0e38, jnp.float32)
            k_key = jnp.where(invalid[None, :], big, k_key)

        idx = jax.lax.axis_index(axis)
        ne_loc = n // n_shards
        if transport == "distributed":
            # comparator-only replicated sort (1 key row); the payload
            # moves via a capped all_to_all (parallel/dsort.py)
            cap = max(1, -(-int(cap_factor * n) // (n_shards * n_shards)))
            perm = sort_perm(k_key)  # (c, n) replicated
            xc_loc = jax.lax.dynamic_slice_in_dim(
                jnp.broadcast_to(xc[None], (c,) + xc.shape),
                idx * ne_loc, ne_loc, axis=-1,
            )  # (c, d_xc, ne_loc) my INPUT-order slab
            sxk_loc = route_local(
                perm, xc_loc, axis=axis, n_shards=n_shards, cap=cap
            )  # (c, d_xc, ne_loc) my SORTED-order slab
            slab = sxk_loc[:, None]  # (c, 1, d_xc, ne_loc)
        else:
            (sxk,), (q_src,) = grouped_sort_carry(
                [k_key[:, None]], [xc], pack=False, n_ops=sort_ops
            )  # sxk (c, 1, d_xc, n); q_src (c, 1, n) — 2-D payload
            # broadcasts over (hashes, heads=1); its VJP sums them back

            # --- sharded: each chip projects + attends its contiguous slab
            # of whole buckets (zero communication) ---
            slab = jax.lax.dynamic_slice_in_dim(
                sxk, idx * ne_loc, ne_loc, axis=-1
            )  # (c, 1, d_xc, ne_loc)
        sxs = slab[:, :, :d_model]  # (c, 1, d_model, ne_loc)
        scs = slab[:, :, d_model:]  # (c, 1, cd, ne_loc)
        rpe_sh = (
            sqrt_w[None, None, :, :, None] * scs[:, :, None]
        )  # (c, 1, h, cd, ne_loc)

        def project(w):
            proj = jnp.einsum(
                "hed,cben->cbhdn", w, sxs,
                preferred_element_type=jnp.float32,
            )
            return jnp.concatenate([proj, rpe_sh], axis=3)

        sq = project(wq).reshape(c * h, d + cd, ne_loc)
        sk = project(wk).reshape(c * h, d + cd, ne_loc)
        sv = jnp.einsum(
            "hed,cben->cbhdn", wv, sxs, preferred_element_type=jnp.float32
        ).reshape(c * h, dv, ne_loc)
        denom, so = bucket_rbf_attention_cols_xla(sq, sk, sv, block_size)
        od_loc = jnp.concatenate([so, denom], axis=1)  # (c·h, dv+1, ne_loc)

        if transport == "distributed":
            # unsort = route the local [num|den] slab back to input order
            # through the inverse permutation; OR-combine locally; ONE psum
            # of disjoint padded slabs replicates the final (h, dv, n)
            odu_loc = route_local(
                invert_perm(perm),
                od_loc.reshape(c, h * (dv + 1), ne_loc),
                axis=axis, n_shards=n_shards, cap=cap,
            ).reshape(c, h, dv + 1, ne_loc)
            o_sum = odu_loc[:, :, :dv].sum(axis=0)  # (h, dv, ne_loc)
            l_sum = odu_loc[:, :, dv:].sum(axis=0)
            out_loc = stable_ratio(o_sum[None], l_sum[None])[0]
            out = jax.lax.psum(
                jax.lax.dynamic_update_slice_in_dim(
                    jnp.zeros((h, dv, n), out_loc.dtype),
                    out_loc, idx * ne_loc, axis=2,
                ),
                axis,
            )
            # honest failure: a cell overflow would silently mis-route —
            # poison the output instead (training NaN guards trip on it)
            bad = permute_overflows(perm, n_shards, cap)
            return jnp.where(bad, jnp.nan, out)

        # --- collective: reassemble the sorted axis. The scatter-add form
        # (SURVEY §5: "one scatter-add (unsort) per layer"): each chip pads
        # its slab into a zeroed full array and ONE psum sums the disjoint
        # slabs. A tiled all_gather of the slabs moves P× fewer bytes, but
        # its output is not statically replicated for shard_map's
        # replication checker (whose types the transpose needs for correct
        # gradients); psum is — and slabs are disjoint, so the sum is exact
        # reassembly, not a reduction.
        od = jax.lax.psum(
            jax.lax.dynamic_update_slice_in_dim(
                jnp.zeros(od_loc.shape[:2] + (n,), od_loc.dtype),
                od_loc, idx * ne_loc, axis=2,
            ),
            axis,
        )  # (c·h, dv+1, n)

        # --- replicated: unsort to input order + OR-combine across rounds
        # (same call shape as the share_heads unsort branch) ---
        src_b = jnp.broadcast_to(
            q_src[:, :, None], (c, 1, h, n)
        ).reshape(c, h, n)
        (odu,), _ = grouped_sort_carry(
            [src_b], [od.reshape(c, h, dv + 1, n)], pack=False, n_ops=sort_ops
        )
        od_unsorted = odu.reshape(c, 1, h, dv + 1, n)
        o, logits = od_unsorted[:, :, :, :dv], od_unsorted[:, :, :, dv:]
        o_sum, l_sum = o.sum(axis=0), logits.sum(axis=0)
        out = stable_ratio(o_sum, l_sum)  # (1, h, dv, n)
        return out[0]  # (h, dv, n)

    return spmd(x_cols, coords_cols, wq, wk, wv, sqrt_w, alpha, codes,
                invalid)


def make_bucket_sharded_attention(
    mesh: Mesh,
    axis: str = "buckets",
    *,
    block_size: int,
    sort_ops: int = 8,
    transport: str = "replicated",
    cap_factor: float = 2.0,
):
    """Layer-level wrapper: shard_map `bucket_sharded_core` on `mesh`.

    Returns fn(x_cols, coords_cols, wq, wk, wv, sqrt_w, alpha, codes,
    invalid) -> (h, dv, n); all inputs replicated (P()), output replicated.
    n must be a multiple of mesh.shape[axis] * block_size. See
    `bucket_sharded_core` for the decomposition and transport modes.
    """
    n_shards = mesh.shape[axis]

    def spmd(*args):
        return bucket_sharded_core(
            *args, axis=axis, n_shards=n_shards, block_size=block_size,
            sort_ops=sort_ops, transport=transport, cap_factor=cap_factor,
        )

    # NOTE: replication checking must stay ON — shard_map's transpose relies
    # on the replication types to place the psum/psum_scatter correctly; with
    # it off, the replicated-output cotangent is over-counted x n_shards
    # through the all_gather transpose (observed 8x gradient mismatch).
    return jax.shard_map(
        spmd,
        mesh=mesh,
        in_specs=(P(),) * 9,
        out_specs=P(),
    )


def make_bucket_train_step(
    model_factory,
    model_cfg,
    loss_fn,
    tx,
    mesh: Mesh,
    *,
    data_axis: str | None = "data",
    bucket_axis: str = "buckets",
    transport: str = "replicated",
    cap_factor: float = 2.0,
):
    """Build a jitted DP × bucket-SP train step for the FULL model.

    The whole train-step body (encoder → n_layers attention blocks → head →
    InfoNCE/focal loss → grads) runs under ONE shard_map over a
    ("data", "buckets") mesh: events shard over `data_axis`; inside each
    data shard the per-layer HEPT attention shards its bucket grid over
    `bucket_axis` via `bucket_sharded_core` (the model dispatches there when
    cfg.bucket_axis is set). Encoder/FF/head/loss compute is replicated over
    the bucket axis (it is O(n·d) pointwise work; the sharded part is the
    MXU-hot attention ~2/3 of a layer). Gradients differentiate through the
    shard_map, so the attention psums transpose correctly; the replicated-
    parameter cotangents need no manual psum (VMA checking stays ON — see
    make_bucket_sharded_attention's note).

    Args mirror `parallel.tp.make_tp_train_step`: model_factory(local_cfg)
    builds the model with cfg.bucket_axis/bucket_shards set; model_cfg must
    be a share_heads + qkv_post_sort HEPT config with no static plan and
    f32 transport (asserted by the attention module). The reference has no
    distributed analogue (SURVEY §2.9); this is the >heads×hashes-chip
    single-event scaling story.

    Returns train_step(state, batch) -> (state, metrics); `batch` has a
    leading event axis divisible by the data-axis size (replicated over the
    bucket axis).
    """
    import dataclasses

    import optax

    from ..train.state import TrainState  # noqa: F401 (type of `state`)
    from .dp import optax_global_norm

    assert model_cfg.attn_type == "hept", "bucket SP targets HEPT"
    n_shards = mesh.shape[bucket_axis]
    local_cfg = dataclasses.replace(
        model_cfg, bucket_axis=bucket_axis, bucket_shards=n_shards,
        bucket_transport=transport, bucket_cap_factor=cap_factor,
    )
    local_model = model_factory(local_cfg)
    have_dp = data_axis is not None and data_axis in mesh.shape

    def local_loss(params, constants, batch, rng):
        if have_dp:
            # dropout varies per data shard, MUST match across bucket shards
            # (the non-attention compute is replicated over the bucket axis)
            rng = jax.random.fold_in(rng, jax.lax.axis_index(data_axis))

        def one(xe, ce, ve, key):
            return local_model.apply(
                {"params": params, "constants": constants}, xe, ce, ve,
                deterministic=False, rngs={"dropout": key},
            )

        keys = jax.random.split(rng, batch["x"].shape[0])
        outputs = jax.vmap(one)(
            batch["x"], batch["coords"], batch["valid"], keys
        )
        loss = loss_fn(outputs, batch)
        if have_dp:
            loss = jax.lax.pmean(loss, data_axis)
        # replicated over the bucket axis already (the attention output is
        # psum-reassembled); pmean makes that provable for out_specs=P()
        return jax.lax.pmean(loss, bucket_axis)

    def batch_specs(batch):
        lead = data_axis if have_dp else None
        return jax.tree_util.tree_map(
            lambda x: P(lead, *([None] * (jnp.ndim(x) - 1))), batch
        )

    def step(state, batch):
        rng, new_rng = jax.random.split(state.rng)

        global_loss = jax.shard_map(
            local_loss,
            mesh=mesh,
            in_specs=(P(), P(), batch_specs(batch), P()),
            out_specs=P(),
        )

        def loss_of(params):
            return global_loss(params, state.constants, batch, rng)

        loss, grads = jax.value_and_grad(loss_of)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state,
            rng=new_rng,
        )
        return new_state, {"loss": loss, "grad_norm": optax_global_norm(grads)}

    return jax.jit(step)
