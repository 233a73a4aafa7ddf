"""HEPT attention flax module.

The flagship mechanism (reference src/models/attention/hept.py:59-117,
example/hept.py:31-81): RPE distance weights are folded into q̂/k̂ so the RBF
kernel includes exp(-w·ΔR²); E2LSH + AND codes bucket the points; exact
attention runs within each `block_size` bucket (fused Pallas kernel on TPU);
`n_hashes` OR rounds are combined as Σnum/Σdenom.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.hashing import e2lsh_init
from ...ops.bucket_attn import hept_attention_core_cols
from ..mlp import TorchLinear


def prep_qk(query, key, w_rpe_weight, coords, num_heads, num_w_per_dist):
    """Fold learnable per-head distance weights into q̂/k̂.

    Args:
      query, key: (n, num_heads, d).
      w_rpe_weight: (num_heads * d, (coords_dim - 1) * num_w_per_dist) — the
        torch-layout weight of the reference's `w_rpe` Linear
        (transformer.py:205); only the weight is used.
      coords: (n, coords_dim).
    Returns: q̂, k̂ of shape (n, num_heads, d + coords_dim).

    Math parity with reference hept.py:36-43: per head, per distance group r,
    width w_hr = Σ_k exp(clamp(Σ_d W[h,d,r,k], 50)); the first coord pair
    (eta, phi) shares one width (they form ΔR), hence the duplicated column.
    """
    n, h, d = query.shape
    coords_dim = coords.shape[-1]
    w = w_rpe_weight.reshape(h, d, coords_dim - 1, num_w_per_dist)
    qw = jnp.exp(jnp.minimum(w.sum(axis=1), 50.0)).sum(axis=-1)  # (h, r)
    qw_expanded = jnp.concatenate([qw[:, :1], qw], axis=-1)  # (h, coords_dim)
    sqrt_w_r = jnp.sqrt(2.0 * qw_expanded)[None] * coords[:, None, :]  # (n, h, cd)
    q_hat = jnp.concatenate([query, sqrt_w_r], axis=-1)
    k_hat = jnp.concatenate([key, sqrt_w_r], axis=-1)
    return q_hat, k_hat


class HeptAttention(nn.Module):
    """LSH-bucketed block-local RBF attention for one event.

    The E2LSH directions live in the non-trainable "constants" collection
    (the reference freezes them as requires_grad=False Parameters,
    hash_utils.py:339-344).
    """

    h_dim: int
    num_heads: int
    block_size: int
    n_hashes: int
    num_w_per_dist: int
    coords_dim: int
    impl: str = "xla"  # "xla" | "pallas" | "hybrid" (einsum fwd + pallas bwd)
    sort_pack: bool = False  # move sort payloads as bf16 pairs (fast mode)
    sort_ops: int = 1  # payload operands per sort call (less key traffic)
    unsort_pack: bool = False  # bf16-packed numerator/denominator unsort
    # Tensor parallelism over heads (parallel/tp.py): when set, this module
    # runs on a per-chip head slice (num_heads = global // axis size; w_q/w_k/
    # w_v/w_rpe/alpha arrive pre-sliced by shard_map) and all-gathers the
    # per-head outputs over this mesh axis before the full out_linear. Each
    # head's hash/sort/attend path is chip-local — the only collective.
    head_axis: str | None = None
    # Intra-event hash parallelism (parallel/tp.py): the mesh axis the
    # n_hashes OR rounds shard over; codes/alpha arrive pre-sliced and the
    # OR-combine numerator/denominator sums psum over this axis inside the
    # attention core.
    hash_axis: str | None = None
    # Post-sort projections (ops/bucket_attn.py hept_attention_core_xcols):
    # the caller passes the SHARED normed hidden state as `query` plus the
    # per-head projection kernels (wq/wk/wv kwargs); the sort moves
    # [x|coords] (30 cols) per key order instead of q̂/k̂v (84) — the big
    # sort-traffic lever. Numerically equal up to fp32 reordering.
    post_sort: bool = False
    # With post_sort: bucket queries by the KEY hash order (one sorted copy,
    # half the sort rows/operands). Reference divergence; see
    # ops/bucket_attn.py hept_attention_core_xcols.
    shared_sort: bool = False
    # With post_sort: ONE bucket grid per OR-hash round shared by all heads
    # (keys hash the shared [x|coords]; c sort rows instead of c·h; one
    # sorted copy instead of h — the 8x sort-traffic lever). Implies
    # shared_sort. Reference divergence; see hept_attention_core_xcols.
    share_heads: bool = False
    # With share_heads: unsort all heads' [num|denom] in ONE c-comparator-row
    # call (c·h/2 fewer comparator rows at ~h·(dv+1)/2 sort operands —
    # TPU-compile-expensive, opt-in; see hept_attention_core_xcols).
    fold_unsort: bool = False
    # Stacked flat batching: the flat n axis holds this many equal-size
    # events, each riding the bucket sorts as its own batch row (linear in
    # B; no batch-index AND codes). See hept_attention_core_xcols.
    sort_events: int = 1
    # Feed the bucket kernels bf16 operands (MXU-native one-pass dots, half
    # the kernel HBM bytes; f32 accumulation). See hept_attention_core_xcols.
    kernel_bf16: bool = False
    # Canonical-residual mode: inputs/outputs ride in round-0 sorted order
    # and `plan` is the 5-tuple from static_bucket_plan(canonical=True).
    # See hept_attention_core_xcols.
    canon: bool = False
    # Per-bucket centering of the RPE columns before any bf16 cast — exact
    # in f32 (RBF logits are shift-invariant), rescues kernel_bf16/sort_pack
    # precision at large sqrt_w. See hept_attention_core_xcols.
    kernel_center: bool = False
    # ROW-major unsort (flat row gather instead of the minor-axis sort) and
    # row-major (n, h·dv) output straight into out_linear. Works with static
    # plans (canon or not) AND dynamic per-step keys (inverses from one
    # 2-operand argsort of q_src) — exact in all modes. See
    # hept_attention_core_xcols.
    unsort_rows: bool = False
    # EXACT dynamic-key fast path: replace the payload-carrying variadic
    # sorts with 2-operand key argsorts + broadcast-source row gathers
    # (forward AND backward — no backward sort). Same placements/rounding
    # as the sort-carry; no-op under a static plan. See
    # hept_attention_core_xcols.
    gather_sort: bool = False
    # Transport groups: the static plan's permutations are GROUP-level (g
    # points per gathered row; inputs/outputs ride in round-0 sorted order).
    # See hept_attention_core_xcols / TransformerConfig.transport_groups.
    plan_groups: int = 1
    # Bucket-axis intra-event sequence parallelism (parallel/bp.py, SURVEY
    # §2.9 stretch SP): when set, this module runs inside an enclosing
    # shard_map carrying this mesh axis and each layer's sorted bucket grid
    # shards over it via `bucket_sharded_core` (requires share_heads, no
    # static plan, f32 transport; set by make_bucket_train_step on the
    # LOCAL config). None = single-chip semantics.
    bucket_axis: str | None = None
    bucket_shards: int = 1
    bucket_transport: str = "replicated"  # "replicated" | "distributed"
    bucket_cap_factor: float = 2.0

    @nn.compact
    def __call__(self, query, key, value, *, coords, codes, w_rpe_weight,
                 invalid=None, wq=None, wk=None, wv=None, plan=None, **_):
        """Args:
          query/key/value: (n, num_heads * h_dim) projections; under
            post_sort, `query` is the (n, h_dim) normed hidden state and
            key/value are unused (the wq/wk/wv kernels project post-sort).
          coords: (n, coords_dim) (pad rows zeroed by the caller).
          codes: (n_hashes, num_heads, n) AND codes.
          invalid: optional (n,) bool — rows forced to trailing buckets.
        Returns: (n, h_dim).
        """
        n = query.shape[0]
        h, d = self.num_heads, self.h_dim
        hash_dim = d + self.coords_dim

        if self.post_sort:
            from ...ops.bucket_attn import hept_attention_core_xcols

            w = w_rpe_weight.reshape(h, d, self.coords_dim - 1, self.num_w_per_dist)
            qw = jnp.exp(jnp.minimum(w.sum(axis=1), 50.0)).sum(axis=-1)
            qw_expanded = jnp.concatenate([qw[:, :1], qw], axis=-1)
            sqrt_w = jnp.sqrt(2.0 * qw_expanded)  # (h, cd)
            alpha_heads = 1 if self.share_heads else h
            alpha = self.variable(
                "constants",
                "e2lsh_alpha",
                lambda: e2lsh_init(
                    self.make_rng("params"), alpha_heads, hash_dim, self.n_hashes
                ),
            ).value
            if self.bucket_axis is not None:
                # bucket-axis SP: the sorted bucket grid shards over the
                # enclosing shard_map's `bucket_axis`; collectives live
                # inside bucket_sharded_core (psum/all_to_all by axis name).
                from ...parallel.bp import bucket_sharded_core

                assert self.share_heads, "bucket SP requires share_heads"
                assert plan is None, "bucket SP has no static-plan path"
                assert not self.sort_pack and not self.unsort_pack, (
                    "bucket SP is f32-transport only (v1)"
                )
                assert self.sort_events == 1, "bucket SP shards ONE event"
                out = bucket_sharded_core(
                    query.T, coords.T, wq, wk, wv, sqrt_w, alpha, codes,
                    invalid,
                    axis=self.bucket_axis,
                    n_shards=self.bucket_shards,
                    block_size=self.block_size,
                    sort_ops=self.sort_ops,
                    transport=self.bucket_transport,
                    cap_factor=self.bucket_cap_factor,
                )  # (h, d, n) columns, replicated over the bucket axis
                out = out.reshape(h * d, n).T
                return TorchLinear(d, name="out_linear")(out)
            out = hept_attention_core_xcols(
                query.T,  # (d_model, n) shared normed hidden
                coords.T,
                wq, wk, wv, sqrt_w, alpha, codes, invalid, plan,
                block_size=self.block_size,
                impl=self.impl,
                sort_pack=self.sort_pack,
                sort_ops=self.sort_ops,
                unsort_pack=self.unsort_pack,
                hash_axis=self.hash_axis,
                shared_sort=self.shared_sort,
                share_heads=self.share_heads,
                fold_unsort=self.fold_unsort,
                sort_events=self.sort_events,
                kernel_bf16=self.kernel_bf16,
                canon=self.canon,
                kernel_center=self.kernel_center,
                unsort_rows=self.unsort_rows,
                gather_sort=self.gather_sort,
                plan_groups=self.plan_groups,
            )  # (h, d, n) columns, or (n, h·d) rows under unsort_rows
            if not self.unsort_rows:
                out = out.reshape(h * d, n).T
            if self.head_axis is not None:
                out = jax.lax.all_gather(out, self.head_axis, axis=1, tiled=True)
            return TorchLinear(d, name="out_linear")(out)

        # Column layout ((h, d, n)) end to end: the sort pipeline and bucket
        # kernels consume columns natively, so the core runs transpose-free
        # with one cheap (n, h*d) <-> (h*d, n) flip at each boundary.
        q_cols = query.T.reshape(h, d, n)
        k_cols = key.T.reshape(h, d, n)
        v_cols = value.T.reshape(h, d, n)

        # prep_qk math (reference hept.py:36-43) in column layout.
        w = w_rpe_weight.reshape(h, d, self.coords_dim - 1, self.num_w_per_dist)
        qw = jnp.exp(jnp.minimum(w.sum(axis=1), 50.0)).sum(axis=-1)  # (h, r)
        qw_expanded = jnp.concatenate([qw[:, :1], qw], axis=-1)  # (h, cd)
        sqrt_w = jnp.sqrt(2.0 * qw_expanded)  # (h, cd)
        w_cols = sqrt_w[:, :, None] * coords.T[None]  # (h, cd, n)
        q_hat = jnp.concatenate([q_cols, w_cols], axis=1)  # (h, hash_dim, n)
        k_hat = jnp.concatenate([k_cols, w_cols], axis=1)

        if invalid is not None:
            # src-variant padding: zero padded rows of q̂/k̂/v
            # (reference hept.py:89-91).
            keep = jnp.logical_not(invalid)[None, None, :]
            q_hat = jnp.where(keep, q_hat, 0.0)
            k_hat = jnp.where(keep, k_hat, 0.0)
            v_cols = jnp.where(keep, v_cols, 0.0)

        alpha = self.variable(
            "constants",
            "e2lsh_alpha",
            lambda: e2lsh_init(self.make_rng("params"), h, hash_dim, self.n_hashes),
        ).value

        out = hept_attention_core_cols(
            q_hat,
            k_hat,
            v_cols,
            alpha,
            codes,
            invalid,
            block_size=self.block_size,
            impl=self.impl,
            sort_pack=self.sort_pack,
            sort_ops=self.sort_ops,
            unsort_pack=self.unsort_pack,
            hash_axis=self.hash_axis,
        )  # (h, d, n)
        out = out.reshape(h * d, n).T
        if self.head_axis is not None:
            # reassemble (n, h_global*d) head-major across the TP axis; the
            # out-projection then runs replicated with the full kernel.
            out = jax.lax.all_gather(out, self.head_axis, axis=1, tiled=True)
        return TorchLinear(d, name="out_linear")(out)
