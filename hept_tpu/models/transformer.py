"""HEPT transformer backbone (flax).

Mirrors the reference skeleton (src/models/baselines/transformer.py:66-157,
example/transformer.py:66-128): feature-MLP encoder → N pre-LN attention
blocks with residual + FF → concat of all layer outputs → bias-free `W`
projection → 5-layer tanh/LayerNorm MLP residual head → task head (pileup:
PID embedding at input, sigmoid out_proj at output).

The model is defined on ONE event with static shapes; batched imbalanced
point clouds are handled two TPU-style ways: `make_batched_apply` (vmap over
a dense (B, N_max, ...) layout) and `make_flat_batched_apply` (one flat
forward with batch-index AND codes — the reference example's design, and the
fast path for small events where per-sort-call latency dominates).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..core.buckets import bit_shift, permute_gather
from ..core.hashing import e2lsh_init
from ..core.padding import replication_pad_plan
from ..core.regions import geo_code, get_regions, region_codes
from .attention.hept import HeptAttention
from .mlp import FeedForward, OutMLP, TorchLinear


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    """Model hyperparameters (reference tracking_trans_hept.yaml:11-19)."""

    in_dim: int
    coords_dim: int
    task: str = "tracking"  # "tracking" | "pileup"
    attn_type: str = "hept"
    h_dim: int = 24
    num_heads: int = 8
    n_layers: int = 4
    block_size: int = 100
    n_hashes: int = 3
    num_regions: int = 150
    num_w_per_dist: int = 10
    num_and_hashes: int = 2
    dropout: float = 0.1
    padding_mode: str = "zero"  # "zero" (src parity) | "replicate" (example)
    # bucket-kernel impl: "xla" einsums | "pallas" per-bucket-loop kernels |
    # "hybrid" (xla einsum fwd + pallas bwd) | "slab" (block-diagonal-masked
    # slab kernels fwd+bwd — one big MXU dot per g buckets, no serial
    # per-bucket chain) | "hybrid_slab" (xla fwd + slab bwd) | "hybrid2"
    # (xla fwd + bf16-operand Pallas bwd with f32-grade numerics — hi/lo
    # dlt split + exact f32 bias broadcasts; _bwd_cols_kernel_v2) |
    # "hybrid2l" (hybrid2 with the v2 backward fori_loop-scheduled: same
    # math, g unbounded by unrolled temporaries — fewer grid steps) |
    # "loop2" (fori_loop fwd + fori_loop v2 bwd; p never leaves VMEM; fwd
    # bias transport differs from the einsum fwd at ~bf16² — convergence-
    # armed before production use)
    attn_impl: str = "xla"
    sort_pack: bool = False  # bf16-packed sort payloads in HEPT attention
    sort_ops: int = 1  # payload operands per sort call (see grouped_sort_carry)
    # bf16-packed unsort of the attention numerator/denominator (the
    # OR-combine accumulands): halves the unsort's sort traffic at ~0.4%
    # relative rounding on pre-out_linear activations (inputs already move
    # as bf16 under sort_pack). Convergence-validated on synthetic tracking.
    unsort_pack: bool = False
    # Sort the shared [x|coords] columns per key order and apply w_q/w_k/w_v
    # AFTER the bucket sort (60 sorted columns/layer instead of 84 — the
    # sort-traffic lever; ops/bucket_attn.py hept_attention_core_xcols).
    # Same param tree and math, fp32-reordering-level differences only.
    qkv_post_sort: bool = False
    # TPU fast mode (requires qkv_post_sort): bucket queries by the KEY hash
    # order — one sorted [x|coords] copy serves q, k and v, halving the
    # dominant sort call. Diverges from the reference's independent q/k
    # argsorts (hept.py:103-104); convergence-validated on synthetic
    # tracking (PARITY.md divergences).
    shared_sort: bool = False
    # TPU fast mode (requires qkv_post_sort): ONE bucket grid per OR-hash
    # round shared by ALL heads — keys hash the shared [x|coords] with
    # per-hash directions, so the per-layer sort/unsort runs n_hashes
    # comparator rows instead of n_hashes·num_heads and the sorted
    # [x|coords] payload is one copy instead of num_heads (the 8x
    # sort-traffic lever). Implies shared_sort. Diverges from the
    # reference's per-head hashing (hept.py:93-104); convergence-validated
    # on synthetic tracking (PARITY.md divergences).
    share_heads: bool = False
    # With share_heads: fold every head's [num|denom] into one c-row unsort
    # call (fewer comparator rows, many sort operands — TPU-compile-heavy;
    # see ops/bucket_attn.py).
    fold_unsort: bool = False
    # TPU fast mode (requires share_heads): LAYER-INVARIANT bucket keys.
    # Hash once per step — True/"x0" hashes the standardized encoder output
    # + scaled coords, "coords" hashes scaled coords alone — and reuse the
    # per-round permutations in every layer: the per-layer [x|coords] sorts
    # become packed gathers (~4x cheaper each way, no lax.sort call floor;
    # ops/bucket_attn.py static_bucket_plan). Diverges from the reference's
    # per-layer re-hash of evolved features (hept.py:93-104); convergence-
    # gated like shared_sort/share_heads (PARITY.md divergences).
    static_keys: Any = False  # False | True | "x0" | "coords"
    # With static_keys: AND-compose a second quantized hash direction into
    # the per-round static key (this many bins; 0 = off). At 60k scale one
    # region cell spans ~4 buckets and a single static direction loses
    # bucket locality — the measured cause of the 60k/lr=1e-2 divergence
    # (ROADMAP round-3); the AND bin restores 2-D locality the same way the
    # reference's region AND codes do.
    static_and_bins: int = 0
    # With static_keys: build the once-per-step plan with this many OR
    # rounds (multiple of n_hashes; 0 = n_hashes) and give each layer a
    # cyclic n_hashes-round subset. The reference's per-layer re-hash gives
    # a 4-layer stack 4·n_hashes DISTINCT rounds — true-pair co-bucketing
    # union 0.988 at 60k vs 0.879 for 3 shared static rounds
    # (scripts/probe_cobucket.py); static_rounds=2·n_hashes recovers 0.968
    # for one extra plan sort instead of per-layer sorts. Incompatible with
    # canon_residual (no layer subset can keep the free canonical round).
    static_rounds: int = 0
    # TPU fast mode (requires static_keys): keep the residual stream in
    # round-0's sorted order — the CANONICAL order — for the whole layer
    # stack. Round 0 then needs no per-layer x-gather and no output unsort
    # (rounds 1.. use composed permutations precomputed in the plan), cutting
    # the unsort wall by 1/n_hashes in both directions. A pure storage
    # reordering of static_keys: same buckets, same math (LayerNorm/FF/head
    # are row-local) — bitwise-equal outputs after reordering with packing
    # off; NOT a new convergence-gated divergence. One gather into canonical
    # order after the encoder, one gather back after the head.
    canon_residual: bool = False
    # Stacked flat batching (requires qkv_post_sort): the flat point axis
    # holds this many equal-size events, each bucket-sorted as its own batch
    # row — linear in B, no batch-index AND codes (ops/bucket_attn.py
    # sort_events). Set by make_flat_batched_apply(stacked=True) configs.
    sort_events: int = 1
    # Feed the bucket kernels bf16 operands (requires qkv_post_sort): one-
    # pass MXU dots + half the kernel HBM bytes; values are bf16-rounded by
    # sort_pack anyway, bias terms ride double-bf16 rows in the Pallas
    # kernels. Convergence-validated divergence (PARITY.md).
    kernel_bf16: bool = False
    # Center the RPE coordinate columns per bucket (common per-bucket mean
    # subtracted from both q̂ and k̂ — the RBF logits
    # q·k - ½|q|² - ½|k|² = -½|q̂-k̂|² are exactly shift-invariant, so this
    # changes nothing in f32). Purpose: the rpe signal between bucket
    # neighbours is sqrt_w·Δcoord = O(bucket diameter) while the stored
    # values are sqrt_w·coord = O(sqrt_w·|coord|); bf16's 2⁻⁸ relative
    # rounding on the RAW values drowns the local differences once training
    # grows sqrt_w (measured: sqrt_w 9.9 → 18.6 within 24 steps at 60k,
    # scripts/diag_ckpt.py), which is the precision wall behind the
    # kernel_bf16/sort_pack 60k instability. Centering makes the stored
    # magnitudes O(diameter) so bf16 rounding is harmless. With static_keys
    # the plan also carries its sorted coords in f32 (transport rounding
    # matters for the same reason).
    kernel_center: bool = False
    # ROW-major unsort — one lane transpose, then the reorder back to
    # natural (or canonical) order is a flat row gather of contiguous
    # feature rows instead of a minor-axis lax.sort (~2x the unsort wall,
    # scripts/probe_unsort_row.py), and the attention output stays row-major
    # straight into out_linear (the column pipeline's final transpose
    # disappears). Works with static plans AND dynamic per-step keys
    # (including the reference-parity per-head pipeline — the inverse
    # permutations come from one cheap 2-operand argsort of q_src). Pure
    # layout change: same math, same rounding profile as the sort-carry
    # unsort under unsort_pack.
    unsort_rows: bool = False
    # TRANSPORT GROUPS (requires static_keys + unsort_rows; excludes
    # canon_residual): the model's storage order becomes round-0's full
    # sorted order σ (one entry gather after the encoder, one exit gather
    # after the head), and every round's x-gather / [num|denom]-unsort moves
    # g points per gathered row via GROUP-level permutations (group = g
    # consecutive points in σ; group key = min of member keys). The row
    # gather is issue-rate-bound (~14 ns/row regardless of width), so this
    # cuts the transport wall ~g× fwd+bwd. Convergence-gated divergence:
    # bucket composition coarsens to σ-adjacent g-clusters
    # (ops/bucket_attn.py static_bucket_plan group_size; recall probe:
    # scripts/probe_cobucket.py). block_size must divide by g.
    transport_groups: int = 1
    # EXACT dynamic-key fast path (ops/bucket_attn.py gather_sort): replace
    # the payload-carrying variadic sorts with 2-operand key argsorts plus
    # broadcast-source row gathers of [x|coords] — no payload ever rides a
    # lax.sort comparator, forward or backward. Same placements and
    # rounding as the sort-carry (tests/test_gather_sort.py), so it is an
    # allowed lever for the strict reference-parity mode (per-head dynamic
    # keys are exactly where it bites: the parity step's wall is the f32
    # 30-operand payload sorts). No-op when static_keys supplies a plan.
    gather_sort: bool = False
    num_classes: int = 1  # pileup head width
    # baseline-attention knobs (reference configs/*)
    pe_type: str = "none"  # none | learned | fixed
    use_ckpt: bool = False  # rematerialize attention blocks (reference use_ckpt)
    nb_features: int = 200  # performer / flt outer features
    nb_features_inner: int = 6  # flt inner RFF features
    bucket_size: int = 100  # reformer / smyrf cluster size
    # reformer duplicate-pair / cross-bucket controls (reference
    # reformer.py:74-76 defaults)
    allow_duplicate_attention: bool = True
    attend_across_buckets: bool = True
    knn_k: int = 16  # pct/gnn in-jit kNN graph degree (reference datasets: 60)
    out_dim: Optional[int] = None  # GNN head width override (gnns.py:29-34)
    b_grid: int = 1000  # flatformer discretization bins (reference "B")
    num_slices_per_axis: int = 30  # flatformer window count per axis
    # Trace/compile the attention stack once via lax.scan over stacked layer
    # params instead of unrolling n_layers copies (TPU compile-time lever; no
    # reference counterpart). Params move to blocks/block/... with a leading
    # n_layers axis — see stack_layer_params/unstack_layer_params.
    scan_layers: bool = False
    # Head-sharded tensor parallelism (parallel/tp.py): set by the TP train
    # step on the LOCAL model config — the mesh axis name the per-chip head
    # slice all-gathers over before out_linear. None = single-chip semantics.
    head_axis: Optional[str] = None
    # Intra-event hash parallelism: mesh axis the OR-hash rounds shard over
    # (set by the TP train step on the LOCAL config; parallel/tp.py).
    hash_axis: Optional[str] = None
    # Bucket-axis intra-event sequence parallelism (parallel/bp.py): mesh
    # axis each layer's sorted bucket grid shards over (set by
    # make_bucket_train_step on the LOCAL config; requires share_heads +
    # qkv_post_sort, no static plan, f32 transport). None = single-chip.
    bucket_axis: Optional[str] = None
    bucket_shards: int = 1
    bucket_transport: str = "replicated"  # "replicated" | "distributed"
    bucket_cap_factor: float = 2.0


def _permute_rows(arr, src1, inv1, n_ev):
    """Apply a per-event row permutation to a row-major (n, d) array via the
    differentiable `permute_gather` (canonical-residual entry/exit: ~d·0.04 ms
    vs a ~5 ms lax.sort floor).

    src1/inv1: (1, n_ev, ne) forward/inverse maps; out[j] = arr[src1[j]]
    within each event row."""
    n, d = arr.shape
    ne = n // n_ev
    rows = jnp.moveaxis(arr.T.reshape(d, n_ev, ne), 1, 0)  # (n_ev, d, ne)
    g = permute_gather(rows, src1, inv1)  # (1, n_ev, d, ne)
    return jnp.moveaxis(g[0], 0, 1).reshape(d, n).T


class PELearned(nn.Module):
    """Learned absolute positional embedding (reference window_utils.py:23-41)."""

    h_dim: int

    @nn.compact
    def __call__(self, coords):
        h = TorchLinear(self.h_dim)(coords)
        h = nn.LayerNorm()(h)
        h = nn.relu(h)
        return TorchLinear(self.h_dim)(h)


class PESinusoidal(nn.Module):
    """Fixed sinusoidal PE over discretized eta/phi
    (reference window_utils.py:44-85): per-axis sin/cos interleave at
    temperature-scaled frequencies, zero-padded to h_dim."""

    h_dim: int
    pos_temperature: float = 10000.0
    bins: int = 1000

    @nn.compact
    def __call__(self, coords):
        from .attention.flatformer import discretize_coords

        dis = discretize_coords(coords[:, :2], self.bins)
        pos_length = (self.h_dim // 4) * 2
        freqs = jnp.arange(pos_length, dtype=jnp.float32)
        inv_freq = self.pos_temperature ** (2 * (freqs // 2) / pos_length)

        def enc(t):  # (n,) -> (n, pos_length)
            p = t[:, None] / inv_freq[None, :]
            return jnp.stack(
                [jnp.sin(p[:, ::2]), jnp.cos(p[:, 1::2])], axis=-1
            ).reshape(t.shape[0], -1)

        pe = jnp.concatenate([enc(dis[:, 0]), enc(dis[:, 1])], axis=-1)
        gap = self.h_dim - pe.shape[-1]
        if gap > 0:
            pe = jnp.concatenate([pe, jnp.zeros((pe.shape[0], gap))], axis=-1)
        return pe


def _make_attention(cfg: TransformerConfig):
    """Attention-mechanism factory (reference transformer.py:172-192)."""
    common = dict(h_dim=cfg.h_dim, num_heads=cfg.num_heads, name="attn")
    if cfg.attn_type == "hept":
        return HeptAttention(
            block_size=cfg.block_size,
            n_hashes=cfg.n_hashes,
            num_w_per_dist=cfg.num_w_per_dist,
            coords_dim=cfg.coords_dim,
            impl=cfg.attn_impl,
            sort_pack=cfg.sort_pack,
            sort_ops=cfg.sort_ops,
            unsort_pack=cfg.unsort_pack,
            head_axis=cfg.head_axis,
            hash_axis=cfg.hash_axis,
            bucket_axis=cfg.bucket_axis,
            bucket_shards=cfg.bucket_shards,
            bucket_transport=cfg.bucket_transport,
            bucket_cap_factor=cfg.bucket_cap_factor,
            post_sort=cfg.qkv_post_sort,
            shared_sort=cfg.shared_sort,
            share_heads=cfg.share_heads,
            fold_unsort=cfg.fold_unsort,
            sort_events=cfg.sort_events,
            kernel_bf16=cfg.kernel_bf16,
            canon=cfg.canon_residual,
            kernel_center=cfg.kernel_center,
            unsort_rows=cfg.unsort_rows,
            gather_sort=cfg.gather_sort,
            plan_groups=cfg.transport_groups,
            **common,
        )
    if cfg.attn_type == "performer":
        from .attention.performer import PerformerAttention

        return PerformerAttention(
            nb_features=cfg.nb_features,
            num_w_per_dist=cfg.num_w_per_dist,
            coords_dim=cfg.coords_dim,
            pe_type=cfg.pe_type,
            **common,
        )
    if cfg.attn_type == "flt":
        from .attention.flt import FLTAttention

        return FLTAttention(
            nb_features=cfg.nb_features,
            nb_features_inner=cfg.nb_features_inner,
            num_w_per_dist=cfg.num_w_per_dist,
            coords_dim=cfg.coords_dim,
            **common,
        )
    if cfg.attn_type == "reformer":
        from .attention.reformer import ReformerAttention

        return ReformerAttention(
            bucket_size=cfg.bucket_size,
            n_hashes=cfg.n_hashes,
            allow_duplicate_attention=cfg.allow_duplicate_attention,
            attend_across_buckets=cfg.attend_across_buckets,
            **common,
        )
    if cfg.attn_type == "smyrf":
        from .attention.smyrf import SmyrfAttention

        return SmyrfAttention(
            bucket_size=cfg.bucket_size,
            n_hashes=cfg.n_hashes,
            num_w_per_dist=cfg.num_w_per_dist,
            coords_dim=cfg.coords_dim,
            pe_type=cfg.pe_type,
            **common,
        )
    if cfg.attn_type == "sb":
        from .attention.sb import SBAttention

        return SBAttention(
            bucket_size=cfg.bucket_size,
            n_hashes=cfg.n_hashes,
            nb_features=cfg.nb_features,
            num_w_per_dist=cfg.num_w_per_dist,
            coords_dim=cfg.coords_dim,
            pe_type=cfg.pe_type,
            **common,
        )
    if cfg.attn_type == "pct":
        from .attention.pct import PCTAttention

        return PCTAttention(coords_dim=cfg.coords_dim, **common)
    if cfg.attn_type == "flatformer":
        from .attention.flatformer import FlatformerAttention

        return FlatformerAttention(
            group_size=cfg.bucket_size,
            num_w_per_dist=cfg.num_w_per_dist,
            pe_type=cfg.pe_type,
            b_grid=cfg.b_grid,
            num_slices_per_axis=cfg.num_slices_per_axis,
            **common,
        )
    raise NotImplementedError(cfg.attn_type)


class AttnBlock(nn.Module):
    """Pre-LN attention block with attention-type dispatch
    (reference transformer.py:160-229)."""

    cfg: TransformerConfig

    @nn.compact
    def __call__(self, x, *, coords, codes, invalid, valid, edges, edge_mask,
                 deterministic: bool, plan=None):
        cfg = self.cfg
        h, d = cfg.num_heads, cfg.h_dim

        # w_rpe: torch-layout weight (out, in) of the reference's Linear
        # (transformer.py:205); bias exists there but is never used.
        rpe_in = cfg.num_w_per_dist * (cfg.coords_dim - 1)
        bound = 1.0 / jnp.sqrt(rpe_in)
        w_rpe = self.param(
            "w_rpe",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -bound, bound),
            (h * d, rpe_in),
        )

        pe = None
        if cfg.attn_type != "hept":
            if cfg.pe_type == "learned":
                pe = PELearned(d, name="pe")(coords)
            elif cfg.pe_type == "fixed":
                pe = PESinusoidal(d, name="pe")(coords)

        attn = _make_attention(cfg)

        if cfg.attn_type == "flatformer":
            # Flatformer replaces the whole block (transformer.py:226-227):
            # 4 inner BasicLayers over serpentine orderings, no outer
            # norm/residual/FF. Returns (x, [4 intermediate outputs]).
            return attn(
                x,
                coords=coords,
                pe=pe if pe is not None else coords,
                valid=valid,
                w_rpe_weight=w_rpe,
            )

        if cfg.attn_type == "pct":
            # PCT path (transformer.py:220-224): only w_q, no residual qkv.
            aggr = attn(
                TorchLinear(d * h, use_bias=False, name="w_q")(
                    nn.LayerNorm(name="norm1")(x)
                ),
                coords=coords,
                valid=valid,
                edges=edges,
                edge_mask=edge_mask,
            )
        elif cfg.attn_type == "hept" and cfg.qkv_post_sort:
            # post-sort projections: declare the same w_q/w_k/w_v kernel
            # params (identical tree) but apply them inside the attention
            # core AFTER the bucket sort (ops/bucket_attn.py xcols pipeline).
            from .mlp import KernelOnly

            x_normed = nn.LayerNorm(name="norm1")(x)

            def heads(kern):  # (d, h*d) -> (h, d, d) head-major
                return kern.reshape(d, h, d).transpose(1, 0, 2)

            aggr = attn(
                x_normed, None, None,
                coords=coords,
                codes=codes,
                w_rpe_weight=w_rpe,
                invalid=invalid,
                valid=valid,
                plan=plan,
                wq=heads(KernelOnly(d * h, name="w_q")(d)),
                wk=heads(KernelOnly(d * h, name="w_k")(d)),
                wv=heads(KernelOnly(d * h, name="w_v")(d)),
            )
        else:
            x_pe = x + pe if pe is not None else x
            x_normed = nn.LayerNorm(name="norm1")(x_pe)
            q = TorchLinear(d * h, use_bias=False, name="w_q")(x_normed)
            k = TorchLinear(d * h, use_bias=False, name="w_k")(x_normed)
            v = TorchLinear(d * h, use_bias=False, name="w_v")(x_normed)
            aggr = attn(
                q, k, v,
                coords=coords,
                codes=codes,
                w_rpe_weight=w_rpe,
                invalid=invalid,
                valid=valid,
            )
        x = x + nn.Dropout(cfg.dropout, deterministic=deterministic)(aggr)
        ff = FeedForward(d, name="ff")(nn.LayerNorm(name="norm2")(x))
        x = x + nn.Dropout(cfg.dropout, deterministic=deterministic)(ff)
        return x


def _remat_block(block, deterministic: bool):
    """Rematerialized AttnBlock call (reference transformer.py:138-140's
    torch.utils.checkpoint). `deterministic` is closed over as a Python
    bool: flax's nn.remat traces every call argument — including bool
    kwargs — so passing it through the remat boundary turns nn.Dropout's
    branch into a TracerBoolConversionError (caught by
    tests/test_model.py::TestScanLayers::test_use_ckpt_matches_plain)."""

    def call(mdl, h, coords, codes, invalid, valid, edges, edge_mask, plan):
        return mdl(
            h, coords=coords, codes=codes, invalid=invalid, valid=valid,
            edges=edges, edge_mask=edge_mask, deterministic=deterministic,
            plan=plan,
        )

    return lambda *args: nn.remat(call)(block, *args)


class _ScanBody(nn.Module):
    """One scan step over the attention stack: carry = hidden state,
    y = this layer's output (for the concat-all-layers head)."""

    cfg: TransformerConfig
    deterministic: bool

    @nn.compact
    def __call__(self, h, coords, codes, invalid, valid, edges, edge_mask,
                 plan):
        block = AttnBlock(self.cfg, name="block")
        if self.cfg.use_ckpt:
            out = _remat_block(block, self.deterministic)(
                h, coords, codes, invalid, valid, edges, edge_mask, plan
            )
        else:
            out = block(
                h, coords=coords, codes=codes, invalid=invalid, valid=valid,
                edges=edges, edge_mask=edge_mask,
                deterministic=self.deterministic, plan=plan,
            )
        return out, out


def stack_layer_params(tree: dict, n_layers: int, prefix: str = "block_") -> dict:
    """Convert loop-layout variables ({block_0: .., block_1: ..}) to the
    scan layout ({blocks: {block: stacked-along-axis-0}}). Works on any
    collection (params / constants)."""
    rest = {k: v for k, v in tree.items() if not k.startswith(prefix)}
    layers = [tree[f"{prefix}{i}"] for i in range(n_layers)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *layers)
    rest["blocks"] = {"block": stacked}
    return rest


def unstack_layer_params(tree: dict, prefix: str = "block_") -> dict:
    """Inverse of `stack_layer_params`."""
    rest = {k: v for k, v in tree.items() if k != "blocks"}
    stacked = tree["blocks"]["block"]
    n_layers = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    for i in range(n_layers):
        rest[f"{prefix}{i}"] = jax.tree_util.tree_map(lambda x: x[i], stacked)
    return rest


class HeptTransformer(nn.Module):
    """Single-event HEPT transformer with static shapes.

    Inputs:
      x: (N, in_dim) features (pileup: last column is the integer PID).
      coords: (N, coords_dim); columns 0/1 are eta/phi.
      valid: (N,) bool — real points. N must be a multiple of block_size.
    Returns:
      (N, out_dim) — embeddings (tracking) or sigmoid probabilities (pileup);
      callers mask rows with `valid`.
    """

    cfg: TransformerConfig

    @nn.compact
    def __call__(self, x, coords, valid, *, deterministic: bool = True,
                 prepared=None):
        """`prepared`: optional (x, coords, codes, invalid, edges, edge_mask)
        from an external `_prepare_event` pass — the flat-batch path
        (`make_flat_batched_apply`) prepares per event, concatenates with
        batch-index AND codes (the reference example's batched design,
        example/transformer.py:55-56), and skips the in-model prepare."""
        cfg = self.cfg
        n = x.shape[0]
        assert n % cfg.block_size == 0, "N must be a multiple of block_size"

        regions = None
        if cfg.attn_type == "hept":
            regions = self.variable(
                "constants",
                "regions",
                lambda: get_regions(
                    self.make_rng("params"),
                    cfg.num_regions,
                    cfg.n_hashes,
                    cfg.num_heads,
                    cfg.num_and_hashes,
                ),
            ).value

        if prepared is None:
            x, coords, codes, invalid, edges, edge_mask = _prepare_event(
                x, coords, valid, regions, cfg
            )
        else:
            x, coords, codes, invalid, edges, edge_mask = prepared

        if cfg.task == "pileup":
            pids = x[..., -1].astype(jnp.int32)
            pid_emb = nn.Embed(7, 10, name="pids_enc")(jnp.clip(pids, 0, 6))
            x = jnp.concatenate([x[..., :-1], pid_emb], axis=-1)

        h = TorchLinear(cfg.h_dim, name="feat_enc_0")(x)
        h = nn.relu(h)
        h = TorchLinear(cfg.h_dim, name="feat_enc_1")(h)

        plan = None
        plan_stacked = False  # (n_layers, n_hashes, ...) per-layer sub-plans
        if cfg.attn_type == "hept" and cfg.static_keys:
            # static_keys fast mode: hash ONCE per step (encoder output or
            # coords only) and let every layer reuse the permutations —
            # the per-layer [x|coords] sorts become packed gathers
            # (ops/bucket_attn.py static_bucket_plan; convergence-gated
            # divergence, PARITY.md). Requires share_heads.
            assert cfg.share_heads and cfg.qkv_post_sort, \
                "static_keys requires share_heads + qkv_post_sort"
            from ..ops.bucket_attn import static_bucket_plan, static_hash

            total_rounds = cfg.static_rounds or cfg.n_hashes
            nh = cfg.n_hashes
            if cfg.static_rounds and cfg.static_rounds != nh:
                if cfg.canon_residual:
                    # pinned-round-0 scheme: every layer's subset is
                    # [0, <nh-1 cycling rounds from 1..total-1>] — the
                    # canonical round stays shared (and free: no gather, no
                    # unsort) in every layer, diversity rides the rest.
                    if nh < 2 or (cfg.static_rounds - 1) % (nh - 1):
                        raise ValueError(
                            "with canon_residual, static_rounds must be "
                            "1 + k*(n_hashes-1)"
                        )
                elif cfg.static_rounds % nh:
                    raise ValueError(
                        "static_rounds must be a multiple of n_hashes"
                    )
            alpha_s = self.variable(
                "constants",
                "static_alpha",
                lambda: e2lsh_init(
                    self.make_rng("params"),
                    2 if cfg.static_and_bins else 1,
                    cfg.h_dim + cfg.coords_dim, total_rounds,
                ),
            ).value
            variant = ("coords" if cfg.static_keys == "coords" else "x0")
            scale = float(np.sqrt(2.0 * cfg.num_w_per_dist))
            hashed = static_hash(h.T, coords.T, alpha_s, scale, variant,
                                 and_bins=cfg.static_and_bins)
            codes0 = codes[:, 0]  # (n_hashes, n) AND codes, head 0
            if total_rounds != nh:
                # per-round AND-code rows for the extended plan (cyclic;
                # pinned scheme keeps row 0 for the canonical round)
                if cfg.canon_residual:
                    rows = [0] + [1 + t % (nh - 1)
                                  for t in range(total_rounds - 1)]
                else:
                    rows = [t % nh for t in range(total_rounds)]
                codes0 = codes0[jnp.asarray(rows)]
            if cfg.transport_groups > 1:
                assert not cfg.canon_residual, \
                    "transport_groups subsumes canon (σ IS round-0 order)"
                assert cfg.unsort_rows, "transport_groups requires unsort_rows"
                assert cfg.block_size % cfg.transport_groups == 0
            plan = static_bucket_plan(
                hashed, codes0, invalid, coords.T,
                sort_events=cfg.sort_events, sort_pack=cfg.sort_pack,
                sort_ops=cfg.sort_ops, canonical=cfg.canon_residual,
                coords_f32=cfg.kernel_center,
                group_size=cfg.transport_groups,
            )
            if cfg.transport_groups > 1:
                # σ entry: the residual stream, pad mask — and everything
                # row-local after — ride in σ = (region code, Morton)
                # order; the plan carries expanded per-point perms (x/
                # coords column gathers) + group-level perms (rows
                # unsort), all relative to σ. One gather back after the
                # head (shared exit path with canon).
                src0, inv0 = plan[5], plan[6]
                plan = plan[:5]
                h = _permute_rows(h, src0, inv0, cfg.sort_events)
                invalid = jnp.take_along_axis(
                    invalid.reshape(cfg.sort_events, -1), src0[0], axis=1
                ).reshape(-1)
            else:
                src0, inv0 = plan[0][:1], plan[1][:1]  # global round 0
            if total_rounds != nh:
                # per-layer n_hashes-round subsets of the big plan — the
                # scan consumes the plan as a scanned input (axis 0), one
                # sub-plan per step. Non-canon: cyclic blocks
                # [(l·nh + j) % total]. Canon: pinned round 0 + cycling
                # rest, so the canonical round stays first (identity f)
                # in every layer's sub-plan.
                if cfg.canon_residual:
                    idx = jnp.asarray(
                        [[0] + [1 + (l * (nh - 1) + j) % (total_rounds - 1)
                                for j in range(nh - 1)]
                         for l in range(cfg.n_layers)]
                    )
                else:
                    idx = jnp.asarray(
                        [[(l * nh + j) % total_rounds for j in range(nh)]
                         for l in range(cfg.n_layers)]
                    )
                plan = tuple(a[idx] for a in plan)
                plan_stacked = True
            if cfg.canon_residual:
                # enter canonical (round-0 sorted) order: the residual
                # stream, pad mask — and everything row-local after — ride
                # in this order; one gather back after the head.
                h = _permute_rows(h, src0, inv0, cfg.sort_events)
                invalid = jnp.take_along_axis(
                    invalid.reshape(cfg.sort_events, -1), src0[0], axis=1
                ).reshape(-1)
        elif cfg.canon_residual:
            raise ValueError("canon_residual requires static_keys")

        if cfg.scan_layers and cfg.attn_type != "flatformer":
            # one traced/compiled layer body; params stacked on axis 0
            scan_cls = nn.scan(
                _ScanBody,
                variable_axes={"params": 0, "constants": 0},
                split_rngs={"params": True, "dropout": True},
                # coords..edge_mask broadcast; plan broadcast unless it is
                # per-layer sub-plans (static_rounds), then scanned on axis 0
                in_axes=(nn.broadcast,) * 6
                + ((0,) if plan_stacked else (nn.broadcast,)),
                out_axes=0,
                length=cfg.n_layers,
            )
            h0 = h
            h, ys = scan_cls(cfg, deterministic, name="blocks")(
                h, coords, codes, invalid, valid, edges, edge_mask, plan
            )
            n = h.shape[0]
            # (n_layers, N, d) -> per-point [layer0 | layer1 | ...] columns,
            # matching the loop version's concatenation order.
            cat = jnp.concatenate(
                [h0, ys.transpose(1, 0, 2).reshape(n, cfg.n_layers * cfg.h_dim)],
                axis=-1,
            )
        else:
            all_layers = [h]
            for i in range(cfg.n_layers):
                plan_i = (tuple(a[i] for a in plan) if plan_stacked else plan)
                block = AttnBlock(cfg, name=f"block_{i}")
                if cfg.use_ckpt:
                    # activation rematerialization (reference
                    # transformer.py:138-140's torch.utils.checkpoint, as
                    # nn.remat; deterministic closes over as a static bool —
                    # see _remat_block)
                    out = _remat_block(block, deterministic)(
                        h, coords, codes, invalid, valid, edges, edge_mask,
                        plan_i,
                    )
                else:
                    out = block(
                        h, coords=coords, codes=codes, invalid=invalid,
                        valid=valid, edges=edges, edge_mask=edge_mask,
                        deterministic=deterministic, plan=plan_i,
                    )
                if cfg.attn_type == "flatformer":
                    # concat all 4 inner-layer outputs (transformer.py:134-136;
                    # W width h_dim * (n_layers*4 + 1), transformer.py:106)
                    h, shifts = out
                    all_layers.extend(shifts)
                else:
                    h = out
                    all_layers.append(h)

            cat = jnp.concatenate(all_layers, axis=-1)
        out = TorchLinear(cfg.h_dim // 2, use_bias=False, name="W")(cat)
        mlp = OutMLP(cfg.h_dim // 2, name="mlp_out")(out)
        out = out + nn.Dropout(cfg.dropout, deterministic=deterministic)(mlp)

        if cfg.task == "pileup":
            out = TorchLinear(cfg.num_classes, name="out_proj")(out)
            out = nn.sigmoid(out)

        if (cfg.canon_residual or cfg.transport_groups > 1) and plan is not None:
            # leave canonical/σ order: orig[i] = canon[inv0[i]] (src0/inv0
            # are the GLOBAL round-0 maps captured before sub-plan slicing)
            out = _permute_rows(out, inv0, src0, cfg.sort_events)

        # Real rows occupy their original slots in both padding modes
        # (replication pads only fill slots >= n_valid), so the caller's
        # `valid` mask indexes `out` directly.
        return out


def _prepare_event(x, coords, valid, regions, cfg: TransformerConfig):
    """Per-event precompute (runs once, shared by all layers).

    hept: AND codes + padding plan. zero mode (src parity,
    transformer.py:43-57): geo-shift codes from padded coords (pads sort
    last), pad rows zeroed afterwards. replicate mode (example parity,
    example/transformer.py:35-63): bit-packed codes; trailing-bucket pad
    slots replicate real rows by sorted code rank; slots beyond ceil(n/B)·B
    are inert whole buckets.

    pct: in-jit kNN graph on eta/phi with self loops — the TPU-regular
    replacement for the datasets' precomputed knn_graph(k=60) edge_index.

    Returns (x, coords, codes, invalid, edges, edge_mask).
    """
    if cfg.attn_type == "pct":
        from ..ops.knn import knn_brute_force

        n = x.shape[0]
        k = cfg.knn_k
        _, idx = knn_brute_force(coords[:, :2], coords[:, :2], k + 1, valid=valid)
        dst = jnp.repeat(jnp.arange(n, dtype=jnp.int32), k)
        src = idx[:, 1:].reshape(-1).astype(jnp.int32)
        # self loops appended (reference pct.py:69-72)
        loops = jnp.arange(n, dtype=jnp.int32)
        edges = jnp.stack(
            [jnp.concatenate([src, loops]), jnp.concatenate([dst, loops])]
        )
        edge_mask = jnp.concatenate(
            [valid[src] & valid[dst], valid]
        )
        coords = jnp.where(valid[:, None], coords, 0.0)
        return x, coords, None, jnp.logical_not(valid), edges, edge_mask

    if cfg.attn_type != "hept":
        coords = jnp.where(valid[:, None], coords, 0.0)
        return x, coords, None, jnp.logical_not(valid), None, None

    if cfg.padding_mode == "zero":
        region_eta, region_phi = region_codes(coords, regions, valid_mask=valid)
        codes = geo_code(region_eta, region_phi, regions)
        invalid = jnp.logical_not(valid)
        coords = jnp.where(valid[:, None], coords, 0.0)
        return x, coords, codes, invalid, None, None

    # replicate mode: region sizes from the event's *real* point count
    # (example/transformer.py:44-51 partitions each graph separately).
    region_eta, region_phi = region_codes(
        coords, regions, valid_mask=valid, n_points=valid.sum()
    )
    packed = bit_shift(region_eta.astype(jnp.int32), region_phi.astype(jnp.int32))
    c, _, h = regions.shape
    codes = packed.reshape(c, h, -1)

    n_total = x.shape[0]
    n_valid = valid.sum()
    code00 = codes[0, 0]
    # Model-sharded runs (parallel/tp.py) must agree on the replication-pad
    # plan across shards — the reference derives it from GLOBAL hash 0 /
    # head 0 (example/transformer.py:59) — so broadcast shard 0's codes.
    if cfg.head_axis is not None:
        code00 = jax.lax.all_gather(code00, cfg.head_axis)[0]
    if cfg.hash_axis is not None:
        code00 = jax.lax.all_gather(code00, cfg.hash_axis)[0]
    code00 = jnp.where(valid, code00, jnp.iinfo(jnp.int32).max)
    sorted_code_idx = jnp.argsort(code00)
    gather, _, inert = replication_pad_plan(
        n_valid, n_total, cfg.block_size, sorted_code_idx
    )
    x = jnp.where(inert[:, None], 0.0, x[gather])
    coords = jnp.where(inert[:, None], 0.0, coords[gather])
    codes = jnp.take_along_axis(
        codes, jnp.broadcast_to(gather[None, None, :], codes.shape), axis=-1
    )
    return x, coords, codes, inert, None, None


def make_batched_apply(model: HeptTransformer):
    """vmap a single-event model over a dense (B, N_max, ...) batch.

    Parameters/constants are shared; dropout rngs split per event. This is the
    TPU-native replacement for the reference's flat ragged batching with
    batch-index AND codes (example/transformer.py:55-56).
    """
    def batched(variables, x, coords, valid, *, deterministic=True, rngs=None):
        def one(xe, ce, ve, rng):
            r = {"dropout": rng} if rng is not None else None
            return model.apply(
                variables, xe, ce, ve, deterministic=deterministic, rngs=r
            )

        if rngs is not None:
            keys = jax.random.split(rngs["dropout"], x.shape[0])
            return jax.vmap(one)(x, coords, valid, keys)
        return jax.vmap(lambda xe, ce, ve: one(xe, ce, ve, None))(x, coords, valid)

    return batched


def make_flat_batched_apply(model: HeptTransformer):
    """Flat batching for HEPT: concatenate B events into ONE n_total-point
    event with the batch index packed into the AND codes, so buckets never
    cross events (the reference example's batched design,
    example/transformer.py:35-63 + bit_shift 10-13).

    This is the TPU-throughput formulation: the per-layer lax.sort calls are
    latency-bound (~75-100 ms at any size up to ~250k points on v5e), so B
    events cost barely more than one. The per-event region quantiles and
    replication padding run vmapped over the dense (B, N, ...) layout
    (parity with per-graph partitioning, example/transformer.py:44-51), then
    everything is flattened for the single forward pass.

    Returns apply(variables, x (B,N,F), coords (B,N,C), valid (B,N)) ->
    (B, N, out_dim).
    """
    cfg = model.cfg
    assert cfg.attn_type == "hept", "flat batching targets the HEPT path"
    # zero-mode pads sort to the GLOBAL end of the flat order (key=+BIG,
    # no batch code), so events whose real count is not a multiple of
    # block_size would leave non-bucket-aligned spans and one bucket would
    # mix points from two events (cross-event attention leakage). Only
    # replicate-mode pads keep each event's span bucket-aligned within its
    # own batch-code range.
    assert cfg.padding_mode == "replicate", (
        "flat batching requires padding_mode='replicate'"
    )

    def apply(variables, x, coords, valid, *, deterministic=True, rngs=None):
        b, n = x.shape[:2]
        regions = variables["constants"]["regions"]

        xp, cp, codes, invalid, _, _ = jax.vmap(
            lambda xe, ce, ve: _prepare_event(xe, ce, ve, regions, cfg)
        )(x, coords, valid)
        c_, h_ = codes.shape[1:3]
        if cfg.sort_events > 1:
            # stacked mode: each event is its own sort row inside the
            # attention core (ops/bucket_attn.py sort_events) — buckets
            # cannot cross events, so no batch-index packing is needed.
            assert cfg.sort_events == b, (
                f"model built for sort_events={cfg.sort_events}, got B={b}"
            )
            codes_flat = jnp.moveaxis(codes, 0, 2).reshape(c_, h_, b * n)
        else:
            # (B, c, h, n) codes -> (c, h, B*n) with the batch index in the
            # high bits (per-row bit_shift; codes are int-valued).
            codes_flat = jnp.moveaxis(codes, 0, 2).reshape(c_ * h_, b * n)
            batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n)[None, :]
            codes_flat = bit_shift(
                jnp.round(codes_flat).astype(jnp.int32),
                jnp.broadcast_to(batch_idx, codes_flat.shape),
            ).reshape(c_, h_, b * n)

        prepared = (
            xp.reshape(b * n, -1),
            cp.reshape(b * n, -1),
            codes_flat,
            invalid.reshape(b * n),
            None,
            None,
        )
        out = model.apply(
            variables,
            prepared[0],
            prepared[1],
            valid.reshape(b * n),
            deterministic=deterministic,
            rngs=rngs,
            prepared=prepared,
        )
        return out.reshape(b, n, -1)

    return apply
