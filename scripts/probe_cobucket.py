"""Forward-only co-bucketing diagnostic for the static_keys 60k divergence.

For each hashing mode, measures the fraction of TRUE track pairs that share
a bucket in at least one OR round (the pairs attention can possibly relate)
at n=6k vs n=60k, at INIT weights. The 60k static divergence hypothesis is
scale-dependent locality loss: one region cell spans ~4 buckets at 60k, so
a single static direction gives each round only a 1-D slice of the cell.
If that is right, x0/coords recall should crater at 60k while and_bins
variants recover it — and the best N is the one to train.

Runs on CPU (sorts only, no training).
"""
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from hept_tpu.data.synthetic import synthetic_tracking_event
from hept_tpu.models import HeptTransformer, TransformerConfig
from hept_tpu.models.transformer import _prepare_event
from hept_tpu.ops.bucket_attn import static_bucket_plan, static_hash

BLOCK = 100


def make_ctx(n_points: int, seed=0):
    """Event + prepared inputs + encoder output + constants, shared across
    modes (params/constants are n- and mode-independent; a 2-row
    static_alpha serves b=0 modes via its first row inside static_hash)."""
    rng = np.random.default_rng(seed)
    ev = synthetic_tracking_event(rng, n_points=n_points)
    cfg = TransformerConfig(
        in_dim=ev.x.shape[1], coords_dim=ev.coords.shape[1], task="tracking",
        h_dim=24, num_heads=8, n_layers=4, block_size=BLOCK, n_hashes=3,
        num_regions=150, num_w_per_dist=10, padding_mode="replicate",
        shared_sort=True, share_heads=True, qkv_post_sort=True,
        static_keys="x0", static_and_bins=4,
    )
    n_pad = -(-n_points // BLOCK) * BLOCK
    x = jnp.asarray(np.pad(ev.x, [(0, n_pad - n_points), (0, 0)]))
    coords = jnp.asarray(np.pad(ev.coords, [(0, n_pad - n_points), (0, 0)]))
    valid = jnp.arange(n_pad) < n_points

    model = HeptTransformer(cfg)
    small = 10 * BLOCK  # params/constants are shape-independent of n
    variables = model.init(
        jax.random.PRNGKey(0), x[:small], coords[:small], valid[:small]
    )
    params = variables["params"]
    regions = variables["constants"]["regions"]
    xp, cp, codes, invalid, _, _ = _prepare_event(x, coords, valid, regions, cfg)

    w0, b0 = params["feat_enc_0"]["kernel"], params["feat_enc_0"]["bias"]
    w1, b1 = params["feat_enc_1"]["kernel"], params["feat_enc_1"]["bias"]
    h = jnp.maximum(xp @ w0 + b0, 0.0) @ w1 + b1

    alpha = variables["constants"]["static_alpha"]
    scale = float(np.sqrt(2.0 * cfg.num_w_per_dist))
    return dict(ev=ev, h=h, cp=cp, codes=codes, invalid=invalid,
                alpha=alpha, scale=scale)


def cobucket_recall(ctx, variant: str, and_bins: int):
    alpha = ctx["alpha"] if and_bins else ctx["alpha"][:1]
    hashed = static_hash(ctx["h"].T, ctx["cp"].T, alpha, ctx["scale"],
                         variant, and_bins=and_bins)
    src, inv, _ = static_bucket_plan(
        hashed, ctx["codes"][:, 0], ctx["invalid"], ctx["cp"].T
    )
    bucket = np.asarray(inv[:, 0]) // BLOCK  # (c, n_pad)
    ev = ctx["ev"]
    p = ev.pairs  # (2, E) sampled pairs, positives AND negatives
    cid = ev.cluster_ids
    pos = (cid[p[0]] == cid[p[1]]) & (cid[p[0]] > 0)  # true track pairs
    i, j = p[0][pos], p[1][pos]
    same = bucket[:, i] == bucket[:, j]  # (c, E_pos)
    return float(same.any(axis=0).mean()), float(same[0].mean())


def union_recall(ctx, variant: str, n_rounds: int, and_bins: int = 0,
                 seed=1):
    """OR-recall over n_rounds independent static directions — models the
    multi-layer UNION coverage: per-layer re-hash (reference mode) gives a
    4-layer stack 4*n_hashes distinct rounds, static keys only n_hashes.
    Returns cumulative OR-recall after 3, 6, ..., n_rounds rounds."""
    d_model = ctx["h"].shape[1]
    cd = ctx["cp"].shape[1]
    rows = 2 if and_bins else 1
    alpha = jax.random.normal(
        jax.random.PRNGKey(seed), (rows, d_model + cd, n_rounds)
    )
    hashed = static_hash(ctx["h"].T, ctx["cp"].T, alpha, ctx["scale"],
                         variant, and_bins=and_bins)
    codes = ctx["codes"][:, 0]
    if codes.shape[0] != n_rounds:  # tile the per-round AND codes
        reps = -(-n_rounds // codes.shape[0])
        codes = jnp.tile(codes, (reps, 1))[:n_rounds]
    src, inv, _ = static_bucket_plan(hashed, codes, ctx["invalid"],
                                     ctx["cp"].T)
    bucket = np.asarray(inv[:, 0]) // BLOCK
    ev = ctx["ev"]
    p = ev.pairs
    cid = ev.cluster_ids
    pos = (cid[p[0]] == cid[p[1]]) & (cid[p[0]] > 0)
    i, j = p[0][pos], p[1][pos]
    same = bucket[:, i] == bucket[:, j]  # (n_rounds, E_pos)
    out = []
    for k in range(3, n_rounds + 1, 3):
        out.append(float(same[:k].any(axis=0).mean()))
    return out


def grouped_union_recall(ctx, variant: str, n_rounds: int, g: int,
                         and_bins: int = 0, seed=1, block=None):
    """Union co-bucket recall under TRANSPORT GROUPS (static_bucket_plan
    group_size=g): bucketing is decided at group granularity (g consecutive
    points of round-0's sorted order σ, group key = min of member keys).
    The accuracy question for the g× transport saving: how much union
    recall does group-granular bucketing cost?"""
    block = block or BLOCK
    d_model = ctx["h"].shape[1]
    cd = ctx["cp"].shape[1]
    rows = 2 if and_bins else 1
    alpha = jax.random.normal(
        jax.random.PRNGKey(seed), (rows, d_model + cd, n_rounds)
    )
    hashed = static_hash(ctx["h"].T, ctx["cp"].T, alpha, ctx["scale"],
                         variant, and_bins=and_bins)
    codes = ctx["codes"][:, 0]
    if codes.shape[0] != n_rounds:
        reps = -(-n_rounds // codes.shape[0])
        codes = jnp.tile(codes, (reps, 1))[:n_rounds]
    if g == 1:
        _, inv, _ = static_bucket_plan(
            hashed, codes, ctx["invalid"], ctx["cp"].T
        )
        bucket = np.asarray(inv[:, 0]) // block
    else:
        gsrc, ginv, _, src0, inv0 = static_bucket_plan(
            hashed, codes, ctx["invalid"], ctx["cp"].T, group_size=g
        )
        inv0n = np.asarray(inv0[0, 0])      # natural -> σ slot
        ginvn = np.asarray(ginv[:, 0])      # (c, ng) group -> round slot
        bucket = ginvn[:, inv0n // g] // (block // g)  # (c, n) per point
    ev = ctx["ev"]
    p = ev.pairs
    cid = ev.cluster_ids
    pos = (cid[p[0]] == cid[p[1]]) & (cid[p[0]] > 0)
    i, j = p[0][pos], p[1][pos]
    same = bucket[:, i] == bucket[:, j]
    out = []
    for k in range(3, n_rounds + 1, 3):
        out.append(float(same[:k].any(axis=0).mean()))
    return out


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "groups":
        # transport-group recall cost: union recall at 60k for g=1/2/4
        # (12-round plan, the acc arm's union), block 100 and 128
        sizes = [int(s) for s in sys.argv[2:]] or [60000]
        for n in sizes:
            ctx = make_ctx(n)
            for block in (100, 128):
                for g in (1, 2, 4, 8):
                    if block % g:
                        continue
                    cum = grouped_union_recall(ctx, "x0", 12, g, block=block)
                    print(f"n={n:6d} block={block} g={g}: union by 3s: "
                          + " ".join(f"{v:.4f}" for v in cum), flush=True)
        sys.exit(0)
    sizes = [int(s) for s in sys.argv[1:]] or [6000, 60000]
    modes = [("x0", 0), ("x0", 4), ("x0", 8), ("x0", 16),
             ("coords", 0), ("coords", 4), ("coords", 8)]
    for n in sizes:
        ctx = make_ctx(n)
        for variant, bins in modes:
            rec_or, rec_r0 = cobucket_recall(ctx, variant, bins)
            print(f"n={n:6d} {variant:7s} b={bins:2d}: "
                  f"OR-recall={rec_or:.4f} round0={rec_r0:.4f}", flush=True)
        for variant, bins in [("x0", 0), ("x0", 4)]:
            cum = union_recall(ctx, variant, 12, and_bins=bins)
            print(f"n={n:6d} {variant:7s} b={bins:2d} union by 3s: "
                  + " ".join(f"{v:.4f}" for v in cum), flush=True)
