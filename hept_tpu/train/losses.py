"""Training losses: InfoNCE (tracking) and Focal (pileup).

TPU-native rebuild of reference `src/utils/losses.py`:
* the per-anchor negative sums use `jax.ops.segment_sum` (deterministic on
  XLA by construction — no sort+segment_csr trick needed, losses.py:66-74);
* the ragged pair list becomes a static-size padded array with a mask
  (pair counts vary per event; SURVEY §7 "hard parts");
* cluster ids must be dense ints in [0, n) (the data pipeline remaps
  particle ids per event), so `unique(...)`'s dynamic shape is avoided.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array


def pair_filter(cluster_ids, pairs, recons, pts, pt_thres: float = 0.9):
    """Positive-pair eligibility (reference src/utils/metrics.py:8-15):
    both endpoints reconstructable and above the pt threshold."""
    p0, p1 = pairs[0], pairs[1]
    recon_ok = (recons[p0] != 0) & (recons[p1] != 0)
    pt_ok = (pts[p0] > pt_thres) & (pts[p1] > pt_thres)
    return recon_ok & pt_ok


def infonce_loss(
    embeddings: Array,
    pairs: Array,
    pair_mask: Array,
    cluster_ids: Array,
    recons: Array,
    pts: Array,
    *,
    tau: float = 0.05,
    dist_metric: str = "l2_rbf",
    pt_thres: float = 0.9,
    windowed_pairs: bool = False,
    pair_rev: Array | None = None,
    pair_weight: Array | None = None,
    pair_neg: Array | None = None,
) -> Array:
    """Contrastive InfoNCE over supervision pairs (reference losses.py:8-54).

    Args:
      embeddings: (N, d).
      pairs: (2, E) point-index pairs (padded; pads repeat a real/last index).
      pair_mask: (E,) bool — real pairs.
      cluster_ids: (N,) dense particle ids in [0, N); 0 = noise.
      recons, pts: (N,) reconstructability flags / transverse momenta.
      windowed_pairs: the caller guarantees the pack-time 128-window layout
        (data/batching.py window_pad_pairs); anchor-side gathers/segment sums
        then use the windowed MXU kernels (ops/pair_ops.py) instead of XLA
        element scatter — the loss backward's dominant cost.
      pair_rev: (E,) pack-time reverse-pair index (batching.py
        _pair_rev_index) — the partner-side backward scatter then also rides
        the windowed anchor kernel (ops/pair_ops.partner_gather).
      pair_weight: (E,) pack-time per-pair cluster weights
        (batching.py _pair_cluster_weights; must be built with this
        function's pt_thres): the cluster mean-of-means collapses to one dot
        product, removing two in-step segment-sum scatters + their backward.
      pair_neg: (E,) pack-time negative-pair mask (~pos & real): removes the
        six per-step E-sized cluster/recon/pt gathers (pair_filter) — ~45 ms
        at tracking-60k shapes — since the masks depend only on batch data.
    Returns: scalar loss (mean over clusters of per-cluster mean pos-pair loss).
    """
    n = embeddings.shape[0]
    p0, p1 = pairs[0], pairs[1]
    if windowed_pairs:
        from ..ops.pair_ops import anchor_segment_sum, pair_gather

        gather0 = lambda x: pair_gather(x, p0)  # noqa: E731
        seg0 = lambda v: anchor_segment_sum(v, p0, n)  # noqa: E731
    else:
        gather0 = lambda x: x[p0]  # noqa: E731
        seg0 = lambda v: jax.ops.segment_sum(v, p0, num_segments=n)  # noqa: E731

    if pair_neg is not None:
        neg_mask = pair_neg
        pos_mask = None  # only needed by the in-step cluster block
    else:
        same_cluster = cluster_ids[p0] == cluster_ids[p1]
        pos_mask = same_cluster & pair_filter(cluster_ids, pairs, recons, pts, pt_thres)
        pos_mask = pos_mask & pair_mask
        # The reference counts every non-positive pair as a negative
        # (losses.py:19: `~all_pos_pair_mask`), including filter rejects.
        neg_mask = jnp.logical_not(pos_mask) & pair_mask

    def safe_norm(diff):
        # sqrt has an infinite slope at 0; padded pairs are (0, 0) self-pairs
        # whose zero distance would otherwise poison the backward pass with
        # NaN (0 * NaN stays NaN through the masking `where`s).
        return jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)

    sigma = 0.75
    if (windowed_pairs and pair_rev is not None and dist_metric == "l2_rbf"):
        # fused symmetric-similarity op: the p1-side backward scatter folds
        # into the anchor-side windowed scatter via the reverse-pair index
        # (ops/pair_ops.pair_l2rbf_sim)
        from ..ops.pair_ops import pair_l2rbf_sim

        sim = pair_l2rbf_sim(embeddings, p0, p1, pair_rev, pair_mask, sigma)
    else:
        e0 = gather0(embeddings)
        if windowed_pairs and pair_rev is not None:
            from ..ops.pair_ops import partner_gather

            e1 = partner_gather(embeddings, p1, p0, pair_rev, pair_mask)
        else:
            e1 = embeddings[p1]
        if dist_metric == "cosine":
            sim = jnp.sum(e0 * e1, -1) / jnp.maximum(
                safe_norm(e0) * safe_norm(e1), 1e-8
            )
        elif dist_metric == "l2_rbf":
            d = safe_norm(e0 - e1)
            sim = jnp.exp(-d / (2 * sigma**2))
        elif dist_metric == "l2_inverse":
            d = safe_norm(e0 - e1)
            sim = 1.0 / (d + 1.0)
        else:
            raise NotImplementedError(dist_metric)

    logit = sim / tau
    max_sim = jnp.max(jnp.where(pair_mask, logit, -jnp.inf))
    exp_sim = jnp.exp(logit - jax.lax.stop_gradient(max_sim))

    # Per-anchor negative mass, then looked up per positive pair.
    neg_sum = seg0(jnp.where(neg_mask, exp_sim, 0.0))
    numerator = exp_sim
    denominator = gather0(neg_sum[:, None])[:, 0]
    loss_per_pair = -jnp.log(numerator / (numerator + denominator + 1e-30) + 1e-30)

    # Per-cluster mean of positive-pair losses, then mean over non-empty
    # clusters (reference losses.py:35-39 via unique+scatter-mean). With
    # pack-time weights the whole block is one dot product.
    if pair_weight is not None:
        return jnp.sum(loss_per_pair * pair_weight)
    assert pos_mask is not None, "pair_neg without pair_weight unsupported"
    labels = jnp.where(pos_mask, cluster_ids[p0], n - 1)  # dump pads on a slot
    w = pos_mask.astype(embeddings.dtype)
    cluster_sum = jax.ops.segment_sum(loss_per_pair * w, labels, num_segments=n)
    cluster_cnt = jax.ops.segment_sum(w, labels, num_segments=n)
    nonempty = cluster_cnt > 0
    cluster_mean = jnp.where(nonempty, cluster_sum / jnp.maximum(cluster_cnt, 1), 0.0)
    return jnp.sum(cluster_mean) / jnp.maximum(jnp.sum(nonempty), 1)


def triplet_margin_loss(
    embeddings: Array,
    pairs: Array,
    pair_mask: Array,
    cluster_ids: Array,
    recons: Array,
    pts: Array,
    *,
    margin: float = 0.5,
    pt_thres: float = 0.9,
) -> Array:
    """Triplet variant (reference losses.py:56-63 `calc_triplet`): per-anchor
    mean negative distance vs positive distance with a margin."""
    n = embeddings.shape[0]
    p0, p1 = pairs[0], pairs[1]
    same = cluster_ids[p0] == cluster_ids[p1]
    pos_mask = same & pair_filter(cluster_ids, pairs, recons, pts, pt_thres) & pair_mask
    neg_mask = jnp.logical_not(pos_mask) & pair_mask

    d = jnp.sqrt(jnp.sum((embeddings[p0] - embeddings[p1]) ** 2, -1) + 1e-12)
    neg_sum = jax.ops.segment_sum(jnp.where(neg_mask, d, 0.0), p0, num_segments=n)
    neg_cnt = jax.ops.segment_sum(neg_mask.astype(d.dtype), p0, num_segments=n)
    neg_mean = neg_sum / jnp.maximum(neg_cnt, 1.0)
    per_pair = jnp.maximum(d - neg_mean[p0] + margin, 0.0)
    w = pos_mask.astype(d.dtype)
    return jnp.sum(per_pair * w) / jnp.maximum(jnp.sum(w), 1.0)


def focal_loss(
    probs: Array, targets: Array, mask: Array | None = None,
    alpha: float = 0.25, gamma: float = 2.0,
) -> Array:
    """Focal BCE on probabilities (reference losses.py:98-108; the model
    applies sigmoid, matching the reference's sigmoid head)."""
    p = jnp.clip(probs, 1e-7, 1.0 - 1e-7)
    bce = -(targets * jnp.log(p) + (1.0 - targets) * jnp.log(1.0 - p))
    pt = jnp.exp(-bce)
    fl = alpha * (1.0 - pt) ** gamma * bce
    if mask is not None:
        fl = jnp.where(mask, fl, 0.0)
        return jnp.sum(fl) / jnp.maximum(jnp.sum(mask), 1)
    return jnp.mean(fl)
