"""Evaluation metrics.

Tracking: kNN-retrieval accuracy/precision/recall at pt thresholds — a
vectorized, tiled rebuild of reference `src/utils/metrics.py:24-93` (which
materializes an N×N cdist per event on GPU and scores with a numba CPU loop).
We tile the distance matrix over query rows under jit and score with masked
vector ops, so 60k-point events never materialize N² memory.

Pileup: average precision / ROC-AUC / F1 via sklearn on host (eval only),
mirroring reference `src/pileup_trainer.py:75-87`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array


def point_filter(cluster_ids, recons, pts, pt_thres):
    """Reference metrics.py:18-20."""
    return (cluster_ids != 0) & (recons != 0) & (pts > pt_thres)


@partial(jax.jit, static_argnames=("k", "tile"))
def _knn_retrieval_scores(
    embeddings: Array,
    cluster_ids: Array,
    eval_mask: Array,
    valid: Array,
    k: int = 19,
    tile: int = 2048,
):
    """Per-point retrieval scores, jitted and tiled.

    Args:
      embeddings: (N, d); cluster_ids: (N,) dense ids (0 = noise);
      eval_mask: (N,) points to score; valid: (N,) real (unpadded) points.
    Returns:
      (acc, prec, recall, include): (N,) arrays; `include` marks scored points
      (eval_mask & k_i > 0), matching the numba loop's `k == 0: continue`.
    """
    n, d = embeddings.shape
    # cluster sizes over *valid* points (reference counts all points of the
    # event, metrics.py:32-33)
    sizes = jax.ops.segment_sum(
        valid.astype(jnp.int32), cluster_ids, num_segments=n
    )
    k_i = jnp.minimum(sizes[cluster_ids] - 1, k)  # true-neighbour count

    pad_n = (-n) % tile
    emb_p = jnp.pad(embeddings, ((0, pad_n), (0, 0)))
    p_sq = jnp.sum(embeddings * embeddings, axis=-1)

    kk = min(k + 1, n)  # events smaller than K+1 retrieve all points

    def one_tile(q_tile):
        d2 = (
            jnp.sum(q_tile * q_tile, axis=-1, keepdims=True)
            - 2.0 * q_tile @ embeddings.T
            + p_sq[None, :]
        )
        d2 = jnp.where(valid[None, :], d2, jnp.inf)
        _, idx = jax.lax.top_k(-d2, kk)
        return idx

    idx = jax.lax.map(one_tile, emb_p.reshape(-1, tile, d)).reshape(-1, kk)[:n]
    # Drop self (nearest) — reference slices indices[i, 1:K+1] (metrics.py:76).
    nbrs = idx[:, 1:]
    matches = cluster_ids[nbrs] == cluster_ids[:, None]  # (N, kk-1)
    if kk - 1 < k:
        matches = jnp.pad(matches, ((0, 0), (0, k - (kk - 1))))
    pos = jnp.arange(k)[None, :]
    within_k = pos < k_i[:, None]
    m_total = jnp.sum(matches, axis=1)
    m_at_k = jnp.sum(matches & within_k, axis=1)
    kf = jnp.maximum(k_i, 1).astype(jnp.float32)
    acc = m_at_k / kf
    prec = m_total / float(k)
    recall = m_total / kf
    include = eval_mask & (k_i > 0) & valid
    return acc, prec, recall, include


def acc_and_pr_at_k(
    embeddings,
    cluster_ids,
    mask,
    valid=None,
    k: int = 19,
    tile: int = 2048,
):
    """Mean retrieval accuracy / precision / recall at K (reference
    metrics.py:24-62; K=19 so K+1=20 neighbours are retrieved)."""
    n = embeddings.shape[0]
    if valid is None:
        valid = jnp.ones(n, dtype=bool)
    acc, prec, recall, include = _knn_retrieval_scores(
        embeddings, cluster_ids, mask, valid, k=k, tile=tile
    )
    denom = jnp.maximum(jnp.sum(include), 1)
    mean = lambda x: float(jnp.sum(jnp.where(include, x, 0.0)) / denom)
    return mean(acc), mean(prec), mean(recall)


@partial(jax.jit, static_argnames=("k", "tile"))
def tracking_metrics_batch(embeddings, cluster_ids, recons, pts, valid,
                           k: int = 19, tile: int = 2048):
    """Batched retrieval metrics over a (B, N, ·) event batch for all three
    pt thresholds in ONE device call (per-event per-threshold dispatch costs
    a tunnel round-trip each — 24 calls/batch dominated eval wall time).

    Returns (B, 3 thresholds, 3 metrics) with metrics ordered
    (accuracy, precision, recall) and thresholds (0, 0.5, 0.9)."""

    def per_event(emb, cid, rec, pt, val):
        rows = []
        for thres in (0.0, 0.5, 0.9):
            mask = point_filter(cid, rec, pt, thres) & val
            acc, prec, recall, include = _knn_retrieval_scores(
                emb, cid, mask, val, k=k, tile=tile
            )
            denom = jnp.maximum(jnp.sum(include), 1)
            m = lambda x: jnp.sum(jnp.where(include, x, 0.0)) / denom
            rows.append(jnp.stack([m(acc), m(prec), m(recall)]))
        return jnp.stack(rows)

    return jax.vmap(per_event)(embeddings, cluster_ids, recons, pts, valid)


def node_classification_accuracy(pred, target, mask):
    """Masked accuracy (reference metrics.py:96-100)."""
    import jax.numpy as _jnp

    correct = _jnp.where(mask, pred == target, False)
    return float(_jnp.sum(correct) / _jnp.maximum(_jnp.sum(mask), 1))


def binary_classification_metrics(probs: np.ndarray, targets: np.ndarray):
    """AP ('auc' in the reference configs), ROC-AUC, F1@0.5 on host."""
    from sklearn.metrics import (
        average_precision_score,
        f1_score,
        roc_auc_score,
    )

    probs = np.asarray(probs).reshape(-1)
    targets = np.asarray(targets).reshape(-1)
    return {
        "auc": float(average_precision_score(targets, probs)),
        "roc": float(roc_auc_score(targets, probs)),
        "f1": float(f1_score(targets, probs > 0.5)),
    }
