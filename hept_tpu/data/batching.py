"""Host-side dense batching: ragged events → fixed-shape arrays.

The TPU-native replacement for the reference's flat ragged concatenation
(PyG `Batch` + batch-index AND codes, example/transformer.py:35-63): events
are packed into a dense (B, N_max, ...) layout with validity masks; supervision
pairs are padded to a static E_max with a pair mask (SURVEY §7 "deterministic
InfoNCE at scale": cap + mask, log drops).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np


@dataclasses.dataclass
class Event:
    """One point cloud with supervision (host-side, numpy).

    Attributes:
      x: (n, F) features; coords: (n, C) with eta/phi first.
      cluster_ids: (n,) dense ids in [0, n); 0 = noise (tracking).
      recons: (n,) reconstructability flags; pts: (n,) transverse momenta.
      pairs: (2, e) supervision point pairs (tracking).
      y: (n,) binary labels (pileup); is_neu: (n,) neutral-particle mask.
    """

    x: np.ndarray
    coords: np.ndarray
    cluster_ids: np.ndarray | None = None
    recons: np.ndarray | None = None
    pts: np.ndarray | None = None
    pairs: np.ndarray | None = None
    y: np.ndarray | None = None
    is_neu: np.ndarray | None = None

    @property
    def n(self) -> int:
        return self.x.shape[0]


def slab_friendly_n(n: int, block_size: int, slab: int = 1024) -> int:
    """Round n up to a bucket count divisible by slab/block_size, so the
    flat-slab Pallas kernels (ops/bucket_attn_pallas.py _slab128_g) can run
    full (slab, slab) MXU slabs at ANY 128-multiple block size — the kernel
    cost depends on the slab size, not the bucket size, which is what makes
    big buckets (bs 256-512) free recall (runs/r5 probe_bs). No-op when
    block_size is not a multiple of 128 (per-bucket kernels don't care)."""
    nb = -(-n // block_size)
    if block_size % 128 == 0 and block_size <= slab:
        g0 = slab // block_size
        nb = -(-nb // g0) * g0
    return nb * block_size


def _ceil_to(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def window_pad_pairs(pairs: np.ndarray, group: int = 128) -> tuple[np.ndarray, np.ndarray]:
    """Repartition anchor-sorted pairs into aligned `group`-pair windows such
    that within every window, max(anchor) - min(anchor) < group.

    This is the invariant the windowed one-hot MXU kernels need
    (ops/pair_ops.py): each 128-pair window touches at most 128 consecutive
    embedding rows, so gathers/scatter-adds become dense (128, 128) matmuls
    against a dynamically-sliced window. Pads inserted to break windows copy
    the NEXT real pair (keeping the anchor column sorted) and are masked.

    Args: pairs (2, E) anchor-sorted. Returns (padded_pairs (2, E'), mask
    (E',)) with E' a multiple of `group`.
    """
    p0 = pairs[0]
    e = p0.shape[0]
    if e == 0:
        return pairs.reshape(2, 0), np.zeros((0,), bool)
    # greedy run construction: a run starting at i extends to
    # min(i + group, first j with p0[j] >= p0[i] + group)
    starts = []
    i = 0
    while i < e:
        starts.append(i)
        # lazy limit: one scalar searchsorted per run instead of an (E,)
        # vector one (the run walk reads ~e/group of its entries)
        lim = int(np.searchsorted(p0, p0[i] + group, side="left"))
        i = min(i + group, lim)
    starts.append(e)
    sa = np.asarray(starts, np.int64)
    n_runs = sa.shape[0] - 1
    # vectorized run copy: slot j of run r reads pairs[:, s_r + j] while
    # real (j < len_r), else the run's END pair t_r (the next real pair —
    # anchor order stays sorted; the final run pads with its own last pair)
    offs = np.tile(np.arange(group, dtype=np.int64), n_runs)
    base = np.repeat(sa[:-1], group)
    lens = np.repeat(sa[1:] - sa[:-1], group)
    ends = np.repeat(np.minimum(sa[1:], e - 1), group)
    mask = offs < lens
    src = np.where(mask, base + offs, ends)
    out = pairs[:, src]
    return out, mask


def processed_pair_len(pairs: np.ndarray, n: int, window: int = 128) -> int:
    """Exact length of `window_pad_pairs(symmetrized-and-sorted pairs)` WITHOUT
    materializing the processed arrays — the trainer's static-E sizing pass
    (run once per dataset at startup) only needs the lengths, and building the
    padded arrays for every event made startup O(dataset-bytes)."""
    if pairs.shape[1] == 0:
        return 0
    both = np.concatenate(
        [pairs[0].astype(np.int64) * n + pairs[1],
         pairs[1].astype(np.int64) * n + pairs[0]]
    )
    key = np.unique(both)  # sorted by (anchor, partner)
    p0 = key // n  # anchor column of the symmetrized anchor-sorted pairs
    e = p0.shape[0]
    # The run walk visits ~e/window positions; computing `limit` for ALL e
    # positions up front was a 2M-element int64 searchsorted (~0.7 s/event
    # on the 1-vCPU host) of which ~16k entries were read. Scalar lookups
    # at the visited positions only.
    i = 0
    n_runs = 0
    while i < e:
        n_runs += 1
        lim = int(np.searchsorted(p0, p0[i] + window, side="left"))
        i = min(i + window, lim)
    return n_runs * window


def _symmetrize_pairs(pairs: np.ndarray, n: int) -> np.ndarray:
    """Close the pair list under reversal and dedupe.

    PyG's radius graph emits both directions; the reference's kNN-capped
    radius pairs (tracking.py:204-209) can truncate asymmetrically. The
    windowed-loss backward rewrites the partner-side scatter as an
    anchor-side scatter of reversed cotangents (ops/pair_ops.partner_gather),
    which requires every pair's reverse to be present exactly once.

    Returns pairs in canonical (anchor, partner) lexicographic order — i.e.
    already anchor-sorted — so callers skip the anchor argsort. (Round 4:
    this replaced first-occurrence tie order; the pair SET, masks, weights
    and rev-closure are unchanged, only in-window fp summation order moved.)
    """
    both = np.concatenate([pairs, pairs[::-1]], axis=1)
    key = np.unique(both[0].astype(np.int64) * n + both[1])
    out = np.empty((2, key.shape[0]), dtype=pairs.dtype)
    np.floor_divide(key, n, out=out[0], casting="unsafe")
    np.remainder(key, n, out=out[1], casting="unsafe")
    return out


def _pair_rev_index(pairs: np.ndarray, pmask: np.ndarray, n: int) -> np.ndarray:
    """Position of each REAL pair's reverse among the real (unmasked) slots
    of the padded windowed layout; identity for pads. Requires the real pair
    set to be reversal-closed and duplicate-free (`_symmetrize_pairs`)."""
    e = pairs.shape[1]
    rev = np.arange(e, dtype=np.int32)
    real = np.flatnonzero(pmask)
    if real.size == 0:
        return rev
    key = pairs[0, real].astype(np.int64) * n + pairs[1, real]
    rkey = pairs[1, real].astype(np.int64) * n + pairs[0, real]
    if key.size > 1 and (key[1:] > key[:-1]).all():
        order = None  # canonical packing: real slots already key-sorted
    else:
        order = np.argsort(key, kind="stable")
    # rank of rkey[i] among the rkeys == its position in sorted(key) when
    # the two sets are equal (reversal closure) — one argsort instead of a
    # 2M-element binary-search (searchsorted was ~0.7 s/event on this host);
    # the equality check below still catches a non-closed pair list exactly.
    order_r = np.argsort(rkey, kind="stable")
    pos = np.empty(rkey.size, np.int64)
    pos[order_r] = np.arange(rkey.size)
    opos = pos if order is None else order[pos]
    target = real[opos]
    ok = key[opos] == rkey
    if not ok.all():
        raise ValueError("pair list not closed under reversal")
    rev[real] = target.astype(np.int32)
    return rev


def _pair_cluster_weights(
    pairs: np.ndarray,
    pmask: np.ndarray,
    cluster_ids: np.ndarray,
    recons: np.ndarray,
    pts: np.ndarray,
    pt_thres: float = 0.9,
) -> np.ndarray:
    """Per-pair weight w_e = pos_e / |cluster(e)| / #nonempty-clusters, so the
    in-step cluster mean-of-means (reference losses.py:35-39) collapses to one
    dot product Σ l_e·w_e — the positive-pair weighting depends only on batch
    data, never on embeddings, so it is precomputable at pack time. Also
    returns the negative-pair mask (~pos & real): with it precomputed the
    loss needs NO per-step cluster/recon/pt gathers at all (six E-sized
    XLA gathers, ~45 ms/step at tracking-60k shapes)."""
    p0, p1 = pairs[0], pairs[1]
    pos = (
        pmask
        & (cluster_ids[p0] == cluster_ids[p1])
        & (recons[p0] != 0)
        & (recons[p1] != 0)
        & (pts[p0] > pt_thres)
        & (pts[p1] > pt_thres)
    )
    w = np.zeros(pairs.shape[1], np.float32)
    neg = np.logical_not(pos) & pmask
    if not pos.any():
        return w, neg
    labels = cluster_ids[p0[pos]].astype(np.int64)
    cnt = np.bincount(labels)
    n_clusters = (cnt > 0).sum()
    w[pos] = 1.0 / (cnt[labels] * n_clusters)
    return w, neg


def _process_event_pairs(
    ev: Event,
    aug_pair_p: float,
    aug_rng: np.random.Generator | None,
    window: int,
    cache: bool,
    e_max: int | None = None,
) -> tuple[np.ndarray, np.ndarray | None, np.ndarray | None, bool]:
    """One event's supervision pairs → (windowed pairs, mask, rev, has_cluster).

    `rev` is the reverse-pair index (None outside the windowed+cluster path).

    cache=True attaches the aug-independent processed base block to the
    Event (symmetrize → window-pad → reverse index + sorted base keys, built
    once) and, per call, dedups the fresh augmentation draw against it and
    appends the aug pairs as a SEPARATE trailing windowed block. The pair
    SET, masks, weights, reversal closure and per-window span invariant are
    identical to a full re-pack; only the window grouping (hence in-window
    fp summation order) differs from the uncached interleaved layout. The
    rng consumption is identical to the uncached path. Costs ~20 MB per 60k
    event; a full re-pack was ~0.7 s/event/epoch on the 1-vCPU host.

    The block layout is slightly LONGER than the interleaved one (the aug
    block pads its own windows); when `e_max` is given and only the cached
    layout would overflow it, this falls back to the full re-pack for the
    event — the cache must never cause pair truncation that the uncached
    path avoided (it silently disables the windowed-loss extras).
    """
    pairs = ev.pairs
    ni = ev.n
    has_cluster = ev.cluster_ids is not None and ev.recons is not None \
        and ev.pts is not None
    rnd = None
    if aug_pair_p > 0.0 and aug_rng is not None:
        # train-time random pair augmentation (reference
        # tracking_trainer.py process_data:45-52): append int(E * p / 2)
        # random pairs, both directions. The reference dedups via
        # to_undirected; at p=0.2 duplicate draws are negligible.
        n_aug = int(pairs.shape[1] * aug_pair_p / 2)
        if n_aug:
            rnd = aug_rng.integers(0, ni, (2, n_aug))

    def _append_aug(p):
        if rnd is None:
            return p
        both = np.concatenate([rnd, rnd[::-1]], axis=1)
        return np.concatenate([p, both.astype(p.dtype)], axis=1)

    if not (window and has_cluster):
        pairs = _append_aug(pairs)
        # anchor-sorted pairs: the loss's per-anchor segment sums become
        # sorted-segment reductions and the anchor gathers become
        # near-contiguous (the InfoNCE hot-path lever). Order is
        # semantically irrelevant (all reductions are order-invariant).
        order = np.argsort(pairs[0], kind="stable")
        pairs = pairs[:, order]
        pmask = None
        if window:
            pairs, pmask = window_pad_pairs(pairs, window)
        return pairs, pmask, None, has_cluster
    if not cache:
        # returns canonical (anchor, partner) order == anchor-sorted
        pairs = _symmetrize_pairs(_append_aug(pairs), ni)
        pairs, pmask = window_pad_pairs(pairs, window)
        return pairs, pmask, _pair_rev_index(pairs, pmask, ni), True
    store = getattr(ev, "_pair_pack_cache", None)
    if store is None:
        store = {}
        ev._pair_pack_cache = store
    if window not in store:
        base = _symmetrize_pairs(ev.pairs, ni)
        bkeys = base[0].astype(np.int64) * ni + base[1]  # sorted (canonical)
        bpairs, bmask = window_pad_pairs(base, window)
        brev = _pair_rev_index(bpairs, bmask, ni)
        store[window] = (bkeys, bpairs, bmask, brev)
    bkeys, bpairs, bmask, brev = store[window]
    if rnd is None:
        return bpairs, bmask, brev, True
    akey = np.unique(np.concatenate([
        rnd[0].astype(np.int64) * ni + rnd[1],
        rnd[1].astype(np.int64) * ni + rnd[0],
    ]))
    if bkeys.size:
        # drop draws already in the base set (base is reversal-closed, so
        # closure of the remaining aug set is preserved)
        ins = np.minimum(np.searchsorted(bkeys, akey), bkeys.size - 1)
        akey = akey[bkeys[ins] != akey]
    if akey.size == 0:
        return bpairs, bmask, brev, True
    apairs = np.empty((2, akey.size), dtype=ev.pairs.dtype)
    np.floor_divide(akey, ni, out=apairs[0], casting="unsafe")
    np.remainder(akey, ni, out=apairs[1], casting="unsafe")
    apairs_w, amask = window_pad_pairs(apairs, window)
    off = bpairs.shape[1]
    if e_max is not None and off + apairs_w.shape[1] > e_max:
        # the separate aug block would overflow the static E where the
        # interleaved layout might still fit — re-pack fully rather than
        # truncate (truncation drops real pairs and kills the windowed
        # extras for the whole batch)
        pairs = _symmetrize_pairs(_append_aug(ev.pairs), ni)
        pairs, pmask = window_pad_pairs(pairs, window)
        return pairs, pmask, _pair_rev_index(pairs, pmask, ni), True
    arev = _pair_rev_index(apairs_w, amask, ni)
    return (
        np.concatenate([bpairs, apairs_w], axis=1),
        np.concatenate([bmask, amask]),
        np.concatenate([brev, (arev + off).astype(brev.dtype)]),
        True,
    )


def pack_events(
    events: Sequence[Event],
    block_size: int,
    n_max: int | None = None,
    e_max: int | None = None,
    aug_pair_p: float = 0.0,
    aug_rng: np.random.Generator | None = None,
    window_pairs: int = 0,
    cache: bool = False,
) -> dict:
    """Pack events into dense arrays.

    Returns dict of numpy arrays with leading batch dim B:
      x (B, N, F), coords (B, N, C), valid (B, N) bool, and when present:
      cluster_ids/recons/pts/y/is_neu (B, N), pairs (B, 2, E) int32,
      pair_mask (B, E) bool. N is a multiple of block_size.
    """
    b = len(events)
    n_req = max(ev.n for ev in events)
    n = _ceil_to(n_max or n_req, block_size)
    if n < n_req:
        raise ValueError(f"n_max={n_max} smaller than largest event ({n_req})")

    f = events[0].x.shape[1]
    c = events[0].coords.shape[1]
    out = {
        "x": np.zeros((b, n, f), np.float32),
        "coords": np.zeros((b, n, c), np.float32),
        "valid": np.zeros((b, n), bool),
    }
    has_pairs = events[0].pairs is not None
    if has_pairs:
        # Process every event's pairs up front (augment, symmetrize, sort,
        # window-pad) so the static E is sized from the PROCESSED lengths —
        # sizing from the raw counts silently truncated window pads, broke
        # the whole-128-window invariant the Pallas pair kernels require,
        # and made the loss fall back to XLA element scatter.
        processed = [
            _process_event_pairs(ev, aug_pair_p, aug_rng, window_pairs, cache,
                                 e_max=e_max)
            for ev in events
        ]
        e_req = max(p.shape[1] for p, _, _, _ in processed)
        if window_pairs:
            e_req = _ceil_to(max(e_req, window_pairs), window_pairs)
        e = e_max or e_req
        # pad pairs point at the LAST row (not 0) so the anchor-sorted order
        # below holds across the padding tail too (masked either way)
        out["pairs"] = np.full((b, 2, e), n - 1, np.int32)
        out["pair_mask"] = np.zeros((b, e), bool)
    for name in ("cluster_ids", "recons", "pts", "y", "is_neu"):
        if getattr(events[0], name) is not None:
            dt = bool if name == "is_neu" else np.float32
            if name == "cluster_ids":
                dt = np.int32
            out[name] = np.zeros((b, n), dt)

    dropped = 0
    for i, ev in enumerate(events):
        ni = ev.n
        out["x"][i, :ni] = ev.x
        out["coords"][i, :ni] = ev.coords
        out["valid"][i, :ni] = True
        for name in ("cluster_ids", "recons", "pts", "y", "is_neu"):
            val = getattr(ev, name)
            if val is not None:
                out[name][i, :ni] = val
        if has_pairs:
            pairs, pmask, rev, has_cluster = processed[i]
            ei = pairs.shape[1]
            take = min(ei, out["pairs"].shape[2])
            dropped += ei - take
            out["pairs"][i, :, :take] = pairs[:, :take]
            out["pair_mask"][i, :take] = (
                pmask[:take] if pmask is not None else True
            )
            if window_pairs and has_cluster and take == ei:
                # windowed-loss extras: reverse-pair index (partner-side
                # scatter -> anchor-side scatter in the backward) and
                # precomputed per-pair cluster weights. Only emitted when no
                # pairs were truncated (truncation breaks reversal closure).
                e_out = out["pairs"].shape[2]
                if "pair_rev" not in out:
                    out["pair_rev"] = np.tile(
                        np.arange(e_out, dtype=np.int32), (b, 1)
                    )
                    out["pair_weight"] = np.zeros((b, e_out), np.float32)
                    out["pair_neg"] = np.zeros((b, e_out), bool)
                out["pair_rev"][i, :take] = rev
                w_i, neg_i = _pair_cluster_weights(
                    pairs, pmask, ev.cluster_ids, ev.recons, ev.pts
                )
                out["pair_weight"][i, :take] = w_i
                out["pair_neg"][i, :take] = neg_i
    if dropped:
        import logging

        logging.getLogger(__name__).warning(
            "pack_events: dropped %d supervision pairs beyond e_max", dropped
        )
        # truncation breaks reversal closure / weight normalization — the
        # loss must fall back to the mask-based in-step path for the whole
        # batch rather than silently zero the truncated events
        out.pop("pair_rev", None)
        out.pop("pair_weight", None)
        out.pop("pair_neg", None)
    return out
