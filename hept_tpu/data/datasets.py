"""Dataset objects: synthetic generators with reference-style splits.

The reference datasets (TrackML sectors, Delphes pileup) are offline-built
archives fetched from Zenodo (src/datasets/tracking.py:107-119 — unavailable
in a zero-egress environment); `ReferenceTrackingDataset` in loaders.py can
ingest those files when present. The synthetic datasets reproduce the
statistical shape (cluster sizes ≤ K+1, radius-pair supervision, neutral
eval masks) and provide an 80/10/10 split sorted by event id, mirroring
tracking.py:38-51.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .batching import Event, pack_events
from .synthetic import synthetic_pileup_event, synthetic_tracking_event


@dataclasses.dataclass
class SplitDataset:
    train: list
    valid: list
    test: list
    in_dim: int
    coords_dim: int

    def iter_batches(self, split: str, batch_size: int, block_size: int,
                     n_max: int | None = None, e_max: int | None = None,
                     shuffle_rng: np.random.Generator | None = None,
                     drop_last: bool | None = None,
                     aug_pair_p: float = 0.0,
                     window_pairs: int = 0):
        """Yield packed batches. Training (shuffle_rng set) drops a trailing
        partial batch by default (static shapes + DP divisibility); eval keeps
        it so small splits still produce metrics. `aug_pair_p` appends fresh
        random supervision pairs per batch (train-time augmentation,
        reference process_data)."""
        if drop_last is None:
            drop_last = shuffle_rng is not None
        events = getattr(self, split)
        order = np.arange(len(events))
        if shuffle_rng is not None:
            shuffle_rng.shuffle(order)
        for i in range(0, len(order), batch_size):
            chunk = order[i : i + batch_size]
            if len(chunk) < batch_size and drop_last:
                break
            batch_events = [events[j] for j in chunk]
            yield pack_events(
                batch_events, block_size, n_max=n_max, e_max=e_max,
                aug_pair_p=aug_pair_p if shuffle_rng is not None else 0.0,
                aug_rng=shuffle_rng,
                window_pairs=window_pairs,
                # per-event processed-pair cache: the aug-independent base
                # block is built once per event and fresh augmentation pairs
                # are appended as a separate windowed block (identical pair
                # set/masks/closure, ~20 MB per 60k event) — a full re-pack
                # was ~0.7 s/event/epoch of host time, which made 60k-scale
                # epochs host-bound at 1 vCPU (batching._process_event_pairs)
                cache=True,
            )


def make_synthetic_tracking(
    n_events: int = 20,
    n_points: int = 1000,
    seed: int = 0,
    **kwargs,
) -> SplitDataset:
    rng = np.random.default_rng(seed)
    sizes = rng.integers(int(n_points * 0.8), n_points + 1, n_events)
    events = [
        synthetic_tracking_event(rng, n_points=int(s), **kwargs) for s in sizes
    ]
    n_tr = int(n_events * 0.8)
    n_va = max(1, int(n_events * 0.1))
    return SplitDataset(
        train=events[:n_tr],
        valid=events[n_tr : n_tr + n_va],
        test=events[n_tr + n_va :] or events[-1:],
        in_dim=events[0].x.shape[1],
        coords_dim=events[0].coords.shape[1],
    )


def make_synthetic_pileup(
    n_events: int = 20,
    n_points: int = 1000,
    seed: int = 0,
    **kwargs,
) -> SplitDataset:
    rng = np.random.default_rng(seed)
    sizes = rng.integers(int(n_points * 0.8), n_points + 1, n_events)
    events = [
        synthetic_pileup_event(rng, n_points=int(s), **kwargs) for s in sizes
    ]
    n_tr = int(n_events * 0.8)
    n_va = max(1, int(n_events * 0.1))
    return SplitDataset(
        train=events[:n_tr],
        valid=events[n_tr : n_tr + n_va],
        test=events[n_tr + n_va :] or events[-1:],
        in_dim=events[0].x.shape[1],
        coords_dim=events[0].coords.shape[1],
    )


def get_dataset(name: str, seed: int = 0, **kwargs) -> SplitDataset:
    """Dataset factory keyed by reference-style dataset_name strings."""
    if name.startswith("synthetic-tracking"):
        n_points = int(name.rsplit("-", 1)[-1].replace("k", "000")) if name[-1] in "k0123456789" else 1000
        return make_synthetic_tracking(n_points=n_points, seed=seed, **kwargs)
    if name.startswith("synthetic-pileup"):
        return make_synthetic_pileup(seed=seed, **kwargs)
    if name.startswith("tracking-") or name == "pileup":
        from .loaders import load_reference_dataset

        return load_reference_dataset(name, **kwargs)
    raise NotImplementedError(name)
