"""Loaders for the reference's processed dataset format.

The reference ships PyG `InMemoryDataset` archives (`data.pt` with a collated
`Data` + slices dict, src/datasets/tracking.py:85). Unpickling PyG objects
normally needs torch_geometric; we install lightweight stub classes so the
tensors can be read with plain CPU torch, then convert to `Event`s with the
same per-sample transforms as the reference:

  TrackingTransform (tracking.py:26-35): append layer/10 to x,
    coords = [pos, x[:, :4]].
  PileupTransform (pileup.py:22-27): coords = [pos, x[:, :2]].
"""

from __future__ import annotations

import sys
import types
from pathlib import Path

import numpy as np

from .batching import Event
from .datasets import SplitDataset


class _StubData:
    """Duck-typed stand-in for torch_geometric.data.Data during unpickle."""

    def __init__(self, *args, **kwargs):
        self.__dict__.update(kwargs)

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:  # PyG >= 2 stores a nested mapping
            try:
                self.__dict__.update(dict(state))
            except Exception:
                self.__dict__["_state"] = state


def _install_pyg_stubs():
    if "torch_geometric" in sys.modules:
        return
    root = types.ModuleType("torch_geometric")
    data_mod = types.ModuleType("torch_geometric.data")
    data_mod.Data = _StubData
    data_mod.InMemoryDataset = object
    root.data = data_mod
    sys.modules["torch_geometric"] = root
    sys.modules["torch_geometric.data"] = data_mod


def _slice(tensor, slices, idx):
    s, e = int(slices[idx]), int(slices[idx + 1])
    return tensor[s:e]


def load_reference_dataset(name: str, data_dir: str = "data/") -> SplitDataset:
    """Load `<data_dir>/<name>/processed/data.pt` (reference layout).

    Splits follow the reference: 80/10/10 in stored order
    (tracking.py:38-51 sorts by event id at build time).
    """
    import torch

    _install_pyg_stubs()
    path = Path(data_dir) / name / "processed" / "data.pt"
    if not path.exists():
        raise FileNotFoundError(
            f"{path} not found — place the reference-processed dataset there "
            f"(Zenodo download per reference README) or use a synthetic-* dataset."
        )
    payload = torch.load(path, map_location="cpu", weights_only=False)
    data, slices = payload[0], payload[1]

    def get(obj, key):
        val = getattr(obj, key, None)
        if val is None and hasattr(obj, "_store"):
            val = obj._store.get(key)
        return val

    n_events = len(next(iter(slices.values()))) - 1
    events = []
    for i in range(n_events):
        x = _slice(get(data, "x"), slices["x"], i).numpy().astype(np.float32)
        pos = _slice(get(data, "pos"), slices["pos"], i).numpy().astype(np.float32)
        if "tracking" in name:
            # TrackingTransform: x <- [x, layer/10]; coords = [pos, x[:, :4]]
            layer = _slice(get(data, "layer"), slices["layer"], i).numpy()
            x = np.concatenate([x, layer[:, None].astype(np.float32) / 10.0], axis=1)
            coords = np.concatenate([pos, x[:, :4]], axis=1)
            pid = _slice(get(data, "particle_id"), slices["particle_id"], i).numpy()
            _, dense_ids = np.unique(pid, return_inverse=True)
            # keep noise (pid 0) at dense id 0
            if (pid == 0).any():
                zero_dense = dense_ids[pid == 0][0]
                swap = dense_ids.copy()
                swap[dense_ids == zero_dense] = 0
                swap[dense_ids == 0] = zero_dense
                dense_ids = swap
            recons = _slice(
                get(data, "reconstructable"), slices["reconstructable"], i
            ).numpy().astype(np.float32)
            pt = _slice(get(data, "pt"), slices["pt"], i).numpy().astype(np.float32)
            pairs = _slice(
                get(data, "point_pairs_index"), slices["point_pairs_index"], i
            ).numpy().astype(np.int32)
            if pairs.shape[0] != 2:
                pairs = pairs.T
            events.append(
                Event(
                    x=x, coords=coords.astype(np.float32),
                    cluster_ids=dense_ids.astype(np.int32),
                    recons=recons, pts=pt, pairs=pairs,
                )
            )
        else:  # pileup
            coords = np.concatenate([pos, x[:, :2]], axis=1)
            y = _slice(get(data, "y"), slices["y"], i).numpy().astype(np.float32)
            is_neu = _slice(get(data, "is_neu"), slices["is_neu"], i).numpy()
            events.append(
                Event(
                    x=x, coords=coords.astype(np.float32), y=y.reshape(-1),
                    is_neu=is_neu.reshape(-1).astype(bool),
                )
            )

    n_tr = int(n_events * 0.8)
    n_va = int(n_events * 0.1)
    return SplitDataset(
        train=events[:n_tr],
        valid=events[n_tr : n_tr + n_va],
        test=events[n_tr + n_va :],
        in_dim=events[0].x.shape[1],
        coords_dim=events[0].coords.shape[1],
    )
