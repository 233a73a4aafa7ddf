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
    """Incremental: other stubs (e.g. the test-only torch_geometric.nn.MLP)
    may have created the root module already — only add what's missing, and
    never overwrite a real torch_geometric install."""
    root = sys.modules.get("torch_geometric")
    if root is None:
        root = types.ModuleType("torch_geometric")
        sys.modules["torch_geometric"] = root
    if "torch_geometric.data" not in sys.modules:
        data_mod = types.ModuleType("torch_geometric.data")
        data_mod.Data = _StubData
        data_mod.InMemoryDataset = object
        root.data = data_mod
        sys.modules["torch_geometric.data"] = data_mod


def _slice(tensor, slices, idx):
    s, e = int(slices[idx]), int(slices[idx + 1])
    return tensor[s:e]


def _tracking_split(evtids: np.ndarray) -> tuple[list, list, list]:
    """The reference's split: sort events by evtid, 80/10/10 with n_train
    rounded down to a multiple of 10 (tracking.py get_new_idx_split:38-51)."""
    order = np.argsort(evtids, kind="stable")
    n = len(order)
    n_tr = int(n * 0.8)
    n_tr -= n_tr % 10
    n_va = int(n * 0.1)
    return (
        list(order[:n_tr]),
        list(order[n_tr : n_tr + n_va]),
        list(order[n_tr + n_va :]),
    )


def load_reference_dataset(name: str, data_dir: str = "data/") -> SplitDataset:
    """Load `<data_dir>/<name>/processed/data.pt` (reference layout).

    The archive is `(collated Data, slices[, idx_split])`
    (tracking.py:85, pileup.py:34). PyG's collate concatenates node attrs
    along dim 0 and *index* attrs (point_pairs_index_rad, knn_edge_index_k60)
    along dim 1 **with values incremented by each graph's node offset**
    (PyG Data.__inc__ for keys containing "index") — so pair indices must be
    de-offset by `slices["x"][i]` when separating.

    Splits: tracking re-derives the reference's evtid-sorted 80/10/10 split
    (tracking.py get_new_idx_split); pileup uses the stored idx_split when
    present (pileup.py:34); otherwise 80/10/10 in stored order.
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
    idx_split = payload[2] if len(payload) > 2 else None

    def get(obj, key):
        val = getattr(obj, key, None)
        if val is None and hasattr(obj, "_store"):
            val = obj._store.get(key)
        return val

    n_events = len(slices["x"]) - 1
    events = []
    evtids = None
    if get(data, "evtid") is not None and "evtid" in slices:
        evtids = np.asarray(get(data, "evtid")).reshape(-1)
    for i in range(n_events):
        x = _slice(get(data, "x"), slices["x"], i).numpy().astype(np.float32)
        pos = _slice(get(data, "pos"), slices["pos"], i).numpy().astype(np.float32)
        node_offset = int(slices["x"][i])
        if "tracking" in name:
            # TrackingTransform: x <- [x, layer/10]; coords = [pos, x[:, :4]]
            layer = _slice(get(data, "layer"), slices["layer"], i).numpy()
            x = np.concatenate([x, layer.reshape(-1, 1).astype(np.float32) / 10.0], axis=1)
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
            key = (
                "point_pairs_index"
                if "point_pairs_index" in slices
                else "point_pairs_index_rad"
            )
            pairs_t = get(data, key)
            # index attrs collate along dim 1 (shape (2, E_total))
            pairs = pairs_t[:, int(slices[key][i]) : int(slices[key][i + 1])].numpy()
            pairs = pairs.astype(np.int64) - node_offset  # undo PyG __inc__
            if (pairs < 0).any() or (pairs >= x.shape[0]).any():
                raise ValueError(
                    f"event {i}: pair indices out of range after de-offset "
                    f"(min {pairs.min()}, max {pairs.max()}, n {x.shape[0]})"
                )
            events.append(
                Event(
                    x=x, coords=coords.astype(np.float32),
                    cluster_ids=dense_ids.astype(np.int32),
                    recons=recons, pts=pt, pairs=pairs.astype(np.int32),
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

    if "tracking" in name and evtids is not None:
        tr, va, te = _tracking_split(evtids)
    elif idx_split is not None and all(k in idx_split for k in ("train", "valid", "test")):
        tr = [int(j) for j in np.asarray(idx_split["train"]).reshape(-1)]
        va = [int(j) for j in np.asarray(idx_split["valid"]).reshape(-1)]
        te = [int(j) for j in np.asarray(idx_split["test"]).reshape(-1)]
    else:
        n_tr = int(n_events * 0.8)
        n_va = int(n_events * 0.1)
        tr = list(range(n_tr))
        va = list(range(n_tr, n_tr + n_va))
        te = list(range(n_tr + n_va, n_events))

    return SplitDataset(
        train=[events[j] for j in tr],
        valid=[events[j] for j in va],
        test=[events[j] for j in te],
        in_dim=events[0].x.shape[1],
        coords_dim=events[0].coords.shape[1],
    )
