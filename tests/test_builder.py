"""TrackML point-cloud builder on tiny synthetic raw data."""

import numpy as np
import pandas as pd
import pytest

from hept_tpu.data.builders.trackml import (
    PointCloudBuilder,
    get_truth_edges,
    preprocess_detector,
)


pytestmark = pytest.mark.quick

def _toy_raw(n_hits=40, seed=0):
    rng = np.random.default_rng(seed)
    # hits on pixel barrel (volume 8, layers 2/4/6/8)
    layers = rng.choice([2, 4, 6, 8], n_hits)
    hits = pd.DataFrame(
        {
            "hit_id": np.arange(1, n_hits + 1),
            "x": rng.normal(0, 50, n_hits) + 10,
            "y": rng.normal(0, 50, n_hits) + 10,
            "z": rng.normal(0, 100, n_hits),
            "volume_id": np.full(n_hits, 8),
            "layer_id": layers,
            "module_id": rng.integers(1, 3, n_hits),
        }
    )
    # 8 particles, ~5 hits each
    pids = rng.choice(np.arange(1, 9) * 1000, n_hits)
    pids[:4] = 0  # noise
    particles = pd.DataFrame(
        {
            "particle_id": np.arange(1, 9) * 1000,
            "px": rng.normal(0, 2, 8),
            "py": rng.normal(0, 2, 8),
            "pz": rng.normal(0, 2, 8),
            "q": rng.choice([-1, 1], 8),
            "vx": np.zeros(8),
            "vy": np.zeros(8),
            "vz": np.zeros(8),
        }
    )
    truth = pd.DataFrame({"hit_id": hits.hit_id, "particle_id": pids})
    n_cells = n_hits * 3
    cells = pd.DataFrame(
        {
            "hit_id": np.repeat(hits.hit_id.to_numpy(), 3),
            "ch0": rng.integers(0, 300, n_cells),
            "ch1": rng.integers(0, 300, n_cells),
            "value": rng.uniform(0, 1, n_cells),
        }
    )
    detector = pd.DataFrame(
        [
            {
                "volume_id": 8, "layer_id": l, "module_id": m, "module_t": 0.15,
                "pitch_u": 0.05, "pitch_v": 0.05,
                "rot_xu": 1.0, "rot_xv": 0.0, "rot_xw": 0.0,
                "rot_yu": 0.0, "rot_yv": 1.0, "rot_yw": 0.0,
                "rot_zu": 0.0, "rot_zv": 0.0, "rot_zw": 1.0,
            }
            for l in (2, 4, 6, 8)
            for m in (1, 2)
        ]
    )
    return hits, particles, truth, cells, detector


def test_build_single_sector():
    hits, particles, truth, cells, detector = _toy_raw()
    builder = PointCloudBuilder(detector=detector, n_sectors=1, add_true_edges=True)
    events = builder.build_event(hits, particles, truth, cells)
    assert len(events) == 1
    ev = events[0]
    assert ev.x.shape[1] == 15  # 14 features + layer/10
    assert ev.coords.shape[1] == 6
    assert ev.n == len(hits)
    # noise hits keep dense cluster id 0
    assert (ev.cluster_ids >= 0).all()
    assert np.isfinite(ev.x).all() and np.isfinite(ev.coords).all()
    # true edges connect same-particle hits only
    if ev.pairs is not None and ev.pairs.shape[1]:
        assert (ev.cluster_ids[ev.pairs[0]] == ev.cluster_ids[ev.pairs[1]]).all()


def test_sectorization_covers_all_sectors():
    hits, particles, truth, cells, detector = _toy_raw(n_hits=120, seed=1)
    builder = PointCloudBuilder(detector=detector, n_sectors=4)
    events = builder.build_event(hits, particles, truth, cells)
    assert len(events) == 4
    total = sum(ev.n for ev in events)
    # extended sectors overlap, so total >= n input hits is not guaranteed per
    # hit, but every sector should be non-trivial and finite
    assert total > 0
    for ev in events:
        assert np.isfinite(ev.x).all()


def test_truth_edges():
    pids = np.asarray([0, 5, 5, 5, 7, 7, 0])
    edges = get_truth_edges(pids)
    assert edges.shape == (2, 4)  # C(3,2) + C(2,2) = 3 + 1
    assert (pids[edges[0]] == pids[edges[1]]).all()
    assert (pids[edges[0]] > 0).all()


def test_detector_tables():
    *_, detector = _toy_raw()
    det = preprocess_detector(detector)
    assert det["rotations"].shape[-2:] == (3, 3)
    np.testing.assert_allclose(det["rotations"][8, 2, 1], np.eye(3))
    assert det["thicknesses"][8, 4, 2] == 0.15
    assert det["pixel_size"][8, 6, 1, 0] == 0.05
