"""Loader fixture tests: fabricate `data.pt` archives in the reference's
exact collated layout (PyG InMemoryDataset: node attrs concatenated along
dim 0, *index* attrs along dim 1 with values incremented by each graph's node
offset — Data.__inc__ semantics) and run `load_reference_dataset` on them
unconditionally (VERDICT missing #3)."""

import numpy as np
import pytest

pytestmark = pytest.mark.quick

torch = pytest.importorskip("torch")

from hept_tpu.data.loaders import _install_pyg_stubs, load_reference_dataset  # noqa: E402


def _collate(graphs: list[dict], index_keys: tuple[str, ...]) -> tuple:
    """Replicate PyG's collate: returns (Data-like, slices)."""
    _install_pyg_stubs()
    import torch_geometric.data as pygd

    keys = graphs[0].keys()
    data = pygd.Data()
    slices = {}
    for k in keys:
        parts, bounds, off = [], [0], 0
        node_off = 0
        for g in graphs:
            t = torch.as_tensor(g[k])
            if k in index_keys:
                t = t + node_off  # __inc__: index attrs offset by num_nodes
                parts.append(t)
                off += t.shape[1]
            else:
                parts.append(t)
                off += t.shape[0]
            bounds.append(off)
            node_off += int(torch.as_tensor(g["x"]).shape[0])
        dim = 1 if k in index_keys else 0
        setattr(data, k, torch.cat(parts, dim=dim))
        slices[k] = torch.tensor(bounds, dtype=torch.long)
    return data, slices


def _tracking_graph(rng, n, evtid):
    n_particles = max(2, n // 4)
    pid = rng.integers(0, n_particles, n)
    pid[0] = 0  # noise present
    # supervision pairs within particles (local indices)
    src, dst = [], []
    for p in np.unique(pid):
        if p == 0:
            continue
        idx = np.where(pid == p)[0]
        for a in idx:
            for b in idx:
                if a != b:
                    src.append(a)
                    dst.append(b)
    if not src:
        src, dst = [1], [2]
    pairs = np.stack([src, dst]).astype(np.int64)
    return dict(
        x=rng.standard_normal((n, 14)).astype(np.float32),
        pos=rng.standard_normal((n, 2)).astype(np.float32),
        layer=rng.integers(0, 10, n).astype(np.int64),
        particle_id=pid.astype(np.int64),
        reconstructable=rng.integers(0, 2, n).astype(np.int64),
        pt=rng.uniform(0.1, 3.0, n).astype(np.float32),
        evtid=np.array([evtid], dtype=np.int64),
        s=np.array([0], dtype=np.int64),
        point_pairs_index_rad=pairs,
        knn_edge_index_k60=np.stack(
            [rng.integers(0, n, 3 * n), rng.integers(0, n, 3 * n)]
        ).astype(np.int64),
    )


@pytest.fixture
def tracking_archive(tmp_path):
    rng = np.random.default_rng(0)
    sizes = [40, 56, 32, 48, 36, 44, 52, 40, 60, 36]
    evtids = [29005, 3, 17, 29001, 8, 21, 5, 12, 28999, 7]
    graphs = [
        _tracking_graph(rng, n, e) for n, e in zip(sizes, evtids)
    ]
    data, slices = _collate(
        graphs, index_keys=("point_pairs_index_rad", "knn_edge_index_k60")
    )
    idx_split = {"train": np.arange(8), "valid": np.array([8]), "test": np.array([9])}
    out = tmp_path / "tracking-6k" / "processed"
    out.mkdir(parents=True)
    torch.save((data, slices, idx_split), out / "data.pt")
    return tmp_path, graphs, evtids


def test_tracking_loader_fixture(tracking_archive):
    root, graphs, evtids = tracking_archive
    ds = load_reference_dataset("tracking-6k", data_dir=str(root))

    assert len(ds.train) + len(ds.valid) + len(ds.test) == len(graphs)
    # reference split math at 10 events: n_train = int(8) - 8 % 10 = 0,
    # n_valid = 1 -> all events land in valid/test (get_new_idx_split)
    assert len(ds.train) == 0 and len(ds.valid) == 1
    assert ds.in_dim == 15  # 14 + layer/10
    assert ds.coords_dim == 6

    # event order is evtid-sorted; first event of the concatenated split is
    # the smallest evtid
    order = np.argsort(evtids, kind="stable")
    all_events = ds.train + ds.valid + ds.test
    for ev, j in zip(all_events, order):
        g = graphs[j]
        n = g["x"].shape[0]
        assert ev.n == n
        # TrackingTransform: x = [x, layer/10]; coords = [pos, x[:, :4]]
        np.testing.assert_allclose(ev.x[:, :14], g["x"], rtol=1e-6)
        np.testing.assert_allclose(ev.x[:, 14], g["layer"] / 10.0, rtol=1e-6)
        np.testing.assert_allclose(ev.coords[:, :2], g["pos"], rtol=1e-6)
        np.testing.assert_allclose(ev.coords[:, 2:], ev.x[:, :4], rtol=1e-6)
        # pair indices de-offset back to local (the PyG __inc__ increment)
        assert ev.pairs.min() >= 0 and ev.pairs.max() < n
        np.testing.assert_array_equal(ev.pairs, g["point_pairs_index_rad"])
        # noise keeps dense id 0
        assert (ev.cluster_ids[g["particle_id"] == 0] == 0).all()
        # same-particle points share a dense id
        pid = g["particle_id"]
        for p in np.unique(pid):
            ids = ev.cluster_ids[pid == p]
            assert (ids == ids[0]).all()


def test_tracking_loader_feeds_trainer(tracking_archive):
    """The loaded events pack and run one InfoNCE step (end-to-end format
    compatibility, not just field parity)."""
    import jax
    import jax.numpy as jnp

    from hept_tpu.data.batching import pack_events
    from hept_tpu.models import HeptTransformer, TransformerConfig
    from hept_tpu.train.losses import infonce_loss

    root, _, _ = tracking_archive
    ds = load_reference_dataset("tracking-6k", data_dir=str(root))
    events = (ds.train + ds.valid + ds.test)[:2]
    batch = pack_events(events, block_size=16)
    cfg = TransformerConfig(
        in_dim=ds.in_dim, coords_dim=ds.coords_dim, task="tracking",
        h_dim=8, num_heads=2, n_layers=1, block_size=16, n_hashes=2,
        num_regions=9, num_w_per_dist=3, padding_mode="replicate",
    )
    model = HeptTransformer(cfg)
    x = jnp.asarray(batch["x"][0])
    c = jnp.asarray(batch["coords"][0])
    v = jnp.asarray(batch["valid"][0])
    variables = model.init(jax.random.PRNGKey(0), x, c, v)
    out = model.apply(variables, x, c, v)
    loss = infonce_loss(
        out, jnp.asarray(batch["pairs"][0]), jnp.asarray(batch["pair_mask"][0]),
        jnp.asarray(batch["cluster_ids"][0]), jnp.asarray(batch["recons"][0]),
        jnp.asarray(batch["pts"][0]),
    )
    assert np.isfinite(float(loss))


@pytest.fixture
def pileup_archive(tmp_path):
    rng = np.random.default_rng(1)
    graphs = []
    for n in [30, 44, 38, 26, 50]:
        pids = rng.integers(0, 7, n).astype(np.float32)
        x = np.concatenate(
            [rng.standard_normal((n, 7)).astype(np.float32), pids[:, None]], axis=1
        )
        graphs.append(
            dict(
                x=x,
                pos=rng.standard_normal((n, 2)).astype(np.float32),
                y=rng.integers(0, 2, n).astype(np.int64),
                is_neu=(rng.random(n) < 0.4),
                edge_index=np.stack(
                    [rng.integers(0, n, 2 * n), rng.integers(0, n, 2 * n)]
                ).astype(np.int64),
            )
        )
    data, slices = _collate(graphs, index_keys=("edge_index",))
    idx_split = {
        "train": np.array([0, 1, 2]),
        "valid": np.array([3]),
        "test": np.array([4]),
    }
    out = tmp_path / "pileup-10k" / "processed"
    out.mkdir(parents=True)
    torch.save((data, slices, idx_split), out / "data.pt")
    return tmp_path, graphs


def test_pileup_loader_fixture(pileup_archive):
    root, graphs = pileup_archive
    ds = load_reference_dataset("pileup-10k", data_dir=str(root))
    # pileup uses the STORED idx_split (pileup.py:34)
    assert [len(ds.train), len(ds.valid), len(ds.test)] == [3, 1, 1]
    assert ds.in_dim == 8
    assert ds.coords_dim == 4
    for ev, g in zip(ds.train + ds.valid + ds.test, graphs):
        np.testing.assert_allclose(ev.x, g["x"], rtol=1e-6)
        np.testing.assert_allclose(ev.coords[:, :2], g["pos"], rtol=1e-6)
        np.testing.assert_allclose(ev.coords[:, 2:], g["x"][:, :2], rtol=1e-6)
        np.testing.assert_array_equal(ev.y.astype(int), g["y"])
        np.testing.assert_array_equal(ev.is_neu, g["is_neu"])
