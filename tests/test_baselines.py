"""Baseline attention mechanisms + GNNs: shapes, finiteness, masking, grads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hept_tpu.models import HeptTransformer, TransformerConfig
from hept_tpu.models.gnns import GNNStack

N = 64
BASE = dict(
    in_dim=5,
    coords_dim=4,
    h_dim=8,
    num_heads=2,
    n_layers=2,
    block_size=16,
    bucket_size=16,
    n_hashes=2,
    num_regions=9,
    num_w_per_dist=4,
    nb_features=16,
    nb_features_inner=4,
    knn_k=4,
)


def _data(seed=0, n=N):
    key = jax.random.PRNGKey(seed)
    kx, kc = jax.random.split(key)
    x = jax.random.normal(kx, (n, BASE["in_dim"]))
    coords = jax.random.normal(kc, (n, BASE["coords_dim"]))
    valid = jnp.arange(n) < n - 11  # ragged
    return x, coords, valid


ATTN_TYPES = ["performer", "flt", "reformer", "smyrf", "sb", "pct", "flatformer"]


@pytest.mark.parametrize("attn_type", ATTN_TYPES)
def test_forward_and_grad(attn_type):
    cfg = TransformerConfig(attn_type=attn_type, pe_type="learned", **BASE)
    model = HeptTransformer(cfg)
    x, coords, valid = _data()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "rotations": jax.random.PRNGKey(1)},
        x, coords, valid,
    )
    rngs = {"rotations": jax.random.PRNGKey(2)}
    out = model.apply(variables, x, coords, valid, rngs=rngs)
    assert out.shape == (N, BASE["h_dim"] // 2)
    assert np.isfinite(np.asarray(out)[: N - 11]).all()

    def loss(params):
        o = model.apply(
            {"params": params, **{k: v for k, v in variables.items() if k != "params"}},
            x, coords, valid, rngs=rngs,
        )
        return jnp.sum(jnp.where(valid[:, None], o, 0.0) ** 2)

    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


@pytest.mark.parametrize("attn_type", ["performer", "smyrf"])
def test_invalid_keys_do_not_affect_valid_outputs(attn_type):
    # Changing the *features* of invalid rows must not change valid outputs.
    cfg = TransformerConfig(attn_type=attn_type, pe_type="none", **BASE)
    model = HeptTransformer(cfg)
    x, coords, valid = _data()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "rotations": jax.random.PRNGKey(1)},
        x, coords, valid,
    )
    rngs = {"rotations": jax.random.PRNGKey(2)}
    out1 = model.apply(variables, x, coords, valid, rngs=rngs)
    x2 = jnp.where(valid[:, None], x, 77.0)
    out2 = model.apply(variables, x2, coords, valid, rngs=rngs)
    nv = int(valid.sum())
    np.testing.assert_allclose(
        np.asarray(out1[:nv]), np.asarray(out2[:nv]), rtol=1e-4, atol=1e-5
    )


GNN_TYPES = ["gcn", "gatedgnn", "dgcnn", "gravnet"]


def _edges(coords, valid, k=4):
    n = coords.shape[0]
    from hept_tpu.ops.knn import knn_brute_force

    d2, idx = knn_brute_force(coords[:, :2], coords[:, :2], k + 1, valid=valid)
    dst = jnp.repeat(jnp.arange(n, dtype=jnp.int32), k)
    src = idx[:, 1:].reshape(-1).astype(jnp.int32)
    edges = jnp.stack([src, dst])
    edge_mask = valid[src] & valid[dst]
    ew = -jnp.sum(
        (coords[src, :2] - coords[dst, :2]) ** 2, axis=1, keepdims=True
    )
    return edges, edge_mask, ew


@pytest.mark.parametrize("conv_type", GNN_TYPES)
def test_gnn_forward(conv_type):
    cfg = TransformerConfig(**BASE)
    model = GNNStack(cfg, conv_type=conv_type, k=4, knn_dim=3)
    x, coords, valid = _data()
    edges, edge_mask, ew = _edges(coords, valid)
    variables = model.init(
        jax.random.PRNGKey(0), x, coords, valid,
        edges=edges, edge_mask=edge_mask, edge_weight=ew,
    )
    out = model.apply(
        variables, x, coords, valid,
        edges=edges, edge_mask=edge_mask, edge_weight=ew,
    )
    assert out.shape == (N, BASE["h_dim"] // 2)
    assert np.isfinite(np.asarray(out)[: int(valid.sum())]).all()
