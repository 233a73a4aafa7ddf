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


def test_reformer_duplicate_attention_correction():
    """allow_duplicate_attention=False down-weights pairs colliding in
    multiple hash rounds (reference reformer.py:266-285)."""
    x, coords, valid = _data()
    rngs = {"rotations": jax.random.PRNGKey(2)}

    def run(**kw):
        cfg = TransformerConfig(attn_type="reformer", pe_type="none", **BASE, **kw)
        model = HeptTransformer(cfg)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "rotations": jax.random.PRNGKey(1)},
            x, coords, valid,
        )
        return np.asarray(model.apply(variables, x, coords, valid, rngs=rngs))

    out_dup = run()
    out_corr = run(allow_duplicate_attention=False)
    # params identical (flag changes no param shapes); with n_hashes=2 some
    # pairs collide in both rounds while others collide once, so the
    # correction must change valid outputs.
    nv = int(valid.sum())
    assert np.isfinite(out_corr[:nv]).all()
    assert np.abs(out_dup[:nv] - out_corr[:nv]).max() > 1e-6

    # masking cross-bucket attention must also change outputs and stay finite
    out_nocross = run(attend_across_buckets=False)
    assert np.isfinite(out_nocross[:nv]).all()
    assert np.abs(out_dup[:nv] - out_nocross[:nv]).max() > 1e-6


def test_reformer_dup_correction_single_round_is_noop():
    """With n_hashes=1 every co-attending pair collides exactly once, so the
    -log(count + 1e-9) correction is ~0 and corrected == uncorrected."""
    from hept_tpu.models.attention.reformer import ReformerAttention

    n, h, d = 32, 2, 8
    key = jax.random.PRNGKey(0)
    qk = jax.random.normal(key, (n, h * d))
    v = jax.random.normal(jax.random.PRNGKey(1), (n, h * d))
    valid = jnp.ones((n,), bool)

    outs = {}
    for flag in (True, False):
        attn = ReformerAttention(
            h_dim=d, num_heads=h, bucket_size=8, n_hashes=1,
            allow_duplicate_attention=flag,
        )
        variables = attn.init(
            {"params": key, "rotations": jax.random.PRNGKey(3)},
            qk, qk, v, valid=valid,
        )
        outs[flag] = np.asarray(
            attn.apply(variables, qk, qk, v, valid=valid,
                       rngs={"rotations": jax.random.PRNGKey(3)})
        )
    np.testing.assert_allclose(outs[True], outs[False], rtol=2e-5, atol=2e-6)
