"""Checkpoint converter: the shipped reference checkpoint must load into our
model with an exactly matching pytree structure and run a forward pass."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

CKPT = Path("/root/reference/example/ckpt/tracking-60k-model.pt")


@pytest.mark.skipif(not CKPT.exists(), reason="reference checkpoint not present")
def test_reference_checkpoint_roundtrip():
    pytest.importorskip("torch")
    from hept_tpu.models import HeptTransformer, TransformerConfig
    from hept_tpu.utils.convert import load_reference_checkpoint

    variables = load_reference_checkpoint(str(CKPT))

    cfg = TransformerConfig(
        in_dim=15, coords_dim=6, task="tracking",
        h_dim=24, num_heads=8, n_layers=4, block_size=100,
        n_hashes=3, num_regions=150, num_w_per_dist=10,
        padding_mode="replicate", attn_impl="xla",
    )
    model = HeptTransformer(cfg)
    n = 400
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n, 15))
    coords = jax.random.normal(jax.random.PRNGKey(1), (n, 6))
    valid = jnp.ones(n, dtype=bool)
    ref_init = model.init(jax.random.PRNGKey(2), x, coords, valid)

    # identical tree structure (same keys, same shapes)
    ref_flat = jax.tree_util.tree_structure(ref_init)
    got_flat = jax.tree_util.tree_structure(variables)
    assert ref_flat == got_flat, f"\nexpected {ref_flat}\ngot {got_flat}"
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(ref_init),
        jax.tree_util.tree_leaves_with_path(variables),
    ):
        assert a.shape == b.shape, f"{pa}: {a.shape} vs {b.shape}"

    out = model.apply(variables, x, coords, valid)
    assert out.shape == (n, 12)
    assert np.isfinite(np.asarray(out)).all()
