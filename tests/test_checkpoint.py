"""Orbax checkpoint save/restore of the full train state."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np
import optax

from hept_tpu.train.state import CheckpointManager, TrainState


pytestmark = pytest.mark.quick

def test_save_restore_roundtrip(tmp_path):
    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones(3)}
    constants = {"alpha": jnp.full((2, 2), 3.0)}
    tx = optax.adam(1e-3)
    state = TrainState.create(
        {"params": params, "constants": constants}, tx, jax.random.PRNGKey(7)
    )
    # advance one step so opt_state is non-trivial
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    state = state.replace(
        step=5,
        params=optax.apply_updates(state.params, updates),
        opt_state=opt_state,
    )

    mgr = CheckpointManager(tmp_path / "ckpt")
    mgr.save(5, state, metrics={"acc": 0.5})
    mgr.close()

    mgr2 = CheckpointManager(tmp_path / "ckpt")
    assert mgr2.latest_step() == 5
    template = TrainState.create(
        {"params": params, "constants": constants}, tx, jax.random.PRNGKey(0)
    ).replace(step=0)
    restored = mgr2.restore(template)
    assert int(restored.step) == 5
    for a, b in zip(
        jax.tree_util.tree_leaves(restored.params),
        jax.tree_util.tree_leaves(state.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(
        np.asarray(restored.constants["alpha"]), np.asarray(constants["alpha"])
    )
    np.testing.assert_array_equal(np.asarray(restored.rng), np.asarray(state.rng))
    mgr2.close()
