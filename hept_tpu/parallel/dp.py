"""Data-parallel training step over a device mesh.

Events shard on the batch axis; parameters replicate; XLA inserts the
gradient allreduce (`psum` over ICI) from the sharding annotations — the
TPU-native replacement for the DDP/NCCL stack the reference never had
(SURVEY §2.9: "DP (required for parity+target)").
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..train.state import TrainState


def make_dp_train_step(
    model_apply: Callable,
    loss_fn: Callable,
    tx,
    mesh: Mesh,
    donate: bool = True,
):
    """Build a jitted DP train step.

    Args:
      model_apply: (variables, batch, rngs) -> (B, N, out) outputs.
      loss_fn: (outputs, batch) -> scalar loss (mean over events inside).
      tx: optax transformation.
      mesh: device mesh with a "data" axis.
    Returns:
      train_step(state, batch) -> (state, metrics dict); `batch` is a dict of
      arrays with leading batch dim, placed with `shard_batch`.
    """
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))

    def step(state: TrainState, batch):
        rng, new_rng = jax.random.split(state.rng)

        def loss_of(params):
            outputs = model_apply(
                {"params": params, "constants": state.constants},
                batch,
                rngs={"dropout": rng},
            )
            return loss_fn(outputs, batch)

        loss, grads = jax.value_and_grad(loss_of)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            rng=new_rng,
        )
        gnorm = optax_global_norm(grads)
        return new_state, {"loss": loss, "grad_norm": gnorm}

    jitted = jax.jit(
        step,
        in_shardings=(repl, shard),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )
    return jitted


def make_single_device_train_step(model_apply, loss_fn, tx):
    """Plain-jit train step for n_devices == 1 — same math as
    `make_dp_train_step` without the mesh/NamedSharding wrapper (which buys
    nothing on one chip and trips some remote backends' AOT compilers)."""

    @jax.jit
    def step(state: TrainState, batch):
        rng, new_rng = jax.random.split(state.rng)

        def loss_of(params):
            outputs = model_apply(
                {"params": params, "constants": state.constants},
                batch,
                rngs={"dropout": rng},
            )
            return loss_fn(outputs, batch)

        loss, grads = jax.value_and_grad(loss_of)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            rng=new_rng,
        )
        return new_state, {"loss": loss, "grad_norm": optax_global_norm(grads)}

    return step


def optax_global_norm(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves))


def shard_batch(batch: dict, mesh: Mesh):
    """Place a host batch dict on the mesh, sharded over the batch axis."""
    shard = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.asarray(x), shard), batch
    )
