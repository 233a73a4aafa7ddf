"""Head-sharded tensor parallelism composed with data parallelism.

The reference has no distributed training at all (SURVEY §2.9); this is the
TPU-native scale-out design for events too large (or models too slow) for one
chip: a 2-D ("data", "heads") mesh where events shard over "data" and the
attention heads shard over "heads". Each chip hashes / sorts / attends its
own head slice end-to-end — per-(hash, head) locality is exact because
hash_shift, regions and E2LSH directions are all per-head — and the ONLY
collective inside a layer is the all-gather that reassembles the (n,
heads*d) attention output before the full out-projection
(models/attention/hept.py `head_axis`).

Gradient bookkeeping is automatic: `jax.value_and_grad` differentiates
*through* the shard_map, so the all-gather transposes to a reduce-scatter and
replicated-parameter cotangents come out correctly without manual psums.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..train.state import TrainState


def head_param_specs(variables: dict, axis: str = "heads") -> dict:
    """PartitionSpec pytree for a HeptTransformer variables dict: which dim
    of each leaf is sharded over the head axis.

    Head-sharded leaves (head-major layouts):
      w_q/w_k/w_v kernel (d, h*d) -> dim 1; their bias (h*d,) -> dim 0;
      w_rpe (h*d, (cd-1)*nw) torch-layout -> dim 0;
      e2lsh_alpha (h, hash_dim, c) -> dim 0;
      regions (c, num_and_hashes, h) -> dim 2.
    Everything else replicates. Leaves under the scan-stacked "blocks"
    subtree carry a leading layer dim (stack_layer_params), shifting the
    sharded dim by one.
    """

    def spec_for(path, leaf):
        names = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
        off = 1 if "blocks" in names else 0
        dims = [None] * leaf.ndim

        def shard(dim):
            dims[off + dim] = axis
            return P(*dims)

        for i, nm in enumerate(names):
            if nm in ("w_q", "w_k", "w_v") and names[-1] == "kernel":
                return shard(1)
            if nm in ("w_q", "w_k", "w_v") and names[-1] == "bias":
                return shard(0)
        if names[-1] == "w_rpe":
            return shard(0)
        if names[-1] == "e2lsh_alpha":
            return shard(0)
        if names[-1] == "regions":
            return shard(2)
        return P(*dims)

    return jax.tree_util.tree_map_with_path(spec_for, variables)


def place_variables(variables: dict, mesh: Mesh, axis: str = "heads") -> dict:
    """Device-put a variables dict with its head shardings on `mesh`."""
    specs = head_param_specs(variables, axis)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), variables, specs
    )


def make_tp_train_step(
    model_factory: Callable,
    model_cfg,
    loss_fn: Callable,
    tx,
    mesh: Mesh,
    variables_template: dict,
    *,
    data_axis: str = "data",
    head_axis: str = "heads",
    batch_apply: Callable | None = None,
):
    """Build a jitted DP × head-TP train step.

    Args:
      model_factory: cfg -> model (e.g. HeptTransformer); called once with the
        LOCAL config (num_heads // head-axis size, head_axis set).
      model_cfg: the global TransformerConfig (attn_type must be "hept").
      loss_fn: (outputs, batch) -> scalar (mean over the local events).
      variables_template: a variables dict (for building the spec tree).
      batch_apply: optional (model, variables, batch, rngs) -> outputs; the
        default vmaps the single-event model over the dense batch.
    Returns train_step(state, batch) -> (state, metrics).
    """
    assert model_cfg.attn_type == "hept", "head sharding targets HEPT"
    n_heads_shards = mesh.shape[head_axis]
    assert model_cfg.num_heads % n_heads_shards == 0, (
        f"num_heads {model_cfg.num_heads} not divisible by "
        f"{n_heads_shards} head shards"
    )
    local_cfg = dataclasses.replace(
        model_cfg,
        num_heads=model_cfg.num_heads // n_heads_shards,
        head_axis=head_axis,
    )
    local_model = model_factory(local_cfg)

    def default_apply(model, variables, batch, rngs):
        def one(xe, ce, ve, rng):
            return model.apply(
                variables, xe, ce, ve, deterministic=False,
                rngs={"dropout": rng},
            )

        keys = jax.random.split(rngs["dropout"], batch["x"].shape[0])
        return jax.vmap(one)(batch["x"], batch["coords"], batch["valid"], keys)

    apply_fn = batch_apply or default_apply

    param_specs = head_param_specs(variables_template["params"], head_axis)
    const_specs = head_param_specs(variables_template["constants"], head_axis)

    def local_loss(params, constants, batch, rng):
        # dropout varies per data shard, MUST match across head shards (the
        # non-attention compute is replicated over the head axis).
        rng = jax.random.fold_in(rng, jax.lax.axis_index(data_axis))
        outputs = apply_fn(
            local_model, {"params": params, "constants": constants},
            batch, {"dropout": rng},
        )
        loss = loss_fn(outputs, batch)
        loss = jax.lax.pmean(loss, data_axis)
        # already replicated over heads (post-all_gather compute is
        # identical); the pmean makes that provable for out_specs=P()
        return jax.lax.pmean(loss, head_axis)

    def batch_specs(batch):
        return jax.tree_util.tree_map(
            lambda x: P(data_axis, *([None] * (jnp.ndim(x) - 1))), batch
        )

    def step(state: TrainState, batch):
        rng, new_rng = jax.random.split(state.rng)

        global_loss = jax.shard_map(
            local_loss,
            mesh=mesh,
            in_specs=(param_specs, const_specs, batch_specs(batch), P()),
            out_specs=P(),
            check_vma=False,
        )

        def loss_of(params):
            return global_loss(params, state.constants, batch, rng)

        loss, grads = jax.value_and_grad(loss_of)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state, rng=new_rng
        )
        from .dp import optax_global_norm

        return new_state, {"loss": loss, "grad_norm": optax_global_norm(grads)}

    return jax.jit(step)


def shard_batch_2d(batch: dict, mesh: Mesh, data_axis: str = "data"):
    """Place a host batch sharded over the data axis (replicated over heads)."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(
            jnp.asarray(x),
            NamedSharding(mesh, P(data_axis, *([None] * (jnp.ndim(x) - 1)))),
        ),
        batch,
    )
