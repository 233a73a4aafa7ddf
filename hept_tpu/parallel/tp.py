"""Head- and hash-sharded tensor parallelism composed with data parallelism.

The reference has no distributed training at all (SURVEY §2.9); this is the
TPU-native scale-out design for events too large (or models too slow) for
one chip: a mesh of ("data"[, "hashes"][, "heads"]) where events shard over
"data", the attention heads over "heads" and the n_hashes OR rounds over
"hashes" — up to num_heads x n_hashes (24 with reference hyperparameters)
chips per event. Each chip hashes / sorts / attends its own (hash, head)
slice end-to-end — per-(hash, head) locality is exact because hash_shift,
regions and E2LSH directions are all per-(hash, head) — and the only
per-layer collectives are the all-gather reassembling the (n, heads*d)
attention output before the full out-projection (`head_axis`) and the psum
of the OR-combine numerator/denominator (`hash_axis`). The replication-pad
plan broadcasts shard 0's codes so all shards agree (_prepare_event).

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


def param_specs(
    variables: dict, head_axis: str | None = "heads",
    hash_axis: str | None = None,
) -> dict:
    """PartitionSpec pytree for a HeptTransformer variables dict.

    Head-sharded leaves (head-major layouts):
      w_q/w_k/w_v kernel (d, h*d) -> dim 1; their bias (h*d,) -> dim 0;
      w_rpe (h*d, (cd-1)*nw) torch-layout -> dim 0;
      e2lsh_alpha (h, hash_dim, c) -> dim 0;
      regions (c, num_and_hashes, h) -> dim 2.
    Hash-sharded leaves (intra-event OR-round parallelism):
      e2lsh_alpha -> dim 2; regions -> dim 0.
    Everything else replicates. Leaves under the scan-stacked "blocks"
    subtree carry a leading layer dim (stack_layer_params), shifting the
    sharded dims by one.
    """

    def spec_for(path, leaf):
        names = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
        off = 1 if "blocks" in names else 0
        dims = [None] * leaf.ndim

        def shard(dim, axis):
            if axis is not None:
                dims[off + dim] = axis

        for nm in names:
            if nm in ("w_q", "w_k", "w_v") and names[-1] == "kernel":
                shard(1, head_axis)
                return P(*dims)
            if nm in ("w_q", "w_k", "w_v") and names[-1] == "bias":
                shard(0, head_axis)
                return P(*dims)
        if names[-1] == "w_rpe":
            shard(0, head_axis)
        elif names[-1] == "e2lsh_alpha":
            shard(0, head_axis)
            shard(2, hash_axis)
        elif names[-1] == "regions":
            shard(0, hash_axis)
            shard(2, head_axis)
        return P(*dims)

    return jax.tree_util.tree_map_with_path(spec_for, variables)


def head_param_specs(variables: dict, axis: str = "heads") -> dict:
    """Back-compat wrapper: head-only sharding specs."""
    return param_specs(variables, head_axis=axis, hash_axis=None)


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
    head_axis: str | None = "heads",
    hash_axis: str | None = None,
    batch_apply: Callable | None = None,
):
    """Build a jitted DP × head-TP (× hash-TP) train step.

    Args:
      model_factory: cfg -> model (e.g. HeptTransformer); called once with the
        LOCAL config (num_heads // head-axis size, n_hashes // hash-axis
        size, axes set).
      model_cfg: the global TransformerConfig (attn_type must be "hept").
      loss_fn: (outputs, batch) -> scalar (mean over the local events).
      variables_template: a variables dict (for building the spec tree).
      batch_apply: optional (model, variables, batch, rngs) -> outputs; the
        default vmaps the single-event model over the dense batch.
    Returns train_step(state, batch) -> (state, metrics).
    """
    assert model_cfg.attn_type == "hept", "head/hash sharding targets HEPT"
    repl = dict()
    if head_axis is not None and head_axis in mesh.shape:
        n_heads_shards = mesh.shape[head_axis]
        assert model_cfg.num_heads % n_heads_shards == 0, (
            f"num_heads {model_cfg.num_heads} not divisible by "
            f"{n_heads_shards} head shards"
        )
        repl["num_heads"] = model_cfg.num_heads // n_heads_shards
        repl["head_axis"] = head_axis
    else:
        head_axis = None
    if hash_axis is not None and hash_axis in mesh.shape:
        n_hash_shards = mesh.shape[hash_axis]
        assert model_cfg.n_hashes % n_hash_shards == 0, (
            f"n_hashes {model_cfg.n_hashes} not divisible by "
            f"{n_hash_shards} hash shards"
        )
        repl["n_hashes"] = model_cfg.n_hashes // n_hash_shards
        repl["hash_axis"] = hash_axis
    else:
        hash_axis = None
    local_cfg = dataclasses.replace(model_cfg, **repl)
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

    p_specs = param_specs(variables_template["params"], head_axis, hash_axis)
    const_specs = param_specs(
        variables_template["constants"], head_axis, hash_axis
    )

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
        # already replicated over the model axes (post-all_gather/psum
        # compute is identical); the pmeans make that provable for
        # out_specs=P()
        if head_axis is not None:
            loss = jax.lax.pmean(loss, head_axis)
        if hash_axis is not None:
            loss = jax.lax.pmean(loss, hash_axis)
        return loss

    def batch_specs(batch):
        return jax.tree_util.tree_map(
            lambda x: P(data_axis, *([None] * (jnp.ndim(x) - 1))), batch
        )

    def step(state: TrainState, batch):
        rng, new_rng = jax.random.split(state.rng)

        global_loss = jax.shard_map(
            local_loss,
            mesh=mesh,
            in_specs=(p_specs, const_specs, batch_specs(batch), P()),
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
