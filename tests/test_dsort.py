"""Distributed payload routing (parallel/dsort.py) on the 8-device CPU mesh.

Contract: `sort_perm` reproduces grouped_sort_carry's stable permutation
bit-exactly; `shard_permute` applies a replicated permutation to a sharded
payload through one capped all_to_all, exactly (forward and gradients);
`permute_overflows` flags cap violations. These are the sharded transport
sorts for bucket-axis SP (SURVEY §2.9 stretch; reference hept.py:103-115
argsort/gather transport, which has no multi-device analogue).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from hept_tpu.parallel.dsort import (
    invert_perm,
    make_shard_permute,
    permute_overflows,
    sort_perm,
)

C, ROWS, NSH, NE = 3, 5, 8, 16
N = NSH * NE


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    assert len(devs) >= NSH
    return Mesh(np.array(devs[:NSH]), ("buckets",))


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def random_perm(rng):
    return jnp.asarray(
        np.stack([rng.permutation(N) for _ in range(C)]).astype(np.int32)
    )


def test_shard_permute_exact(mesh, rng):
    perm = random_perm(rng)
    payload = jnp.asarray(rng.normal(size=(C, ROWS, N)).astype(np.float32))
    fn = make_shard_permute(mesh, "buckets", cap=NE)
    out = fn(perm, payload)
    ref = jnp.take_along_axis(
        payload, jnp.broadcast_to(perm[:, None, :], payload.shape), axis=2
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    assert not bool(permute_overflows(perm, NSH, NE))


def test_sort_perm_matches_grouped_sort_carry(mesh, rng):
    from hept_tpu.core.buckets import grouped_sort_carry

    keys = jnp.asarray(rng.normal(size=(C, N)).astype(np.float32))
    payload = jnp.asarray(rng.normal(size=(C, ROWS, N)).astype(np.float32))
    (sorted_ref,), (q_src,) = grouped_sort_carry(
        [keys[:, None]], [payload[:, None]], pack=False, n_ops=4
    )
    perm = sort_perm(keys)
    np.testing.assert_array_equal(
        np.asarray(perm), np.asarray(q_src).reshape(C, N))
    fn = make_shard_permute(mesh, "buckets", cap=NE)
    out = fn(perm, payload)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(sorted_ref).reshape(C, ROWS, N))


def test_shard_permute_gradients(mesh, rng):
    perm = random_perm(rng)
    payload = jnp.asarray(rng.normal(size=(C, ROWS, N)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(C, ROWS, N)).astype(np.float32))
    fn = make_shard_permute(mesh, "buckets", cap=NE)

    def loss_sharded(x):
        return jnp.sum(jnp.tanh(fn(perm, x)) * w)

    def loss_ref(x):
        y = jnp.take_along_axis(
            x, jnp.broadcast_to(perm[:, None, :], x.shape), axis=2)
        return jnp.sum(jnp.tanh(y) * w)

    g1 = jax.grad(loss_sharded)(payload)
    g2 = jax.grad(loss_ref)(payload)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)


def test_round_trip_unsort(mesh, rng):
    perm = random_perm(rng)
    inv = invert_perm(perm)
    payload = jnp.asarray(rng.normal(size=(C, ROWS, N)).astype(np.float32))
    fn = make_shard_permute(mesh, "buckets", cap=NE)
    back = fn(inv, fn(perm, payload))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(payload))


def test_overflow_flag():
    # identity permutation: each dst block sources its whole NE-slab from
    # exactly one src chip -> diagonal cells of size NE
    perm = jnp.asarray(
        np.stack([np.arange(N) for _ in range(C)]).astype(np.int32))
    assert bool(permute_overflows(perm, NSH, NE - 1))
    assert not bool(permute_overflows(perm, NSH, NE))
