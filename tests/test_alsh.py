"""ALSH transforms + auxiliary hash families."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from hept_tpu.core.alsh import (
    cross_polytope_lsh,
    hadamard_transform,
    inversion_number,
    l2lsh_k,
    l2lsh_q,
    sort_key_val,
    voronoi_lsh,
    xbox,
    xbox_max,
)
from hept_tpu.models.attention.smyrf import xboxplus


pytestmark = pytest.mark.quick

def test_xboxplus_equalizes_norms():
    q = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 5))
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 5)) * 2.0
    q_t, k_t = xboxplus(q, k)
    # after transform, all rows have identical norm sqrt(max|q|² + max|k|²)
    qn = jnp.linalg.norm(q_t, axis=-1)
    kn = jnp.linalg.norm(k_t, axis=-1)
    np.testing.assert_allclose(
        np.asarray(qn), np.broadcast_to(np.asarray(qn)[:, :1], qn.shape), rtol=1e-5
    )
    np.testing.assert_allclose(np.asarray(kn), np.asarray(qn), rtol=1e-5)
    # inner products preserved: q_t·k_t == q·k (ext dims are disjoint)
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("bnd,bmd->bnm", q_t, k_t)),
        np.asarray(jnp.einsum("bnd,bmd->bnm", q, k)),
        rtol=1e-4, atol=1e-5,
    )


def test_xbox_preserves_inner_products():
    q = jax.random.normal(jax.random.PRNGKey(2), (8, 4))
    k = jax.random.normal(jax.random.PRNGKey(3), (8, 4))
    q_t, k_t = xbox(q, k)
    np.testing.assert_allclose(
        np.asarray(q_t @ k_t.T), np.asarray(q @ k.T), rtol=1e-5, atol=1e-6
    )
    kn = np.asarray(jnp.linalg.norm(k_t, axis=-1))
    np.testing.assert_allclose(kn, np.broadcast_to(kn[:1], kn.shape), rtol=1e-5)


def test_xbox_max_shapes():
    q = jax.random.normal(jax.random.PRNGKey(4), (8, 4))
    k = jax.random.normal(jax.random.PRNGKey(5), (8, 4))
    q_t, k_t = xbox_max(q, k)
    assert q_t.shape == (8, 6) and k_t.shape == (8, 6)
    np.testing.assert_allclose(
        np.asarray(q_t @ k_t.T), np.asarray(q @ k.T), rtol=1e-4, atol=1e-5
    )


def test_l2lsh_shapes():
    v = jax.random.normal(jax.random.PRNGKey(6), (10, 4))
    assert l2lsh_k(v).shape == (10, 7)
    assert l2lsh_q(v).shape == (10, 7)


def test_voronoi_and_cross_polytope():
    v = jax.random.normal(jax.random.PRNGKey(7), (20, 6))
    b1 = voronoi_lsh(jax.random.PRNGKey(8), v, n_hashes=3, n_anchors=4)
    assert b1.shape == (3, 20) and int(b1.max()) < 4
    b2 = cross_polytope_lsh(jax.random.PRNGKey(9), v, n_hashes=2)
    assert b2.shape == (2, 20) and int(b2.max()) < 12
    # identical points hash identically
    v2 = jnp.concatenate([v[:1], v[:1]])
    bb = voronoi_lsh(jax.random.PRNGKey(8), v2, 2, 4)
    assert (bb[:, 0] == bb[:, 1]).all()


def test_sort_key_val():
    k = jnp.asarray([3.0, 1.0, 2.0])
    v = jnp.asarray([30, 10, 20])
    sk, sv = sort_key_val(k, v)
    np.testing.assert_array_equal(np.asarray(sk), [1, 2, 3])
    np.testing.assert_array_equal(np.asarray(sv), [10, 20, 30])


def test_hadamard_orthogonal():
    x = jax.random.normal(jax.random.PRNGKey(10), (5, 8))
    y = hadamard_transform(x)
    # orthonormal: norms preserved, double application = identity
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(y, axis=-1)),
        np.asarray(jnp.linalg.norm(x, axis=-1)),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(hadamard_transform(y)), np.asarray(x), rtol=1e-5, atol=1e-6
    )


def test_inversion_number():
    x = jnp.asarray([1.0, 2.0, 3.0])
    assert int(inversion_number(x, x)) == 0
    assert int(inversion_number(x, -x)) == 3  # fully reversed: C(3,2)


def test_h2lsh_transforms():
    import numpy as np

    from hept_tpu.core.alsh import h2lsh_k, h2lsh_q

    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.normal(size=(32, 6)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(8, 6)).astype(np.float32))
    kt, qt = h2lsh_k(k), h2lsh_q(q)
    assert kt.shape == (32, 7) and qt.shape == (8, 7)
    # all transformed keys share the max norm; queries are unit-norm
    norms = np.linalg.norm(np.asarray(kt), axis=-1)
    np.testing.assert_allclose(norms, norms.max(), rtol=1e-5)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(qt), axis=-1), 1.0, rtol=1e-5
    )


def test_qlsh_buckets_shift_invariant():
    import numpy as np

    from hept_tpu.core.alsh import qlsh_project

    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(4, 5)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(16, 5)).astype(np.float32))
    qp, kb = qlsh_project(jax.random.PRNGKey(0), q, k, n_hashes=3, r=0.5)
    assert qp.shape == (4, 3) and kb.shape == (4, 16, 3)
    # identical key/query pairs land in bucket 0
    _, kb_same = qlsh_project(jax.random.PRNGKey(0), q, q, n_hashes=3, r=0.5)
    diag = np.asarray(kb_same)[np.arange(4), np.arange(4)]
    assert (diag == 0).all()
