"""Interpret-mode equivalence tests for the Pallas row-gather candidates.

Both kernels implement the `permute_gather_rows` u32 core contract
(core/buckets.py:473): out[r, p, :] = src[r % S, idx[r, p], :], lanes
padded to 128.  Numerical oracle: direct numpy indexing.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from hept_tpu.ops.gather_pallas import row_gather_dma, row_gather_vreg

pytestmark = pytest.mark.quick


def _case(S, R, n, w, seed=0):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, 2**32, size=(S, n, w), dtype=np.uint32)
    idx = np.stack([rng.permutation(n) for _ in range(R)]).astype(np.int32)
    want = np.zeros((R, n, 128), dtype=np.uint32)
    for r in range(R):
        want[r, :, :w] = src[r % S, idx[r]]
    return jnp.asarray(src), jnp.asarray(idx), want


@pytest.mark.parametrize("tile", [64, 128])
@pytest.mark.parametrize("S,R,n,w", [(3, 3, 256, 100), (1, 4, 192, 128)])
def test_vreg_matches_numpy(S, R, n, w, tile):
    src, idx, want = _case(S, R, n, w)
    got = row_gather_vreg(src, idx, tile=tile, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_vreg_ragged_tail():
    # n not a multiple of the tile exercises the self-pointing pad rows.
    src, idx, want = _case(2, 2, 200, 100, seed=3)
    got = row_gather_vreg(src, idx, tile=64, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), want)


@pytest.mark.parametrize("S,R,n,w", [(3, 3, 256, 100), (1, 2, 96, 128)])
def test_dma_matches_numpy(S, R, n, w):
    src, idx, want = _case(S, R, n, w, seed=7)
    got = row_gather_dma(src, idx, t_tile=64, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_permute_gather_rows_pallas_backend(monkeypatch):
    """HEPT_ROW_GATHER=pallas routes permute_gather_rows through the DMA
    kernel with identical values and gradients."""
    import jax
    import hept_tpu.core.buckets as B

    rng = np.random.default_rng(11)
    S, R, n, w = 2, 4, 200, 9
    rows = jnp.asarray(rng.normal(size=(S, n, w)).astype(np.float32))
    perms = np.stack([rng.permutation(n) for _ in range(R)]).astype(np.int32)
    inv = np.argsort(perms, axis=-1).astype(np.int32)
    idx, invj = jnp.asarray(perms), jnp.asarray(inv)

    def run(pack):
        def loss(x):
            return (B.permute_gather_rows(x, idx, invj, pack=pack) ** 2).sum()
        val, grad = jax.value_and_grad(loss)(rows)
        return np.asarray(val), np.asarray(grad)

    for pack in (False, True):
        v_ref, g_ref = run(pack)
        monkeypatch.setattr(B, "_ROW_GATHER_BACKEND", "pallas")
        # per-(pack) closure cache holds the XLA-traced fns; clear it
        B._permute_gather_rows_cache.clear()
        v_pal, g_pal = run(pack)
        monkeypatch.setattr(B, "_ROW_GATHER_BACKEND", "xla")
        B._permute_gather_rows_cache.clear()
        np.testing.assert_allclose(v_pal, v_ref, rtol=0, atol=0)
        np.testing.assert_allclose(g_pal, g_ref, rtol=0, atol=0)
