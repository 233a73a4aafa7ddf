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
