"""Native C++ host kernels vs Python references."""

import numpy as np
import pytest

from hept_tpu import native


pytestmark = pytest.mark.quick

@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native.native_available():
        pytest.skip("no C++ toolchain available")


def test_radius_pairs_matches_bruteforce():
    rng = np.random.default_rng(0)
    n = 300
    eta = rng.uniform(-3, 3, n).astype(np.float32)
    phi = rng.uniform(-3, 3, n).astype(np.float32)
    radius = 0.5
    pairs = native.radius_pairs(eta, phi, radius, max_k=n)
    # brute force
    pos = np.stack([eta, phi], axis=1)
    d2 = ((pos[:, None] - pos[None, :]) ** 2).sum(-1)
    expect = set()
    for i in range(n):
        for j in range(n):
            if i != j and d2[i, j] < radius**2:
                expect.add((i, j))
    got = set(map(tuple, pairs.T.tolist()))
    assert got == expect


def test_radius_pairs_caps_k():
    rng = np.random.default_rng(1)
    n = 200
    eta = rng.normal(0, 0.01, n).astype(np.float32)  # all near each other
    phi = rng.normal(0, 0.01, n).astype(np.float32)
    pairs = native.radius_pairs(eta, phi, 1.0, max_k=5)
    src = pairs[0]
    counts = np.bincount(src, minlength=n)
    assert counts.max() <= 5


def test_pack_dense():
    rng = np.random.default_rng(2)
    events = [rng.normal(size=(5, 3)).astype(np.float32),
              rng.normal(size=(2, 3)).astype(np.float32)]
    out, valid = native.pack_dense(events, n_max=6)
    assert out.shape == (2, 6, 3)
    np.testing.assert_allclose(out[0, :5], events[0])
    np.testing.assert_allclose(out[1, :2], events[1])
    assert valid[0].sum() == 5 and valid[1].sum() == 2
    assert (out[1, 2:] == 0).all()


def test_knn_small_matches_numpy():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(50, 4)).astype(np.float32)
    d, i = native.knn_small(x, k=6)
    d2 = ((x[:, None] - x[None, :]) ** 2).sum(-1)
    expect_i = np.argsort(d2, axis=1)[:, :6]
    expect_d = np.sort(d2, axis=1)[:, :6]
    np.testing.assert_allclose(d, expect_d, rtol=1e-4, atol=1e-5)
    # indices may tie-swap; compare distances of chosen indices instead
    np.testing.assert_allclose(
        np.take_along_axis(d2, i, axis=1), expect_d, rtol=1e-4, atol=1e-5
    )
