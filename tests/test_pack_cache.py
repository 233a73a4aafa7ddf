"""Per-event pack cache (batching._process_event_pairs cache=True).

The cached path builds the aug-independent base block once per event and
appends fresh augmentation pairs as a separate trailing windowed block.
Contract vs the full re-pack (cache=False): identical pair SET, masks,
per-pair weights, negative masks, reversal closure, per-window anchor-span
invariant, and identical rng consumption — only the window grouping (fp
summation order) may differ. Reference behavior being replicated: per-epoch
random pair augmentation, src/tracking_trainer.py process_data.
"""
import numpy as np
import pytest

from hept_tpu.data.batching import pack_events
from hept_tpu.data.synthetic import synthetic_tracking_event

WINDOW = 16


@pytest.fixture(scope="module")
def event():
    rng = np.random.default_rng(7)
    return synthetic_tracking_event(rng, n_points=300, avg_track_size=6,
                                    pairs_per_point=8)


def _real_sets(b, i=0):
    pairs, pm = b["pairs"][i], b["pair_mask"][i]
    real = np.flatnonzero(pm)
    key = pairs[0, real].astype(np.int64) * 10_000 + pairs[1, real]
    out = {"keys": np.sort(key)}
    for name in ("pair_weight", "pair_neg"):
        if name in b:
            order = np.argsort(key, kind="stable")
            out[name] = b[name][i, real][order]
    return out


def test_cached_equals_uncached_no_aug(event):
    a = pack_events([event], 10, window_pairs=WINDOW)
    c = pack_events([event], 10, window_pairs=WINDOW, cache=True)
    for k in a:
        np.testing.assert_array_equal(a[k], c[k], err_msg=k)
    # and the cache actually engaged + is reused bitwise
    assert getattr(event, "_pair_pack_cache", None)
    c2 = pack_events([event], 10, window_pairs=WINDOW, cache=True)
    for k in a:
        np.testing.assert_array_equal(a[k], c2[k], err_msg=k)


def test_cached_aug_same_set_weights_and_rng(event):
    e_max = event.pairs.shape[1] * 3 + 40 * WINDOW
    r1, r2 = np.random.default_rng(3), np.random.default_rng(3)
    a = pack_events([event], 10, e_max=e_max, aug_pair_p=0.4, aug_rng=r1,
                    window_pairs=WINDOW)
    c = pack_events([event], 10, e_max=e_max, aug_pair_p=0.4, aug_rng=r2,
                    window_pairs=WINDOW, cache=True)
    # identical rng consumption
    assert r1.integers(0, 1 << 30) == r2.integers(0, 1 << 30)
    sa, sc = _real_sets(a), _real_sets(c)
    np.testing.assert_array_equal(sa["keys"], sc["keys"])
    np.testing.assert_allclose(sa["pair_weight"], sc["pair_weight"],
                               rtol=0, atol=0)
    np.testing.assert_array_equal(sa["pair_neg"], sc["pair_neg"])


def test_cached_aug_closure_and_window_invariant(event):
    e_max = event.pairs.shape[1] * 3 + 40 * WINDOW
    c = pack_events([event], 10, e_max=e_max, aug_pair_p=0.4,
                    aug_rng=np.random.default_rng(11),
                    window_pairs=WINDOW, cache=True)
    pairs, pm, rev = c["pairs"][0], c["pair_mask"][0], c["pair_rev"][0]
    real = np.flatnonzero(pm)
    # reversal closure through the rev index
    np.testing.assert_array_equal(pairs[0, rev[real]], pairs[1, real])
    np.testing.assert_array_equal(pairs[1, rev[real]], pairs[0, real])
    # no duplicate real pairs
    key = pairs[0, real].astype(np.int64) * 10_000 + pairs[1, real]
    assert np.unique(key).size == key.size
    # per-window anchor span < WINDOW (the MXU pair-kernel invariant),
    # pads included (they copy in-run pairs); check the whole windows that
    # hold at least one real pair (the e_max tail past the processed length
    # is all-masked filler)
    e_whole = (pairs.shape[1] // WINDOW) * WINDOW
    p0 = pairs[0, :e_whole].reshape(-1, WINDOW)
    has_real = pm[:e_whole].reshape(-1, WINDOW).any(axis=1)
    span = p0.max(axis=1) - p0.min(axis=1)
    assert int(span[has_real].max()) < WINDOW


def test_cached_aug_loss_matches_uncached(event):
    import jax.numpy as jnp

    from hept_tpu.train.losses import infonce_loss

    e_max = event.pairs.shape[1] * 3 + 40 * WINDOW
    packs = [
        pack_events([event], 10, e_max=e_max, aug_pair_p=0.4,
                    aug_rng=np.random.default_rng(5), window_pairs=WINDOW,
                    cache=use)
        for use in (False, True)
    ]
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.normal(size=(packs[0]["x"].shape[1], 8)),
                      jnp.float32)
    vals = []
    for b in packs:
        assert "pair_rev" in b  # nothing truncated in either layout
        vals.append(float(infonce_loss(
            emb, jnp.asarray(b["pairs"][0]), jnp.asarray(b["pair_mask"][0]),
            jnp.asarray(b["cluster_ids"][0]), jnp.asarray(b["recons"][0]),
            jnp.asarray(b["pts"][0]), windowed_pairs=True,
            pair_rev=jnp.asarray(b["pair_rev"][0]),
            pair_weight=jnp.asarray(b["pair_weight"][0]),
            pair_neg=jnp.asarray(b["pair_neg"][0]),
        )))
    assert vals[0] == pytest.approx(vals[1], rel=1e-5)


def test_cached_falls_back_when_block_layout_overflows_e_max():
    """Sparse pair density: the separate aug block can overflow an e_max
    that the interleaved layout fits (review finding r4). The cached path
    must re-pack fully for that event instead of truncating (truncation
    silently drops real pairs and kills pair_rev/weight/neg for the whole
    batch)."""
    rng = np.random.default_rng(2)
    ev = synthetic_tracking_event(rng, n_points=4000, avg_track_size=6,
                                  pairs_per_point=1)
    # size e_max the way the trainer does: interleaved processed length
    # plus the raw-count aug headroom
    from hept_tpu.data.batching import processed_pair_len

    base_len = processed_pair_len(ev.pairs, ev.n, 128)
    e0 = base_len + 2 * int(base_len * 0.2 / 2)
    e_max = ((e0 + max(256, e0 // 16)) + 127) // 128 * 128
    r1, r2 = np.random.default_rng(9), np.random.default_rng(9)
    a = pack_events([ev], 10, e_max=e_max, aug_pair_p=0.2, aug_rng=r1,
                    window_pairs=128)
    c = pack_events([ev], 10, e_max=e_max, aug_pair_p=0.2, aug_rng=r2,
                    window_pairs=128, cache=True)
    # uncached fits -> cached must also keep the windowed extras
    assert "pair_rev" in a
    assert "pair_rev" in c
    sa = _real_sets(a)
    sc = _real_sets(c)
    np.testing.assert_array_equal(sa["keys"], sc["keys"])
