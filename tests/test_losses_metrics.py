"""Losses + metrics unit tests."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from hept_tpu.train import (
    acc_and_pr_at_k,
    binary_classification_metrics,
    focal_loss,
    infonce_loss,
)


pytestmark = pytest.mark.quick

def _toy_pairs():
    # 8 points, clusters: [1,1,1,2,2,0,0,0]; all recon, pt 1.0
    n = 8
    cid = jnp.asarray([1, 1, 1, 2, 2, 0, 0, 0], jnp.int32)
    recons = jnp.ones(n)
    pts = jnp.ones(n) * 2.0
    pairs = jnp.asarray(
        [[0, 0, 1, 3, 0, 5, 2], [1, 2, 2, 4, 3, 6, 7]], jnp.int32
    )
    mask = jnp.ones(pairs.shape[1], bool)
    return n, cid, recons, pts, pairs, mask


class TestInfoNCE:
    def test_finite_and_positive(self):
        n, cid, recons, pts, pairs, mask = _toy_pairs()
        emb = jax.random.normal(jax.random.PRNGKey(0), (n, 4))
        loss = infonce_loss(emb, pairs, mask, cid, recons, pts)
        assert np.isfinite(float(loss)) and float(loss) > 0

    def test_pad_pairs_no_effect(self):
        n, cid, recons, pts, pairs, mask = _toy_pairs()
        emb = jax.random.normal(jax.random.PRNGKey(1), (n, 4))
        base = infonce_loss(emb, pairs, mask, cid, recons, pts)
        pad_pairs = jnp.concatenate(
            [pairs, jnp.zeros((2, 5), jnp.int32)], axis=1
        )
        pad_mask = jnp.concatenate([mask, jnp.zeros(5, bool)])
        padded = infonce_loss(emb, pad_pairs, pad_mask, cid, recons, pts)
        np.testing.assert_allclose(float(base), float(padded), rtol=1e-6)

    def test_perfect_embedding_lower_loss(self):
        n, cid, recons, pts, pairs, mask = _toy_pairs()
        bad = jax.random.normal(jax.random.PRNGKey(2), (n, 4))
        good = jnp.asarray(cid, jnp.float32)[:, None] * jnp.ones((n, 4)) * 5.0
        l_bad = infonce_loss(bad, pairs, mask, cid, recons, pts)
        l_good = infonce_loss(good, pairs, mask, cid, recons, pts)
        assert float(l_good) < float(l_bad)

    def test_low_pt_pairs_excluded_from_positives(self):
        n, cid, recons, pts, pairs, mask = _toy_pairs()
        emb = jax.random.normal(jax.random.PRNGKey(3), (n, 4))
        low_pts = jnp.ones(n) * 0.1  # below 0.9 threshold: no positives
        loss = infonce_loss(emb, pairs, mask, cid, recons, low_pts)
        assert float(loss) == 0.0

    def test_grad_finite(self):
        n, cid, recons, pts, pairs, mask = _toy_pairs()
        emb = jax.random.normal(jax.random.PRNGKey(4), (n, 4))
        g = jax.grad(lambda e: infonce_loss(e, pairs, mask, cid, recons, pts))(emb)
        assert np.isfinite(np.asarray(g)).all()


class TestFocal:
    def test_matches_manual(self):
        p = jnp.asarray([0.9, 0.2, 0.7])
        t = jnp.asarray([1.0, 0.0, 1.0])
        got = float(focal_loss(p, t))
        bce = -(t * np.log(np.asarray(p)) + (1 - t) * np.log(1 - np.asarray(p)))
        pt = np.exp(-bce)
        expected = (0.25 * (1 - pt) ** 2 * bce).mean()
        np.testing.assert_allclose(got, expected, rtol=1e-5)

    def test_mask(self):
        p = jnp.asarray([0.9, 0.5, 0.7])
        t = jnp.asarray([1.0, 1.0, 1.0])
        m = jnp.asarray([True, False, True])
        got = float(focal_loss(p, t, m))
        full = float(focal_loss(p[jnp.asarray([0, 2])], t[jnp.asarray([0, 2])]))
        np.testing.assert_allclose(got, full, rtol=1e-6)


class TestRetrievalMetrics:
    def test_perfect_embedding_perfect_scores(self):
        # clusters of size 3, far apart in embedding space
        n_clusters, size = 5, 3
        n = n_clusters * size
        cid = jnp.repeat(jnp.arange(1, n_clusters + 1), size)
        emb = jnp.repeat(
            jnp.arange(n_clusters, dtype=jnp.float32)[:, None] * 100.0, size, axis=0
        )
        emb = emb + jax.random.normal(jax.random.PRNGKey(0), (n, 1)) * 0.01
        emb = jnp.concatenate([emb, jnp.zeros((n, 3))], axis=1)
        mask = jnp.ones(n, bool)
        acc, prec, recall = acc_and_pr_at_k(emb, cid, mask, k=19, tile=8)
        assert acc == 1.0
        assert recall == 1.0
        np.testing.assert_allclose(prec, (size - 1) / 19.0, rtol=1e-6)

    def test_padding_invariance(self):
        n = 12
        cid = jnp.asarray([1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4, 4], jnp.int32)
        emb = jax.random.normal(jax.random.PRNGKey(1), (n, 4))
        mask = jnp.ones(n, bool)
        base = acc_and_pr_at_k(emb, cid, mask, k=19, tile=4)
        emb_p = jnp.concatenate([emb, jnp.zeros((4, 4))])
        cid_p = jnp.concatenate([cid, jnp.zeros(4, jnp.int32)])
        mask_p = jnp.concatenate([mask, jnp.zeros(4, bool)])
        valid_p = jnp.concatenate([jnp.ones(n, bool), jnp.zeros(4, bool)])
        padded = acc_and_pr_at_k(emb_p, cid_p, mask_p, valid=valid_p, k=19, tile=4)
        np.testing.assert_allclose(base, padded, rtol=1e-6)


class TestBinaryMetrics:
    def test_known_values(self):
        t = np.asarray([1, 0, 1, 0, 1])
        p = np.asarray([0.9, 0.1, 0.8, 0.4, 0.3])
        m = binary_classification_metrics(p, t)
        assert 0.5 < m["auc"] <= 1.0
        assert 0.5 < m["roc"] <= 1.0
        assert 0 < m["f1"] <= 1.0


def test_tracking_metrics_batch_matches_per_event():
    """The batched one-call metric must reproduce per-event acc_and_pr_at_k."""
    import numpy as np

    from hept_tpu.train.metrics import (
        acc_and_pr_at_k,
        point_filter,
        tracking_metrics_batch,
    )

    rng = np.random.default_rng(7)
    B, N, D = 2, 96, 6
    emb = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32))
    cid = jnp.asarray(rng.integers(0, 12, size=(B, N)).astype(np.int32))
    rec = jnp.asarray(rng.integers(0, 2, size=(B, N)).astype(np.int32))
    pts = jnp.asarray(rng.random((B, N)).astype(np.float32) * 2)
    valid = jnp.asarray(rng.random((B, N)) > 0.1)

    tm = np.asarray(tracking_metrics_batch(emb, cid, rec, pts, valid))
    for bi in range(B):
        for ti, thres in enumerate((0.0, 0.5, 0.9)):
            mask = point_filter(cid[bi], rec[bi], pts[bi], thres) & valid[bi]
            a, p, r = acc_and_pr_at_k(emb[bi], cid[bi], mask, valid=valid[bi])
            np.testing.assert_allclose(tm[bi, ti], [a, p, r], rtol=1e-5, atol=1e-6)


def test_pack_sorts_pairs_and_loss_is_order_invariant():
    """pack_events anchor-sorts pairs (pads at n-1) so the loss's segment
    reductions run on sorted ids; the loss itself is pair-order invariant."""
    import jax.numpy as jnp

    from hept_tpu.data.batching import pack_events
    from hept_tpu.data.synthetic import synthetic_tracking_event
    from hept_tpu.train.losses import infonce_loss

    rng = np.random.default_rng(0)
    ev = synthetic_tracking_event(rng, n_points=96)
    b = pack_events([ev], block_size=16, e_max=ev.pairs.shape[1] + 64)
    p0 = b["pairs"][0][0]
    assert (np.diff(p0) >= 0).all(), "pairs must be anchor-sorted incl. pads"
    n = b["x"].shape[1]
    assert (b["pairs"][0][:, ~b["pair_mask"][0]] == n - 1).all()

    emb = jnp.asarray(rng.standard_normal((n, 8)), jnp.float32)
    args = (jnp.asarray(b["cluster_ids"][0]), jnp.asarray(b["recons"][0]),
            jnp.asarray(b["pts"][0]))
    l_sorted = float(infonce_loss(emb, jnp.asarray(b["pairs"][0]),
                                  jnp.asarray(b["pair_mask"][0]), *args))
    perm = rng.permutation(b["pairs"].shape[2])
    l_shuf = float(infonce_loss(emb, jnp.asarray(b["pairs"][0][:, perm]),
                                jnp.asarray(b["pair_mask"][0][perm]), *args))
    np.testing.assert_allclose(l_sorted, l_shuf, rtol=1e-5)


def test_pair_augmentation():
    """aug_pair_p appends int(E*p/2) random pairs both ways (reference
    process_data), still anchor-sorted."""
    from hept_tpu.data.batching import pack_events
    from hept_tpu.data.synthetic import synthetic_tracking_event

    rng = np.random.default_rng(0)
    ev = synthetic_tracking_event(rng, n_points=96)
    e0 = ev.pairs.shape[1]
    n_aug = 2 * int(e0 * 0.2 / 2)
    b = pack_events([ev], block_size=16, e_max=e0 + n_aug,
                    aug_pair_p=0.2, aug_rng=np.random.default_rng(1))
    assert int(b["pair_mask"][0].sum()) == e0 + n_aug
    assert (np.diff(b["pairs"][0][0]) >= 0).all()
    # augmented pairs land inside the event's real rows
    assert b["pairs"][0].max() < 96


class TestPackTimePairExtras:
    """pair_rev + pair_weight (windowed-loss pack-time extras)."""

    def _packed(self, n=96, seed=0):
        from hept_tpu.data.batching import pack_events
        from hept_tpu.data.synthetic import synthetic_tracking_event

        rng = np.random.default_rng(seed)
        ev = synthetic_tracking_event(rng, n_points=n)
        b = pack_events([ev], block_size=16, window_pairs=16)
        return b, rng

    def test_rev_is_the_reverse_pair(self):
        b, _ = self._packed()
        assert "pair_rev" in b and "pair_weight" in b
        pairs, mask, rev = b["pairs"][0], b["pair_mask"][0], b["pair_rev"][0]
        real = np.flatnonzero(mask)
        # rev maps real pairs to real reverse pairs, and is an involution
        assert mask[rev[real]].all()
        np.testing.assert_array_equal(pairs[0, rev[real]], pairs[1, real])
        np.testing.assert_array_equal(pairs[1, rev[real]], pairs[0, real])
        np.testing.assert_array_equal(rev[rev[real]], real)

    def test_partner_scatter_identity(self):
        """scatter_by_p1(g) == scatter_by_p0(g[rev]) — the backward rewrite
        partner_gather relies on (ops/pair_ops.py)."""
        b, rng = self._packed()
        pairs, mask, rev = b["pairs"][0], b["pair_mask"][0], b["pair_rev"][0]
        n = b["x"].shape[1]
        g = rng.standard_normal((pairs.shape[1], 4)).astype(np.float32)
        g[~mask] = 0.0  # pad cotangents are zero in the real loss
        direct = np.zeros((n, 4), np.float32)
        np.add.at(direct, pairs[1][mask], g[mask])
        g_rev = np.where(mask[:, None], g[rev], 0.0)
        rewritten = np.zeros((n, 4), np.float32)
        np.add.at(rewritten, pairs[0][mask], g_rev[mask])
        np.testing.assert_allclose(direct, rewritten, rtol=1e-6, atol=1e-6)

    def test_weighted_loss_matches_instep_cluster_math(self):
        """With pack-time extras, value AND gradient match the in-step
        cluster mean-of-means path (CPU fallback exercises the weight math;
        the symmetrized pair set is used for both sides)."""
        b, rng = self._packed()
        n = b["x"].shape[1]
        emb = jnp.asarray(rng.standard_normal((n, 8)), jnp.float32)
        base_args = (jnp.asarray(b["pairs"][0]), jnp.asarray(b["pair_mask"][0]),
                     jnp.asarray(b["cluster_ids"][0]), jnp.asarray(b["recons"][0]),
                     jnp.asarray(b["pts"][0]))

        def plain(e):
            return infonce_loss(e, *base_args)

        def fast(e):
            return infonce_loss(
                e, *base_args, windowed_pairs=True,
                pair_rev=jnp.asarray(b["pair_rev"][0]),
                pair_weight=jnp.asarray(b["pair_weight"][0]),
            )

        l0, g0 = jax.value_and_grad(plain)(emb)
        l1, g1 = jax.value_and_grad(fast)(emb)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(g0), np.asarray(g1),
                                   rtol=1e-4, atol=1e-6)

    def test_truncation_drops_extras(self):
        from hept_tpu.data.batching import pack_events
        from hept_tpu.data.synthetic import synthetic_tracking_event

        rng = np.random.default_rng(0)
        ev = synthetic_tracking_event(rng, n_points=96)
        b = pack_events([ev], block_size=16, window_pairs=16, e_max=32)
        assert "pair_rev" not in b and "pair_weight" not in b

    def test_pair_l2rbf_sim_grad_matches_autodiff(self):
        """The symmetry-folded backward of pair_l2rbf_sim equals plain
        autodiff of the same formula."""
        from hept_tpu.ops.pair_ops import pair_l2rbf_sim

        b, rng = self._packed()
        pairs, mask, rev = (jnp.asarray(b["pairs"][0]),
                            jnp.asarray(b["pair_mask"][0]),
                            jnp.asarray(b["pair_rev"][0]))
        n = b["x"].shape[1]
        emb = jnp.asarray(rng.standard_normal((n, 6)), jnp.float32)
        w = jnp.asarray(rng.standard_normal(pairs.shape[1]), jnp.float32)
        w = jnp.where(mask, w, 0.0)  # pad cotangents are zero in the loss

        def fused(e):
            return jnp.sum(pair_l2rbf_sim(e, pairs[0], pairs[1], rev, mask) * w)

        def plain(e):
            d = jnp.sqrt(jnp.sum((e[pairs[0]] - e[pairs[1]]) ** 2, -1) + 1e-12)
            return jnp.sum(jnp.exp(-d / (2 * 0.75**2)) * w)

        l0, g0 = jax.value_and_grad(plain)(emb)
        l1, g1 = jax.value_and_grad(fused)(emb)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(g0), np.asarray(g1),
                                   rtol=1e-4, atol=1e-6)
