"""Unit tests for hept_tpu.core: hashing, regions, buckets, padding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hept_tpu.core import (
    bit_shift,
    ceil_to_multiple,
    e2lsh_init,
    get_regions,
    invert_permutation,
    lsh_mapping,
    quantile_partition,
    region_codes,
    replication_pad_plan,
    sort_to_buckets,
    unsort_from_buckets,
)
from hept_tpu.core.regions import geo_code


pytestmark = pytest.mark.quick

class TestInvertPermutation:
    def test_roundtrip_1d(self):
        key = jax.random.PRNGKey(0)
        perm = jax.random.permutation(key, 97)
        inv = invert_permutation(perm)
        np.testing.assert_array_equal(np.asarray(perm)[np.asarray(inv)], np.arange(97))

    def test_roundtrip_3d(self):
        key = jax.random.PRNGKey(1)
        perms = jnp.stack(
            [
                jnp.stack([jax.random.permutation(k2, 64) for k2 in jax.random.split(k, 5)])
                for k in jax.random.split(key, 3)
            ]
        )
        inv = invert_permutation(perms)
        gathered = jnp.take_along_axis(perms, inv, axis=-1)
        np.testing.assert_array_equal(
            np.asarray(gathered), np.broadcast_to(np.arange(64), (3, 5, 64))
        )


class TestQuantilePartition:
    def test_region_ids_by_rank(self):
        # 10 points with known coordinate order; 2.5 regions -> size ceil(10/2.5)=4
        coords = jnp.asarray([5.0, 1.0, 9.0, 3.0, 7.0, 0.0, 8.0, 2.0, 6.0, 4.0])
        sorted_idx = jnp.argsort(coords)
        regions = quantile_partition(sorted_idx, jnp.asarray([[2.5]]))
        ranks = np.argsort(np.argsort(np.asarray(coords)))
        expected = ranks // 4 + 1
        np.testing.assert_array_equal(np.asarray(regions[0]), expected)

    def test_multiple_rows(self):
        n = 30
        sorted_idx = jax.random.permutation(jax.random.PRNGKey(2), n)
        nr = jnp.asarray([[3.0], [5.0], [7.5]])
        regions = quantile_partition(sorted_idx, nr)
        assert regions.shape == (3, n)
        # row r: max region id == ceil over its region size
        for r, c in enumerate([3.0, 5.0, 7.5]):
            size = np.ceil(n / c)
            expected_max = (n - 1) // size + 1
            assert regions[r].max() == expected_max
            assert regions[r].min() == 1


class TestGetRegions:
    def test_shape_and_product(self):
        r = get_regions(jax.random.PRNGKey(0), num_regions=150, n_hashes=3, num_heads=8)
        assert r.shape == (3, 2, 8)
        # product of AND-dims approximately num_regions (before rounding ±)
        prod = np.asarray(jnp.prod(r, axis=1))
        np.testing.assert_allclose(prod, 150.0, rtol=0.15)
        # rounded to thirds
        np.testing.assert_allclose(np.asarray(r) * 3, np.round(np.asarray(r) * 3), atol=1e-5)


class TestBitShift:
    def test_packs_disjoint_bits(self):
        base = jnp.asarray([[3, 1, 0, 2]])
        shifted = bit_shift(base, jnp.asarray([[1, 0, 2, 3]]))
        # max_base=3 -> 2 bits
        np.testing.assert_array_equal(np.asarray(shifted[0]), [1 * 4 + 3, 1, 2 * 4, 3 * 4 + 2])

    def test_order_preserving(self):
        # combined order: primary = shift_idx, secondary = base
        key = jax.random.PRNGKey(3)
        base = jax.random.randint(key, (1, 100), 0, 37)
        hi = jax.random.randint(jax.random.PRNGKey(4), (1, 100), 0, 5)
        packed = np.asarray(bit_shift(base, hi))[0]
        order = np.lexsort((np.asarray(base)[0], np.asarray(hi)[0]))
        np.testing.assert_array_equal(np.argsort(packed, kind="stable"), order)


class TestSortUnsort:
    def test_roundtrip(self):
        c, h, n, d, bs = 3, 2, 40, 5, 8
        key = jax.random.PRNGKey(5)
        x = jax.random.normal(key, (h, n, d))
        keys = jax.random.normal(jax.random.PRNGKey(6), (c, h, n))
        perm = jnp.argsort(keys, axis=-1)
        buckets = sort_to_buckets(x, perm, bs)
        assert buckets.shape == (c, h, n // bs, bs, d)
        back = unsort_from_buckets(buckets, invert_permutation(perm))
        np.testing.assert_allclose(
            np.asarray(back), np.broadcast_to(np.asarray(x), (c, h, n, d)), rtol=1e-6
        )


class TestLshMapping:
    def test_shapes_and_shift(self):
        h, n, d, c = 4, 32, 10, 3
        alpha = e2lsh_init(jax.random.PRNGKey(0), h, d, c)
        q = jax.random.normal(jax.random.PRNGKey(1), (h, n, d))
        k = jax.random.normal(jax.random.PRNGKey(2), (h, n, d))
        qh, kh, shift = lsh_mapping(alpha, q, k)
        assert qh.shape == (c, h, n) and kh.shape == (c, h, n)
        assert shift.shape == (c, h, 1)
        lo = jnp.minimum(qh.min(-1), kh.min(-1))
        hi = jnp.maximum(qh.max(-1), kh.max(-1))
        np.testing.assert_allclose(np.asarray(shift[..., 0]), np.asarray(hi - lo), rtol=1e-6)
        # projections match plain matmul
        np.testing.assert_allclose(
            np.asarray(qh), np.einsum("hnd,hdc->chn", np.asarray(q), np.asarray(alpha)),
            rtol=1e-5, atol=1e-5,
        )


class TestRegionCodes:
    def test_geo_code_separates_regions(self):
        n, heads, hashes = 60, 2, 3
        coords = jax.random.normal(jax.random.PRNGKey(7), (n, 2))
        regions = get_regions(jax.random.PRNGKey(8), 25, hashes, heads)
        re, rp = region_codes(coords, regions)
        assert re.shape == (hashes * heads, n)
        code = geo_code(re, rp, regions)
        assert code.shape == (hashes, heads, n)
        # code is a bijection of (eta, phi) region pairs: same code <=> same pair
        re0 = np.asarray(re)[0]
        rp0 = np.asarray(rp)[0]
        c0 = np.asarray(code)[0, 0]
        pair = re0 + 1000 * rp0
        for p in np.unique(pair):
            sel = pair == p
            assert len(np.unique(c0[sel])) == 1
        assert len(np.unique(c0)) == len(np.unique(pair))

    def test_invalid_sort_last(self):
        n = 16
        coords = jnp.stack([jnp.arange(n, dtype=jnp.float32)] * 2, axis=1)
        regions = get_regions(jax.random.PRNGKey(0), 4, 1, 1)
        valid = jnp.arange(n) < 12
        re, _ = region_codes(coords, regions, valid_mask=valid)
        # pad points take the highest region id
        assert np.asarray(re)[0, 12:].min() >= np.asarray(re)[0, :12].max()


class TestReplicationPadPlan:
    def test_exact_multiple_no_replicas(self):
        n_total, bs = 32, 8
        sorted_idx = jnp.arange(n_total)
        gather, valid, inert = replication_pad_plan(jnp.asarray(16), n_total, bs, sorted_idx)
        np.testing.assert_array_equal(np.asarray(valid), np.arange(n_total) < 16)
        np.testing.assert_array_equal(np.asarray(inert), np.arange(n_total) >= 16)
        np.testing.assert_array_equal(np.asarray(gather[:16]), np.arange(16))

    def test_replicates_last_block_rows(self):
        n_total, bs = 32, 8
        n = 13  # padded_n = 16, pad_count = 3
        code = jnp.concatenate([jnp.arange(n, 0, -1.0), jnp.full((n_total - n,), 1e9)])
        sorted_idx = jnp.argsort(code)
        gather, valid, inert = replication_pad_plan(jnp.asarray(n), n_total, bs, sorted_idx)
        # ranks n-bs..n-bs+2 = ranks 5,6,7 of descending code -> points n-1-rank
        expected_fill = [np.asarray(sorted_idx)[5 + j] for j in range(3)]
        np.testing.assert_array_equal(np.asarray(gather[13:16]), expected_fill)
        assert not np.asarray(valid)[13:].any()
        np.testing.assert_array_equal(np.asarray(inert), np.arange(n_total) >= 16)
        # inert region is whole buckets
        assert (n_total - 16) % bs == 0


def test_ceil_to_multiple():
    assert ceil_to_multiple(0, 8) == 0
    assert ceil_to_multiple(1, 8) == 8
    assert ceil_to_multiple(8, 8) == 8
    assert ceil_to_multiple(9, 8) == 16


class TestPackedSortCarry:
    """bf16-packed sort payloads: same permutation, bf16-rounded values."""

    def test_pack_matches_f32_within_bf16_tolerance(self):
        import numpy as np

        from hept_tpu.core.buckets import sort_carry, unsort_carry

        rng = np.random.default_rng(3)
        c, h, n, d = 2, 3, 64, 7
        keys = jnp.asarray(rng.normal(size=(c, h, n)).astype(np.float32))
        payload = jnp.asarray(rng.normal(size=(c, h, n, d)).astype(np.float32))

        out_f32, src_f32 = sort_carry(keys, payload)
        out_bf, src_bf = sort_carry(keys, payload, pack=True)
        np.testing.assert_array_equal(np.asarray(src_f32), np.asarray(src_bf))
        np.testing.assert_allclose(
            np.asarray(out_bf), np.asarray(out_f32), rtol=1e-2, atol=1e-2
        )

        # unsort roundtrip in packed mode recovers the payload (bf16-rounded)
        back = unsort_carry(src_bf, out_bf, pack=True)
        np.testing.assert_allclose(
            np.asarray(back), np.asarray(payload), rtol=1e-2, atol=1e-2
        )

    def test_pack_odd_width_and_grads(self):
        import numpy as np

        from hept_tpu.core.buckets import sort_carry

        rng = np.random.default_rng(4)
        c, h, n, d = 2, 2, 32, 5  # odd d exercises the zero-pad column
        keys = jnp.asarray(rng.normal(size=(c, h, n)).astype(np.float32))
        payload = jnp.asarray(rng.normal(size=(h, n, d)).astype(np.float32))

        def loss(p):
            out, _ = sort_carry(keys, p, pack=True)
            return jnp.sum(out**2)

        g = jax.grad(loss)(payload)
        assert g.shape == payload.shape
        # each row is duplicated across c hashes -> grad = 2*c*payload (bf16-rounded)
        np.testing.assert_allclose(
            np.asarray(g), 2 * c * np.asarray(payload), rtol=3e-2, atol=3e-2
        )


def test_grouped_sort_fp8_pack():
    """fp8 pack mode: numerator columns transported as exact e4m3 roundings,
    the last (denominator) column as bf16; permutation identical to f32."""
    import numpy as np

    from hept_tpu.core.buckets import grouped_sort_carry

    rng = np.random.default_rng(5)
    c, h, d, n = 2, 3, 25, 128
    keys = jnp.asarray(rng.random((c, h, n), dtype=np.float32))
    od = jnp.asarray(np.abs(rng.standard_normal((c, h, d, n))).astype(np.float32))

    (s_f32,), (src_f32,) = grouped_sort_carry([keys], [od], pack=False)
    (s_fp8,), (src_fp8,) = grouped_sort_carry([keys], [od], pack="fp8")
    np.testing.assert_array_equal(np.asarray(src_f32), np.asarray(src_fp8))
    # numerators: exactly the e4m3 rounding of the f32-sorted values
    ref_num = np.asarray(s_f32[:, :, :-1]).astype(jnp.float8_e4m3fn).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(s_fp8[:, :, :-1]), ref_num)
    # denominator: bf16 rounding
    np.testing.assert_allclose(
        np.asarray(s_fp8[:, :, -1]), np.asarray(s_f32[:, :, -1]),
        rtol=1e-2, atol=1e-3,
    )
    # VJP transports gradients (fp8-rounded) with the right permutation
    g = jax.grad(
        lambda o: grouped_sort_carry([keys], [o], pack="fp8")[0][0].sum()
    )(od)
    np.testing.assert_allclose(np.asarray(g), 1.0, rtol=0, atol=0)


def test_grouped_sort_n_ops_equivalence():
    """Chunked-operand sorts must produce identical results to 1-op sorts."""
    import numpy as np

    from hept_tpu.core.buckets import grouped_sort_carry

    rng = np.random.default_rng(5)
    c, h, n = 2, 3, 64
    k1 = jnp.asarray(rng.normal(size=(c, h, n)).astype(np.float32))
    k2 = jnp.asarray(rng.normal(size=(c, h, n)).astype(np.float32))
    p1 = jnp.asarray(rng.normal(size=(c, h, 7, n)).astype(np.float32))
    p2 = jnp.asarray(rng.normal(size=(h, 5, n)).astype(np.float32))

    (a1, a2), (s1, s2) = grouped_sort_carry([k1, k2], [p1, p2])
    (b1, b2), (t1, t2) = grouped_sort_carry([k1, k2], [p1, p2], n_ops=4)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(t1))
    np.testing.assert_array_equal(np.asarray(s2), np.asarray(t2))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(b1))
    np.testing.assert_array_equal(np.asarray(a2), np.asarray(b2))

    # grads through the chunked variant
    def loss(p1, p2):
        (o1, o2), _ = grouped_sort_carry([k1, k2], [p1, p2], n_ops=4)
        return jnp.sum(o1**2) + jnp.sum(o2**2)

    def loss1(p1, p2):
        (o1, o2), _ = grouped_sort_carry([k1, k2], [p1, p2])
        return jnp.sum(o1**2) + jnp.sum(o2**2)

    g4 = jax.grad(loss, argnums=(0, 1))(p1, p2)
    g1 = jax.grad(loss1, argnums=(0, 1))(p1, p2)
    for a, b in zip(g1, g4):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_grouped_sort_wide_payload_chunking():
    """Payloads wider than _MAX_SORT_OPS split across several lax.sort calls
    (the VMEM guard for the f32 reference-parity sorts) — results must match
    a plain argsort application exactly, forward and backward."""
    import numpy as np

    from hept_tpu.core.buckets import _MAX_SORT_OPS, grouped_sort_carry

    rng = np.random.default_rng(9)
    c, h, n, d = 2, 2, 96, _MAX_SORT_OPS + 7  # u32 rows = d + iota > chunk
    keys = jnp.asarray(rng.normal(size=(c, h, n)).astype(np.float32))
    payload = jnp.asarray(rng.normal(size=(c, h, d, n)).astype(np.float32))

    (out,), (src,) = grouped_sort_carry([keys], [payload], pack=False)
    order = np.argsort(np.asarray(keys), axis=-1)
    np.testing.assert_array_equal(np.asarray(src), order)
    want = np.take_along_axis(np.asarray(payload), order[:, :, None, :], axis=3)
    np.testing.assert_array_equal(np.asarray(out), want)

    w = jnp.asarray(rng.normal(size=payload.shape).astype(np.float32))
    g = jax.grad(
        lambda p: (w * grouped_sort_carry([keys], [p], pack=False)[0][0]).sum()
    )(payload)
    inv = np.argsort(order, axis=-1)
    want_g = np.take_along_axis(np.asarray(w), inv[:, :, None, :], axis=3)
    np.testing.assert_array_equal(np.asarray(g), want_g)
