"""Kernel edge-case guards: typed-query rules, NaN/weight handling, merge
determinism under mixed configs, and the murmur outlier-batch path."""

import numpy as np
import pytest

from cms_topn_spark.core import (
    BloomFilter,
    CmsTopn,
    HyperLogLog,
    KllSketch,
    MinMaskSketch,
    SketchError,
    TDigest,
)


class TestTypedQueryRules:
    def test_bloom_contains_wide_int_is_false_not_crash(self):
        b = BloomFilter(100)
        b.add_batch([5, 7])  # binds int32
        assert b.contains(2**40) is False  # cannot fit ⇒ never added
        assert b.contains(5) is True
        with pytest.raises(SketchError):
            b.contains("5")  # cross-family query is a type error

    def test_bloom_small_int_probe_on_int64_filter(self):
        b = BloomFilter(100)
        b.add_batch([2**40, 5])  # binds int64 (wide value in batch)
        assert b.contains(5) is True  # int32-looking probe coerces to int64
        assert b.contains(2**40) is True

    def test_mms_get_mask_wide_int_is_zero_not_crash(self):
        m = MinMaskSketch(0.001)
        m.add(5, 3)  # binds int32
        assert m.get_mask(2**40) == 0
        assert m.get_mask(5) == 3
        with pytest.raises(SketchError):
            m.get_mask("x")

    def test_cms_single_add_coerces_like_batch(self):
        s = CmsTopn(5)
        s.add(2**40)  # binds int64
        s.add(5)  # must coerce to int64, not raise
        assert s.estimate(5) == 1
        assert s.estimate(2**40) == 1


class TestNanAndWeightHandling:
    def test_tdigest_nan_in_list_dropped(self):
        t = TDigest()
        t.add_batch([1.0, float("nan"), 2.0, None])
        assert t.n == 2
        assert not np.isnan(t.quantile(0.5))
        u = TDigest()
        u.add_batch(np.array([1.0, np.nan, 2.0]))
        assert t.to_bytes() == u.to_bytes()  # container type is irrelevant

    def test_tdigest_weighted_adds(self):
        t = TDigest(delta=1e6)  # exact regime
        t.add_batch([1.0, 100.0], counts=[99, 1])
        assert t.n == 100
        assert t.quantile(0.5) == pytest.approx(1.0, abs=1e-9)
        with pytest.raises(SketchError):
            TDigest().add_batch([1.0], counts=[-1])
        with pytest.raises(SketchError):
            TDigest().add_batch([1.0, 2.0], counts=[1])

    def test_kll_nan_in_list_dropped_and_counts_rejected(self):
        k = KllSketch()
        k.add_batch([1.0, float("nan"), 2.0])
        assert k.n == 2
        assert not np.isnan(k.quantile(0.99))
        with pytest.raises(SketchError):
            KllSketch().add_batch([1.0, 100.0], counts=[99, 1])

    def test_cms_negative_counts_rejected(self):
        s = CmsTopn(3)
        with pytest.raises(SketchError):
            s.add_batch(["a"], counts=[-1])
        assert s.total == 0  # nothing was folded before the raise


class TestMergeDeterminism:
    def test_hll_mixed_sparse_limit_merge_commutes(self):
        a = HyperLogLog(14, sparse_limit=2)
        a.add_batch([1, 2])
        b = HyperLogLog(14, sparse_limit=1000)
        b.add_batch([3, 4, 5])
        ab, ba = a.merge(b), b.merge(a)
        assert ab.mode == ba.mode
        assert ab.to_bytes() == ba.to_bytes()
        assert ab.estimate() == ba.estimate()

    def test_cms_mixed_update_mode_merge_refused(self):
        c1 = CmsTopn(5, update="conservative")
        c2 = CmsTopn(5, update="linear")
        with pytest.raises(SketchError):
            c1.merge(c2)


class TestMurmurOutlierBatch:
    def test_outlier_batch_bit_parity_without_blowup(self):
        from cms_topn_spark.core.murmur import hash128, hash128_one

        rng = np.random.default_rng(3)
        items = [bytes(rng.integers(0, 256, int(l), dtype=np.uint8)) for l in rng.integers(0, 40, 2000)]
        items[777] = bytes(rng.integers(0, 256, 200_000, dtype=np.uint8))
        data = b"".join(items)
        lens = np.array([len(x) for x in items], dtype=np.int64)
        offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
        h1, h2 = hash128(data, offs, lens)
        for i in (0, 777, 1999, 17):
            assert (int(h1[i]), int(h2[i])) == hash128_one(items[i])


class TestEstimateBatchAndOverflow:
    def test_estimate_many_matches_estimate(self):
        sk = CmsTopn(5, 0.001, 0.99, update="linear")
        for w, c in (("a", 3), ("b", 7), ("c", 1)):
            sk.add_batch([w], counts=[c])
        probes = ["a", "b", "c", "missing", None]
        assert sk.estimate_many(probes) == [sk.estimate(p) for p in probes]

    def test_estimate_many_int_coercion_rules(self):
        sk = CmsTopn(5, update="linear")
        sk.add_batch([np.int32(7).item()], counts=[2])  # binds int32
        # int64 too wide for an int32-bound sketch ⇒ 0, not a crash
        got = sk.estimate_many([7, 2**40, None])
        assert got[0] == 2 and got[1] == 0 and got[2] is None
        with pytest.raises(SketchError):
            sk.estimate_many(["a string"])

    def test_linear_huge_counts_stay_exact(self):
        # a per-batch count sum beyond 2^53 would silently round through the
        # bincount float64 weights; the guard must route to the exact path
        # and keep the one-sided f-hat >= f guarantee
        sk = CmsTopn(5, 0.01, 0.99, update="linear")
        big = (1 << 53) + 3
        sk.add_batch(["x"], counts=[big])
        sk.add_batch(["x"], counts=[5])
        assert sk.estimate("x") == big + 5
        assert sk.total == big + 5
