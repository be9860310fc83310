"""Golden-parity tests for the CMS+top-n kernel.

Every scenario is transcribed from the reference regression suite
(/root/reference/sql/*.sql vs expected/*.out); citations inline. No Spark —
these pin the kernel semantics alone (SURVEY.md §5.2(1))."""

import numpy as np
import pytest

from cms_topn_spark.core.base import SketchError, merge_serialized, sketch_from_bytes
from cms_topn_spark.core.cms_topn import CmsTopn, sizing


def build(mult, n, update="conservative", **kw):
    s = CmsTopn(n, update=update, **kw)
    vals = []
    for v, c in mult:
        vals += [v] * c
    s.add_batch(vals)
    return s


NUMBERS = [(0, 200), (1, 10), (2, 150), (3, 3), (4, 40000), (5, 6000)]  # sql/add_agg.sql:10-16
STRINGS = [("0", 2), ("1", 1), ("2", 15000), ("3", 20), ("4", 6), ("5", 70000)]  # :22-28


# ---------------- create (expected/create.out) ----------------

class TestCreate:
    def test_sizing(self):
        assert sizing(0.001, 0.99) == (5, 2719)  # expected/create.out:30
        assert sizing(0.01, 0.95) == (3, 272)  # expected/create.out:31
        assert sizing(0.01, 0.99) == (5, 272)  # expected/results.out:34-38
        assert sizing(0.1, 0.9) == (3, 28)  # expected/results.out:53-57

    @pytest.mark.parametrize(
        "args,msg",
        [
            ((0,), "Number of top items has to be positive"),  # create.out:6-8
            ((1, -0.1, 0.9), "Error bound has to be between 0 and 1"),  # :9-11
            ((-1, 0.1, 0.9), "Number of top items has to be positive"),  # :12-14
            ((3, 0.1, -0.5), "Confidence interval has to be between 0 and 1"),  # :15-17
            ((4, 0.02, 1.1), "Confidence interval has to be between 0 and 1"),  # :18-20
        ],
    )
    def test_param_errors(self, args, msg):
        with pytest.raises(SketchError, match=msg):
            CmsTopn(*args)

    def test_info_strings(self):  # expected/create.out:28-32, results.out:28-57
        assert CmsTopn(10).info() == "Sketch depth = 5, Sketch width = 2719, Size = 106kB"
        assert CmsTopn(5, 0.01, 0.95).info() == "Sketch depth = 3, Sketch width = 272, Size = 6kB"
        assert CmsTopn(2, 0.01, 0.99).info() == "Sketch depth = 5, Sketch width = 272, Size = 10kB"
        assert CmsTopn(2, 0.1, 0.9).info() == "Sketch depth = 3, Sketch width = 28, Size = 0kB"


# ---------------- add walkthrough (expected/add.out:44-133) ----------------

class TestAddWalkthrough:
    def test_type_stickiness(self):  # add.out:40-43
        s = CmsTopn(2).add("hello")
        with pytest.raises(SketchError, match="not proper type for this cms_topn"):
            s.add(3)

    def test_cidr_walkthrough(self):
        # reference uses cidr; semantics under test are top-n entry/eviction
        # at n=2, mapped to canonical-form strings (FIXTURES.md §3)
        s = CmsTopn(2)
        s.add("192.168.100.128/25").add(None)
        assert s.topn_list() == [("192.168.100.128/25", 1)]  # add.out:50-55
        for _ in range(3):
            s.add("192.168.0.0/24")
        assert s.topn_list() == [("192.168.0.0/24", 3), ("192.168.100.128/25", 1)]  # :60-65
        for _ in range(4):
            s.add("192.168.0.0/25")
        assert s.topn_list() == [("192.168.0.0/25", 4), ("192.168.0.0/24", 3)]  # :70-76
        for _ in range(5):
            s.add("192.168.1.0/24")
        assert s.topn_list() == [("192.168.1.0/24", 5), ("192.168.0.0/25", 4)]  # :81-88
        assert s.info() == "Sketch depth = 5, Sketch width = 2719, Size = 106kB"  # :89-93

    def test_inet_walkthrough(self):  # add.out:95-133
        s = CmsTopn(2)
        for _ in range(3):
            s.add("192.168.100.128/25")
        assert s.topn_list() == [("192.168.100.128/25", 3)]
        s.add("192.168.100.128/23")
        assert s.topn_list() == [("192.168.100.128/25", 3), ("192.168.100.128/23", 1)]
        s.add(None).add(None)
        assert s.topn_list() == [("192.168.100.128/25", 3), ("192.168.100.128/23", 1)]
        for _ in range(4):
            s.add("10.1.2.3")
        assert s.topn_list() == [("10.1.2.3", 4), ("192.168.100.128/25", 3)]


# ---------------- add_agg (expected/add_agg.out) ----------------

class TestAddAgg:
    @pytest.mark.parametrize("update", ["conservative", "linear"])
    def test_numbers_top3(self, update):  # add_agg.out:89-95
        s = build(NUMBERS, 3, update=update)
        assert s.topn_list() == [(4, 40000), (5, 6000), (0, 200)]

    @pytest.mark.parametrize("update", ["conservative", "linear"])
    def test_strings_top4(self, update):  # add_agg.out:148-164 (freq-1 '1' evicted)
        s = build(STRINGS, 4, update=update)
        assert s.topn_list() == [("5", 70000), ("2", 15000), ("3", 20), ("4", 6)]

    def test_nulls_skipped(self):  # NULL rows never appear (add_agg.out vs sql NULLs)
        s = CmsTopn(3)
        s.add_batch([0] * 3 + [None] * 5 + [1] * 2)
        assert s.total == 5
        assert s.topn_list() == [(0, 3), (1, 2)]

    def test_batch_equals_rowwise(self):
        a = build(NUMBERS, 3)
        b = CmsTopn(3)
        for v, c in NUMBERS:
            for _ in range(c):
                b.add(v)
        assert a.topn_list() == b.topn_list()
        assert np.array_equal(a.counters, b.counters)


# ---------------- frequency (expected/results.out) ----------------

class TestFrequency:
    def test_int_vector(self):  # results.out:90-136
        s = build(NUMBERS, 3)
        for v, exp in [(0, 200), (1, 10), (2, 150), (3, 3), (4, 40000), (5, 6000), (-1, 0)]:
            assert s.estimate(v) == exp
        assert s.estimate(None) is None

    def test_text_vector(self):  # results.out:138-186
        s = build(STRINGS, 2)
        for v, exp in [("0", 2), ("1", 1), ("2", 15000), ("3", 20), ("4", 6), ("5", 70000), ("6", 0)]:
            assert s.estimate(v) == exp
        assert s.estimate(None) is None

    def test_topn_empty_and_type_error(self):  # results.out:5-19
        assert CmsTopn(2).topn_list() == []
        s = CmsTopn(2).add(2)
        from cms_topn_spark.core import encoding as enc

        with pytest.raises(SketchError, match="not a proper cms_topn for the result type"):
            s.topn_list(type_tag=enc.TYPE_STRING)


# ---------------- union (expected/union.out) ----------------

class TestUnion:
    def test_null_identity(self):  # union.out:4-21
        assert merge_serialized(None, None) is None
        a = CmsTopn(1).add(4)
        m = sketch_from_bytes(merge_serialized(a.to_bytes(), None))
        assert m.topn_list() == [(4, 1)]
        b = CmsTopn(2).add("cms_topn")
        m = sketch_from_bytes(merge_serialized(None, b.to_bytes()))
        assert m.topn_list() == [("cms_topn", 1)]

    def test_empty_union(self):  # union.out:23-40
        assert CmsTopn(1).merge(CmsTopn(1)).topn_list() == []
        assert CmsTopn(3).merge(CmsTopn(3).add("cms_topn")).topn_list() == [("cms_topn", 1)]
        assert CmsTopn(2).add(4).merge(CmsTopn(2)).topn_list() == [(4, 1)]

    def test_param_mismatch(self):  # union.out:41-47
        for a, b in [
            (CmsTopn(2), CmsTopn(1)),
            (CmsTopn(1, 0.1, 0.9), CmsTopn(1, 0.1, 0.8)),
            (CmsTopn(1, 0.1, 0.99), CmsTopn(1, 0.01, 0.99)),
        ]:
            with pytest.raises(SketchError, match="cannot merge cms_topns with different parameters"):
                a.merge(b)

    def test_type_mismatch(self):  # union.out:48-49
        with pytest.raises(SketchError, match="cannot merge cms_topns of different types"):
            CmsTopn(2).add(2).merge(CmsTopn(2).add("2"))

    def test_normal_cases(self):  # union.out:51-88
        assert CmsTopn(1).add(2).merge(CmsTopn(1).add(3)).topn_list() == [(2, 1)]
        assert CmsTopn(1).add(2).merge(CmsTopn(1).add(2)).topn_list() == [(2, 2)]
        assert CmsTopn(2).add("two").merge(CmsTopn(2).add("three")).topn_list() == [
            ("two", 1),
            ("three", 1),
        ]
        assert CmsTopn(2).add("two").merge(CmsTopn(2).add("two")).topn_list() == [("two", 2)]
        assert CmsTopn(3).add("2").merge(CmsTopn(3).add("3")).topn_list() == [("2", 1), ("3", 1)]
        assert CmsTopn(3).add("2").merge(CmsTopn(3).add("2")).topn_list() == [("2", 2)]


# ---------------- union_agg (expected/union_agg.out) ----------------

class TestUnionAgg:
    def test_partials_remerge(self):  # union_agg.out:59-74: 7 partials → exact global top-3
        partials = []
        for k in range(6):
            p = CmsTopn(3, update="linear")
            p.add_batch([k] * dict(NUMBERS)[k])
            partials.append(p.to_bytes())
        partials.append(None)  # NULL row skipped
        acc = None
        for p in partials:
            acc = merge_serialized(acc, p)
        merged = sketch_from_bytes(acc)
        assert merged.topn_list() == [(4, 40000), (5, 6000), (0, 200)]
        for v, exp in [(0, 200), (1, 10), (2, 150), (3, 3), (4, 40000), (5, 6000), (-1, 0)]:
            assert merged.estimate(v) == exp

    def test_all_null_rows(self):  # union_agg.out:8-18
        acc = None
        for _ in range(3):
            acc = merge_serialized(acc, None)
        assert acc is None


# ---------------- serialization & merge algebra ----------------

class TestSerialization:
    def test_roundtrip_byte_exact(self):  # data/in_out_test analogue
        s = build(NUMBERS, 3)
        b = s.to_bytes()
        assert sketch_from_bytes(b).to_bytes() == b

    def test_merge_associative_byte_exact(self):  # north star: BASELINE.json:6
        rng = np.random.default_rng(7)
        parts = []
        for i in range(3):
            from cms_topn_spark.core import encoding as enc

            p = CmsTopn(5, 0.01, 0.99, update="linear")
            p.add_batch(rng.zipf(1.5, 2000).tolist(), type_tag=enc.TYPE_INT64)
            parts.append(p)
        ab_c = parts[0].merge(parts[1]).merge(parts[2]).to_bytes()
        a_bc = parts[0].merge(parts[1].merge(parts[2])).to_bytes()
        assert ab_c == a_bc

    def test_linear_partials_equal_single_pass(self):
        from cms_topn_spark.core import encoding as enc

        vals = np.random.default_rng(3).zipf(1.3, 5000).tolist()
        whole = CmsTopn(5, update="linear")
        whole.add_batch(vals, type_tag=enc.TYPE_INT64)
        acc = None
        for i in range(0, len(vals), 611):
            p = CmsTopn(5, update="linear")
            p.add_batch(vals[i : i + 611], type_tag=enc.TYPE_INT64)
            acc = merge_serialized(acc, p.to_bytes())
        merged = sketch_from_bytes(acc)
        assert np.array_equal(merged.counters, whole.counters)
        assert merged.topn_list() == whole.topn_list()


class TestErrorBound:
    @pytest.mark.parametrize("update", ["conservative", "linear"])
    def test_one_sided_bound(self, update):
        rng = np.random.default_rng(11)
        vals = rng.zipf(1.2, 20000)
        s = CmsTopn(10, 0.01, 0.99, update=update)
        s.add_batch(vals.tolist())
        uniq, counts = np.unique(vals, return_counts=True)
        n_total = len(vals)
        viol = 0
        for v, c in zip(uniq.tolist(), counts.tolist()):
            est = s.estimate(int(v))
            assert est >= c  # never underestimates
            if est > c + 0.01 * n_total:
                viol += 1
        assert viol / len(uniq) <= 0.01  # well within 1-confidence
