"""Composite state protocol + distributed union_agg mismatch errors
(expected/union_agg.out:43-58 through the real Spark merge path)."""

import numpy as np
import pytest

from cms_topn_spark.core import CmsTopn, HyperLogLog, SketchError, sketch_from_bytes
from cms_topn_spark.core import encoding as enc
from cms_topn_spark.core.composite import CompositeSketch


class TestComposite:
    def _make(self, vals):
        c = CompositeSketch(
            {
                "topn": CmsTopn(3, 0.01, 0.99, update="linear"),
                "distinct": HyperLogLog(p=10),
            }
        )
        c["topn"].add_batch(vals, type_tag=enc.TYPE_INT64)
        c["distinct"].add_batch(vals, type_tag=enc.TYPE_INT64)
        return c

    def test_roundtrip_and_merge(self):
        a = self._make([1, 1, 2, 3])
        b = self._make([2, 4, 4, 4])
        m = a.merge(b)
        assert m["topn"].estimate(1) == 2
        assert m["topn"].estimate(4) == 3
        assert m["distinct"].estimate() == 4
        by = m.to_bytes()
        back = sketch_from_bytes(by)
        assert isinstance(back, CompositeSketch)
        assert back.to_bytes() == by
        assert back["distinct"].estimate() == 4

    def test_merge_is_per_child_and_associative(self):
        parts = [self._make([i, i + 1]) for i in range(4)]
        left = parts[0]
        for p in parts[1:]:
            left = left.merge(p)
        right = parts[3]
        for p in reversed(parts[:3]):
            right = p.merge(right)
        assert np.array_equal(left["topn"].counters, right["topn"].counters)
        assert left["distinct"].to_bytes() == right["distinct"].to_bytes()

    def test_child_mismatch(self):
        a = CompositeSketch({"x": CmsTopn(3)})
        b = CompositeSketch({"y": CmsTopn(3)})
        with pytest.raises(SketchError, match="different children"):
            a.merge(b)


class TestUnionAggErrorsDistributed:
    def test_param_mismatch_in_state_column(self, spark):
        # union_agg over a table whose sketch rows disagree on parameters
        # must raise the verbatim reference error (expected/union_agg.out:48)
        rows = [
            (1, CmsTopn(3, 0.01, 0.99).add("a").to_bytes()),
            (2, CmsTopn(2, 0.01, 0.99).add("b").to_bytes()),
        ]
        df = spark.createDataFrame(rows, "id int, state binary")
        from cms_topn_spark.functions.sketch_api import cms_topn_union_agg

        with pytest.raises(Exception, match="cannot merge cms_topns with different parameters"):
            cms_topn_union_agg(df, "state")

    def test_type_mismatch_in_state_column(self, spark):
        rows = [
            (1, CmsTopn(2).add(2).to_bytes()),
            (2, CmsTopn(2).add("2").to_bytes()),
        ]
        df = spark.createDataFrame(rows, "id int, state binary")
        from cms_topn_spark.functions.sketch_api import cms_topn_union_agg

        with pytest.raises(Exception, match="cannot merge cms_topns of different types"):
            cms_topn_union_agg(df, "state")

    def test_null_rows_skipped_mixed(self, spark):
        base = CmsTopn(2, update="linear")
        rows = [(1, base.add("x").to_bytes()), (2, None), (3, None)]
        df = spark.createDataFrame(rows, "id int, state binary")
        from cms_topn_spark.functions.sketch_api import cms_topn_union_agg

        sk = cms_topn_union_agg(df, "state")
        assert sk.topn_list() == [("x", 1)]
