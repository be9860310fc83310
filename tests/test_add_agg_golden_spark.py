"""Distributed golden parity: the reference's cms_topn_add_agg regression
matrix (sql/add_agg.sql + expected/add_agg.out) executed through the REAL
Spark path (DataFrame filter → mapInArrow partials → merge).

The (0.01, 0.09) text scenarios run a depth-1 width-272 sketch, where even
hash *collisions* must reproduce — our Murmur/probe layout is bit-identical
to the reference, so parity here is strong evidence of kernel fidelity."""

import pytest
from pyspark.sql import functions as F

from cms_topn_spark.functions.sketch_api import cms_topn_add_agg, cms_topn_info

NUMBERS = [(0, 200), (1, 10), (2, 150), (3, 3), (4, 40000), (5, 6000), (None, 5)]
STRINGS = [("0", 2), ("1", 1), ("2", 15000), ("3", 20), ("4", 6), ("5", 70000), (None, 30)]


@pytest.fixture(scope="module")
def numbers(spark):
    rows = [(v,) for v, c in NUMBERS for _ in range(c)]
    return spark.createDataFrame(rows, "int_column int").repartition(8).cache()


@pytest.fixture(scope="module")
def strings(spark):
    rows = [(v,) for v, c in STRINGS for _ in range(c)]
    return spark.createDataFrame(rows, "text_column string").repartition(8).cache()


# expected/add_agg.out:39-95 — prefix filters WHERE int_column < k
INT_PREFIX_GOLDENS = {
    0: [],
    1: [(0, 200)],
    2: [(0, 200), (1, 10)],
    3: [(0, 200), (2, 150), (1, 10)],
    4: [(0, 200), (2, 150), (1, 10)],
    5: [(4, 40000), (0, 200), (2, 150)],
    6: [(4, 40000), (5, 6000), (0, 200)],
}

# expected/add_agg.out:103-164 — WHERE text_column < k at (n=4, 0.01, 0.09)
TEXT_PREFIX_GOLDENS = {
    "0": [],
    "1": [("0", 2)],
    "2": [("0", 2), ("1", 1)],
    "3": [("2", 15000), ("0", 2), ("1", 1)],
    "4": [("2", 15000), ("3", 20), ("0", 2), ("1", 1)],
    "5": [("2", 15000), ("3", 20), ("4", 6), ("0", 2)],
    "6": [("5", 70000), ("2", 15000), ("3", 20), ("4", 6)],
}


class TestIntPrefixes:
    @pytest.mark.parametrize("k", sorted(INT_PREFIX_GOLDENS))
    def test_prefix(self, spark, numbers, k):
        df = numbers.where(F.col("int_column") < k)
        sk = cms_topn_add_agg(df, "int_column", n=3)
        got = [] if sk is None else sk.topn_list()
        assert got == INT_PREFIX_GOLDENS[k]

    def test_full_table(self, spark, numbers):  # add_agg.out:89-95
        sk = cms_topn_add_agg(numbers, "int_column", n=3)
        assert sk.topn_list() == [(4, 40000), (5, 6000), (0, 200)]
        assert cms_topn_info(sk) == "Sketch depth = 5, Sketch width = 2719, Size = 106kB"


class TestTextPrefixes:
    @pytest.mark.parametrize("k", sorted(TEXT_PREFIX_GOLDENS))
    def test_prefix(self, spark, strings, k):
        # depth-1 sketch: collisions (if any) must match the reference's
        df = strings.where(F.col("text_column") < k)
        sk = cms_topn_add_agg(df, "text_column", n=4, e=0.01, p=0.09)
        got = [] if sk is None else sk.topn_list()
        assert got == TEXT_PREFIX_GOLDENS[k]

    def test_full_table(self, spark, strings):  # add_agg.out:157-164
        sk = cms_topn_add_agg(strings, "text_column", n=4, e=0.01, p=0.09)
        assert sk.topn_list() == [("5", 70000), ("2", 15000), ("3", 20), ("4", 6)]

    def test_param_errors_distributed(self, spark, strings):  # add_agg.out:25-37
        from cms_topn_spark.core import SketchError

        with pytest.raises(SketchError, match="Number of top items has to be positive"):
            cms_topn_add_agg(strings, "text_column", n=0)
        with pytest.raises(SketchError, match="Error bound has to be between 0 and 1"):
            cms_topn_add_agg(strings, "text_column", n=2, e=1.2)
        with pytest.raises(SketchError, match="Confidence interval has to be between 0 and 1"):
            cms_topn_add_agg(strings, "text_column", n=2, e=0.1, p=-0.5)


class TestConservativeDistributed:
    def test_conservative_mode_distributed_golden(self, spark, numbers):
        # distributed conservative partials merge by counter-sum: still exact
        # in the collision-free golden regime, same top-3 as the reference
        sk = cms_topn_add_agg(numbers, "int_column", n=3, update="conservative")
        assert sk.topn_list() == [(4, 40000), (5, 6000), (0, 200)]
        for v, c in [(0, 200), (1, 10), (2, 150), (3, 3), (4, 40000), (5, 6000), (-1, 0)]:
            assert sk.estimate(v) == c
