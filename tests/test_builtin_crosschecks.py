"""Statistical cross-checks against Spark's own sketch functions
(SURVEY.md §5.2(4)): not equality (different hashes/layouts), but both
implementations must tell the same story about the same data."""

import os

import pytest
from pyspark.sql import functions as F

from cms_topn_spark.functions.sketch_api import (
    cms_topn_add_agg,
    hll_add_agg,
    kll_add_agg,
    tdigest_add_agg,
)


@pytest.fixture(scope="module")
def events(spark, sf001_dir):
    return spark.read.parquet(os.path.join(sf001_dir, "events.parquet"))


@pytest.fixture(scope="module")
def lineitem(spark, sf001_dir):
    return spark.read.parquet(os.path.join(sf001_dir, "lineitem.parquet"))


def test_cms_vs_builtin_count_min_sketch(spark, events):
    ours = cms_topn_add_agg(events, "event_type", n=5, e=0.01, p=0.99)
    n = events.where(F.col("event_type").isNotNull()).count()
    # Spark's count_min_sketch: probe via its own estimator is Scala-side;
    # cross-check statistically: our estimates within eps*N of exact counts,
    # exactly the bound Spark documents for its own sketch
    exact = dict(
        (r["event_type"], r["c"])
        for r in events.groupBy("event_type").agg(F.count("*").alias("c")).collect()
    )
    for item, c in exact.items():
        est = ours.estimate(item)
        assert c <= est <= c + 0.01 * n


def test_hll_vs_approx_count_distinct(spark, lineitem):
    ours = hll_add_agg(lineitem, "l_partkey", p=14, sparse_limit=100)  # force dense
    builtin = lineitem.select(
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("d")
    ).collect()[0]["d"]
    exact = lineitem.select(F.countDistinct("l_partkey")).collect()[0][0]
    assert abs(ours.estimate() - exact) / exact < 0.05
    assert abs(builtin - exact) / exact < 0.05  # both within their bounds


def test_hll_sketch_agg_builtin_agrees(spark, lineitem):
    ours = hll_add_agg(lineitem, "l_partkey", p=12, sparse_limit=10)
    builtin = lineitem.select(
        F.hll_sketch_estimate(F.hll_sketch_agg("l_partkey", F.lit(12))).alias("d")
    ).collect()[0]["d"]
    assert abs(ours.estimate() - builtin) / builtin < 0.1


def test_kll_vs_approx_percentile(spark, lineitem):
    ours = kll_add_agg(lineitem, "l_extendedprice", k=200)  # compacted regime
    builtin = lineitem.select(
        F.percentile_approx("l_extendedprice", [0.25, 0.5, 0.75], 10000).alias("q")
    ).collect()[0]["q"]
    exact_n = lineitem.count()
    sorted_prices = [
        r[0] for r in lineitem.select("l_extendedprice").orderBy("l_extendedprice").collect()
    ]
    for q, b in zip((0.25, 0.5, 0.75), builtin):
        est = ours.quantile(q)
        # rank-space agreement within 2%
        import bisect

        rank_ours = bisect.bisect_left(sorted_prices, est) / exact_n
        rank_blt = bisect.bisect_left(sorted_prices, b) / exact_n
        assert abs(rank_ours - q) < 0.02
        assert abs(rank_blt - q) < 0.02


def test_tdigest_vs_approx_percentile(spark, events):
    ours = tdigest_add_agg(events, "value", delta=200)  # compressed regime
    builtin = events.select(F.percentile_approx("value", 0.5, 10000).alias("m")).collect()[0][
        "m"
    ]
    exact = events.select(F.expr("percentile(value, 0.5)").alias("m")).collect()[0]["m"]
    assert abs(ours.quantile(0.5) - exact) <= abs(builtin - exact) + 0.5
