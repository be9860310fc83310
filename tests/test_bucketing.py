"""Bucketed co-located joins (plans/bucketing.py): the write-once shuffle
that every later equijoin on the key skips — §2.4 storage/exchange, the
Spark analogue of the reference host's indexed equijoins."""

import os

from pyspark.sql import functions as F

from cms_topn_spark.plans.bucketing import bucketed_join, exchange_count, write_bucketed


def test_bucketed_join_elides_exchange_and_matches_shuffled_join(spark, sf001_dir, tmp_path):
    db = "bucketdemo"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{tmp_path}/wh'")
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    auto_scan = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev_auto = spark.conf.get(auto_scan, "true")
    try:
        # pin the scan choice: with auto-bucketed-scan on, Catalyst MAY drop
        # the bucketed layout for plans it scores as not benefiting — the
        # assertion here is about the layout's capability, not the scorer
        spark.conf.set(auto_scan, "false")
        orders = (
            spark.read.parquet(os.path.join(sf001_dir, "orders.parquet"))
            .select(F.col("o_orderkey").alias("k"), "o_totalprice")
        )
        lineitem = (
            spark.read.parquet(os.path.join(sf001_dir, "lineitem.parquet"))
            .select(F.col("l_orderkey").alias("k"), "l_extendedprice")
        )
        write_bucketed(orders, f"{db}.orders_b", "k", 4)
        write_bucketed(lineitem, f"{db}.lineitem_b", "k", 4)

        # force the big-x-big strategy (SortMergeJoin) on this small corpus:
        # broadcast would hide exactly the Exchange bucketing exists to elide
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        joined = bucketed_join(spark, f"{db}.orders_b", f"{db}.lineitem_b", "k")
        assert exchange_count(joined) == 0, (
            joined._jdf.queryExecution().executedPlan().toString()
        )

        # the same join over the raw (catalog-less) parquet shuffles BOTH
        # sides — the per-query cost the bucketed layout paid once at write
        plain = orders.join(lineitem, "k")
        assert exchange_count(plain) >= 2

        got = sorted(tuple(r) for r in joined.collect())
        want = sorted(tuple(r) for r in plain.collect())
        assert got == want and len(got) > 0

        # and a keyed aggregation over the bucketed table is shuffle-free too
        agg = spark.table(f"{db}.lineitem_b").groupBy("k").agg(
            F.sum("l_extendedprice").alias("s")
        )
        assert exchange_count(agg) == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.conf.set(auto_scan, prev_auto)
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_write_bucketed_one_file_per_bucket_and_validation(spark, tmp_path):
    import pytest

    db = "bucketdemo2"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{tmp_path}/wh2'")
    try:
        df = spark.range(0, 1000).withColumn("v", F.col("id") * 2)
        with pytest.raises(ValueError):
            write_bucketed(df, f"{db}.t", "id", 0)
        write_bucketed(df.repartition(7), f"{db}.t", "id", 4)
        loc = os.path.join(str(tmp_path), "wh2", "t")
        files = [f for f in os.listdir(loc) if f.endswith(".parquet")]
        # the pre-write repartition collapses the 7 input tasks to exactly
        # one file per bucket — the layout that keeps sortBy usable and
        # avoids the tasks x buckets small-file explosion
        assert len(files) == 4, files
        assert spark.table(f"{db}.t").count() == 1000
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_exchange_count_node_anchored():
    """The counter must count Exchange NODES: ReusedExchange references are
    not re-counted, and identifiers merely containing the word (a column
    named ExchangeRate) never match."""
    from cms_topn_spark.plans.bucketing import _EXCHANGE_NODE

    plan = "\n".join(
        [
            "AdaptiveSparkPlan isFinalPlan=false",
            "+- SortMergeJoin [k], [k], Inner",
            "   :- Sort [k ASC NULLS FIRST], false, 0",
            "   :  +- Exchange hashpartitioning(k, 8), ENSURE_REQUIREMENTS",
            "   :     +- FileScan parquet [k,ExchangeRate] ReadSchema: struct<ExchangeRate:double>",
            "   +- Sort [k ASC NULLS FIRST], false, 0",
            "      +- ReusedExchange [k], Exchange hashpartitioning(k, 8)",
            "+- BroadcastExchange HashedRelationBroadcastMode",
        ]
    )
    hits = [m.group(1) for m in _EXCHANGE_NODE.finditer(plan)]
    assert hits == ["Exchange", "ReusedExchange", "BroadcastExchange"]
    counted = [h for h in hits if h != "ReusedExchange"]
    assert len(counted) == 2
