"""Hive-layout partition pruning: staging, plan assertion, empirical skip."""

import os

import pytest
from pyspark.sql import functions as F

from cms_topn_spark.plans.partitions import (
    assert_partition_pruned,
    partition_filters,
    write_partitioned,
)


@pytest.fixture()
def staged(spark, sf001_dir, tmp_path):
    path = str(tmp_path / "events")
    ev = spark.read.parquet(os.path.join(sf001_dir, "events.parquet"))
    write_partitioned(ev.select("event_id", "user_id", "event_type"), path, "event_type")
    return path


def test_layout_has_one_dir_per_type(staged):
    dirs = sorted(d for d in os.listdir(staged) if d.startswith("event_type="))
    assert len(dirs) == 5 and "event_type=click" in dirs


def test_pruned_scan_matches_unpartitioned_counts(spark, staged, sf001_dir):
    clicks = spark.read.parquet(staged).where(F.col("event_type") == "click")
    filters = assert_partition_pruned(clicks, "event_type")
    assert any("click" in f for f in filters)
    ev = spark.read.parquet(os.path.join(sf001_dir, "events.parquet"))
    assert clicks.count() == ev.where("event_type = 'click'").count()


def test_pruned_scan_never_opens_other_partitions(spark, staged):
    """Empirical pruning proof: corrupt a sibling partition's file. The
    partition-pruned scan never opens it; a scan that lists every
    partition dies on the bad footer."""
    err_dir = os.path.join(staged, "event_type=error")
    victims = [f for f in os.listdir(err_dir) if f.endswith(".parquet")]
    assert victims
    for v in victims:
        with open(os.path.join(err_dir, v), "wb") as fh:
            fh.write(b"not a parquet file")
    pruned = spark.read.parquet(staged).where(F.col("event_type") == "click")
    assert pruned.count() > 0  # succeeds: corrupt file never touched
    unpruned = spark.read.parquet(staged)
    with pytest.raises(Exception):
        unpruned.count()


def test_assertion_fails_without_partition_filter(spark, staged):
    allrows = spark.read.parquet(staged)  # no filter: every partition listed
    with pytest.raises(AssertionError, match="PartitionFilters"):
        assert_partition_pruned(allrows, "event_type")
    # a non-partition-column filter must not count as pruning either
    datafiltered = spark.read.parquet(staged).where(F.col("user_id") < 5)
    with pytest.raises(AssertionError, match="PartitionFilters"):
        assert_partition_pruned(datafiltered, "event_type")


def test_partition_filters_lists_the_predicate(spark, staged):
    clicks = spark.read.parquet(staged).where(F.col("event_type") == "click")
    fs = partition_filters(clicks)
    assert fs and all("event_type" in f for f in fs)


def test_write_partitioned_validation(spark, sf001_dir, tmp_path):
    ev = spark.read.parquet(os.path.join(sf001_dir, "events.parquet"))
    with pytest.raises(ValueError, match="at least one"):
        write_partitioned(ev, str(tmp_path / "x"))
    with pytest.raises(ValueError, match="not in columns"):
        write_partitioned(ev, str(tmp_path / "x"), "nope")


def test_bare_isnotnull_does_not_satisfy_the_gate(spark, staged):
    """A regression that demotes the selective predicate to a data filter
    leaves only isnotnull(key) as a partition filter — must not pass."""
    only_nn = spark.read.parquet(staged).where(F.col("event_type").isNotNull())
    fs = partition_filters(only_nn)
    assert fs and all("isnotnull" in f for f in fs)  # precondition: filter exists
    with pytest.raises(AssertionError, match="selective"):
        assert_partition_pruned(only_nn, "event_type")


def test_session_window_boundary_vs_sessionize(spark):
    """Pin the boundary rule the gate corpus never exercises: both the
    built-in session_window and the hand-rolled sessionize MERGE a gap of
    exactly the threshold and split one microsecond past it."""
    import datetime

    from pyspark.sql import functions as F

    from cms_topn_spark.operators.sessions import sessionize

    base = datetime.datetime(2024, 1, 1)
    gap = datetime.timedelta(minutes=30)
    rows = [
        (1, 10, base),
        (1, 11, base + gap),          # exactly 30 min later
        (1, 12, base + gap + gap/2),  # 15 min after that
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp_ntz")
    def n_builtin(frame):
        return frame.groupBy(
            "user_id", F.session_window("ts", "30 minutes")
        ).count().count()

    # exact-boundary gap MERGES under BOTH operators (strict > split rule;
    # an assumed >= rule for session_window was wrong — this test caught it)
    assert n_builtin(ev) == 1
    assert sessionize(ev).count() == 1
    just_over = ev.withColumn(
        "ts",
        F.when(F.col("event_id") >= 11, F.col("ts") + F.expr("INTERVAL 1 MICROSECOND"))
        .otherwise(F.col("ts")),
    )
    assert n_builtin(just_over) == 2
    assert sessionize(just_over).count() == 2
