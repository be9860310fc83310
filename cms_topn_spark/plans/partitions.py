"""Hive-layout partition pruning: skip data at the DIRECTORY level.

The third leg of the storage-layout story (SURVEY.md §2.4
"storage/exchange", alongside bucketing's Exchange elision in
plans/bucketing.py and row-group pruning in sources/parquet_direct.py):
a table written ``partitionBy(key)`` puts each key value in its own
``key=value`` directory, and a filter on the key prunes whole directories
out of the scan BEFORE any file is opened — the listing, not the reader,
does the skipping. At 100 TB this is the difference between scanning a
day and scanning a decade: date/type-partitioned layouts make selective
queries independent of total table size.

What to partition on (and what not): low-cardinality, query-aligned keys
(event date, event type, source). A high-cardinality key (user_id)
produces millions of small directories — that's bucketing's job instead.
Partition values ride in the PATH, not the files, so the column
materializes from the directory name at read time (string-typed unless
``spark.sql.sources.partitionColumnTypeInference.enabled`` infers better).

``assert_partition_pruned`` turns the layout claim into a loud runtime
check: a DataFrame whose scan did NOT prune (every partition listed) fails
rather than silently reading everything — the same fail-loud discipline as
the bucketed gate's zero-Exchange assertion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(df: DataFrame, path: str, *keys: str, mode: str = "overwrite") -> None:
    """Write ``df`` as parquet Hive-partitioned on ``keys`` (directory per
    key-value combination, partition columns stripped from the files)."""
    if not keys:
        raise ValueError("write_partitioned: at least one partition key required")
    missing = [k for k in keys if k not in df.columns]
    if missing:
        raise ValueError(f"write_partitioned: partition keys {missing} not in columns")
    df.write.mode(mode).partitionBy(*keys).parquet(path)


def partition_filters(df: DataFrame) -> list:
    """The ``PartitionFilters`` entries of every file scan in ``df``'s
    physical plan — the predicates Catalyst classified as prunable at the
    file-LISTING level (as opposed to ``PushedFilters``, which the reader
    applies per row group after a file is already selected). Note
    ``inputFiles()`` is NOT pruning-aware (it lists the whole FileIndex),
    which is why the check reads the plan instead."""
    import re

    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
    plan = df._jdf.queryExecution().explainString(mode.fromString("formatted"))
    found = []
    for m in re.finditer(r"PartitionFilters: \[(.*?)\]", plan):
        body = m.group(1).strip()
        if body:
            found.append(body)
    return found


def assert_partition_pruned(df: DataFrame, key: str) -> list:
    """Assert ``df``'s scan prunes on ``key`` at the listing level and
    return the matching PartitionFilters entries. A filter that Catalyst
    could not classify as a partition filter (e.g. the key wrapped in an
    opaque UDF, or a filter applied after a pruning-hostile transform)
    fails loudly here instead of silently scanning every partition — the
    empirical counterpart lives in tests/test_partitions.py, where a
    corrupted sibling partition crashes a non-pruned scan and leaves the
    pruned one untouched."""
    import re

    # The key must appear as an attribute token (event_type#12 — not a
    # substring of some other column) in a SELECTIVE predicate: Spark adds
    # a bare isnotnull(key#N) partition filter for any non-null-tolerant
    # comparison, and a regression that demotes the real predicate to a
    # data filter would leave exactly that bare isnotnull behind — it must
    # not satisfy this gate.
    token = re.compile(rf"\b{re.escape(key)}#\d+")
    matching = []
    for f in partition_filters(df):
        residual = re.sub(r"isnotnull\([^()]*\)", "", f)
        if token.search(residual):
            matching.append(f)
    if not matching:
        raise AssertionError(
            f"no selective PartitionFilters on {key!r}: the scan would list "
            "every (non-null) partition directory"
        )
    return matching
