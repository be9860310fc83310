"""Columnar-direct parquet ingest — feed Python kernels WITHOUT the JVM row
pivot.

Spark's ``mapInArrow`` pipeline over a parquet scan is columnar parquet →
``ColumnarToRow`` → rows → ``ArrowWriter`` → Arrow: a double pivot executed
in the JVM for every row. Measured on this box (30M-row (long, double)
table, pass-through Python consumer): the pivot costs ~26 JVM-CPU-seconds
at 2 task threads and ~68 at 8 — it is ~8× the cost of the scan itself
(3.3 s for the same table through a JVM-only aggregate) AND its per-thread
throughput degrades ~2.6× as task threads increase, which caps the scaling
efficiency of any transfer-dominated Python operator regardless of how well
the kernel itself scales.

For operators whose Python kernel consumes whole columns (the sketch folds:
grouped quantiles/distinct/top-n, corpus profiles), the pivot is pure
overhead — the data is columnar on disk and columnar in the kernel. This
source distributes the parquet FILE SPLITS as task rows and lets every task
read its own split columnar-to-columnar with pyarrow:

    files-DataFrame (one row per file) → mapInArrow(read + fold)

Column pruning happens via ``columns`` (pyarrow reads only those column
chunks); each file is one task, so the scan parallelism is the file count —
the same unit a 100-TB Iceberg table's manifest hands out. Trade-offs,
stated plainly: this bypasses Catalyst's scan node, so SQL predicate
pushdown and partition pruning don't apply — use it for full-column sketch
ingests, not filtered point queries; and a single giant file is one task
unless ``split_row_groups=True``, which hands out one task per (file,
row-group) — the same split unit Spark's own scan uses.

When NOT to use it (measured, BENCH/BASELINE.md §2b): jobs whose kernel
dwarfs the transfer and whose columns are wide strings — Spark's vectorized
JVM parquet reader decodes string columns faster than single-threaded
pyarrow in the worker, and the pivot share is small when the kernel
dominates (flagship 9M-doc build: 49 s DataFrame vs 91 s direct at
local[2]). The direct path wins where transfer dominates: narrow/numeric
columns feeding cheap folds (grouped quantiles 15.6 s → 9.1 s there).
"""

from __future__ import annotations

import os
from typing import Callable, Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession


def parquet_files(path: str) -> list[str]:
    """Sorted data-file list of a parquet file or directory tree.

    Recurses so Hive-partitioned layouts (``key=value`` subdirectories, as
    ``DataFrameWriter.partitionBy`` produces) are listed too — note the
    partition-key COLUMNS encoded in those directory names are not
    materialized by this source (they live in the path, not the file); use
    the JVM scan when the kernel needs them."""
    if os.path.isfile(path):
        return [path]
    out: list[str] = []
    for root, dirs, names in os.walk(path):
        dirs[:] = sorted(d for d in dirs if not d.startswith(("_", ".")))
        out.extend(
            os.path.join(root, f)
            for f in names
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
    return sorted(out)


def spark_type_of(path: str, column: str) -> str:
    """Spark SQL type string of a parquet column (one footer read; callers
    that need it for several schemas should read it once and pass it down)."""
    import pyarrow.parquet as pq

    files = parquet_files(path)
    if not files:
        raise FileNotFoundError(f"no parquet files under {path!r}")
    field = pq.read_schema(files[0]).field(column)
    t = field.type
    if pa.types.is_int8(t) or pa.types.is_int16(t) or pa.types.is_int32(t):
        return "int"
    if pa.types.is_int64(t):
        return "bigint"
    if pa.types.is_float32(t):
        return "float"
    if pa.types.is_float64(t):
        return "double"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return "timestamp"
    raise TypeError(f"unmapped parquet type {t} for column {column!r}")


def map_parquet_batches(
    spark: SparkSession,
    path: str,
    columns: list[str],
    fold: Callable[[Iterator[pa.RecordBatch]], Iterator[pa.RecordBatch]],
    out_schema: str,
    files: list[str] | None = None,
    split_row_groups: bool = False,
    splits: list[tuple[str, int]] | None = None,
) -> DataFrame:
    """Run ``fold`` (a batches→batches kernel, same contract as a
    ``mapInArrow`` function) over ``columns`` of the parquet data at
    ``path``, one task per file, reading columnar-direct in the worker.

    ``use_threads=False`` on the pyarrow reader: each task is already one
    core's worth of work — per-task thread pools would oversubscribe the
    executor and wreck the task-count = parallelism accounting.

    ``files``: pre-resolved file list — callers that already listed the
    directory (e.g. to size the merge strategy) pass it to avoid a second
    listing and the TOCTOU window between two listings.

    ``split_row_groups``: one task per (file, row-group) instead of per
    file — the remedy when a few giant files would otherwise serialize the
    scan (a parquet row group is the file's independently-readable unit,
    exactly what Spark's own scan splits on). Costs one footer read per
    file on the driver; a real lakehouse hands out the same splits from
    the table manifest without touching footers."""
    if splits is None:
        splits = parquet_splits(path, files=files, split_row_groups=split_row_groups)
    # exactly one split per partition: parallelize's deterministic list
    # slicing, NOT .repartition(n) — round-robin starts at a random offset
    # per input partition, so splits can collide into one task and leave
    # others empty (a straggler wave). This is the module's one RDD touch,
    # on an n-row list of (path, row_group).
    fdf = spark.createDataFrame(
        spark.sparkContext.parallelize(splits, len(splits)),
        "path string, row_group int",
    )

    def read_and_fold(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.parquet as pq

        def split_batches() -> Iterator[pa.RecordBatch]:
            for rb in batches:
                rgs = rb.column(1).to_pylist()
                for p, rg in zip(rb.column(0).to_pylist(), rgs):
                    # close each handle as its split is exhausted — a task
                    # over many splits must not hold every fd until GC
                    with pq.ParquetFile(p) as pf:
                        kw = {} if rg < 0 else {"row_groups": [rg]}
                        yield from pf.iter_batches(
                            columns=columns, use_threads=False, **kw
                        )

        yield from fold(split_batches())

    return fdf.mapInArrow(read_and_fold, out_schema)


def parquet_splits(
    path: str, files: list[str] | None = None, split_row_groups: bool = False
) -> list[tuple[str, int]]:
    """The (file, row_group) task list — row_group = -1 means whole file.
    Computed ONCE per job: callers sizing a merge strategy pass the same
    list to :func:`map_parquet_batches`, so the footers are read a single
    time and the strategy can never disagree with the task count."""
    if files is None:
        files = parquet_files(path)
    if not files:
        raise FileNotFoundError(f"no parquet files under {path!r}")
    if not split_row_groups:
        return [(f, -1) for f in files]
    import pyarrow.parquet as pq

    splits = [
        (f, rg) for f in files for rg in range(pq.read_metadata(f).num_row_groups)
    ]
    # footer-only files (empty datasets/partitions) have 0 row groups; fall
    # back to whole-file tasks so the empty input yields the same
    # empty-result semantics as split_row_groups=False instead of crashing
    # parallelize([], 0)
    return splits or [(f, -1) for f in files]
