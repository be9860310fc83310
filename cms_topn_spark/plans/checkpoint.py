"""Checkpoint / resume with per-partition lineage and counters.

North-star requirement (BASELINE.json:6): "checkpointed with per-partition
lineage and counters so any stage is resumable". The checkpoint unit is the
*states DataFrame* (one serialized sketch per partition plus its counters),
written as Parquet with lineage columns:

    partition_id, state BINARY, input_rows, build_wall_ms   (from the build)
    stage STRING, run_id STRING, created_ts TIMESTAMP       (lineage)

Resume = read the parquet back and continue merging; because merge is
commutative/associative on serialized states, a job can restart from any
completed stage. ``run_stage`` is the idempotent driver: if the stage
checkpoint exists it is read, otherwise built and written. On Iceberg
deployments the same frame maps to an Iceberg table with snapshot lineage;
Parquet is the sandbox stand-in (no Iceberg runtime jar baked in).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_COLS = ("stage", "run_id", "created_ts")


def stage_path(root: str, stage: str) -> str:
    return os.path.join(root, f"stage={stage}")


def checkpoint_states(states: DataFrame, root: str, stage: str, run_id: str) -> str:
    path = stage_path(root, stage)
    (
        states.withColumn("stage", F.lit(stage))
        .withColumn("run_id", F.lit(run_id))
        .withColumn("created_ts", F.current_timestamp())
        .write.mode("overwrite")
        .parquet(path)
    )
    return path


def has_checkpoint(spark: SparkSession, root: str, stage: str) -> bool:
    path = stage_path(root, stage)
    success = os.path.join(path, "_SUCCESS")
    return os.path.exists(success)


def read_checkpoint(spark: SparkSession, root: str, stage: str) -> DataFrame:
    return spark.read.parquet(stage_path(root, stage))


def run_stage(
    spark: SparkSession,
    root: str,
    stage: str,
    run_id: str,
    build_fn,
    force: bool = False,
) -> DataFrame:
    """Idempotent stage execution: resume from checkpoint if present."""
    if not force and has_checkpoint(spark, root, stage):
        return read_checkpoint(spark, root, stage)
    states = build_fn()
    checkpoint_states(states, root, stage, run_id)
    return read_checkpoint(spark, root, stage)


def lineage_summary(states: DataFrame) -> dict:
    """Counters for observability: rows processed, wall-ms, partials."""
    row = states.agg(
        F.count("*").alias("n_partials"),
        F.sum("input_rows").alias("rows"),
        F.sum("build_wall_ms").alias("wall_ms"),
    ).collect()[0]
    return {
        "n_partials": row["n_partials"],
        "input_rows": int(row["rows"] or 0),
        "build_wall_ms": int(row["wall_ms"] or 0),
    }
