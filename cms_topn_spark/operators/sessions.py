"""Gap-based sessionization — the classic event-analytics window operator.

Per user, events are split into sessions wherever the gap to the previous
event exceeds ``gap`` (default 30 min); output is one row per session with
its event count and duration.

Plan shape: ONE exchange total. The lag/running-sum windows shuffle on
user_id; the session aggregation groups on (user_id, session_id), and
hash-partitioning by user_id already clusters those keys, so Catalyst plans
the groupBy without a second exchange. A pathologically hot user key lands
in one task — AQE's skew handling splits the sort, and real event data is
user-sharded by construction.

All time arithmetic is integer MICROSECONDS (Spark
``timestampdiff(MICROSECOND, ntz-epoch, ts)`` == DuckDB ``epoch_us``, both
naive wall-clock), so the session boundaries — not just the counts — are
bit-identical across engines; second-truncating casts could flip an event
sitting within 1 s of the gap threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

GAP_US = 30 * 60 * 1_000_000  # 30 minutes


def sessionize(
    df: DataFrame,
    gap_us: int = GAP_US,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """(user_id, session_id, n_events, duration_us): gap-based sessions.

    session_id numbers a user's sessions 1..k in time order; ties on the
    timestamp are broken by ``id_col`` so the ordering (and therefore every
    boundary) is deterministic."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    # TIMESTAMP_NTZ-safe epoch micros (unix_micros rejects ntz; this form is
    # naive wall-clock on both engines)
    us = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})"
    )
    gap = us - F.lag(us).over(w)
    is_new = F.when(gap.isNull() | (gap > F.lit(int(gap_us))), 1).otherwise(0)
    marked = df.select(
        F.col(user_col), F.col(ts_col), F.col(id_col), us.alias("_us")
    ).withColumn("session_id", F.sum(is_new).over(w))
    return (
        marked.groupBy(user_col, "session_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            (F.max("_us") - F.min("_us")).cast("long").alias("duration_us"),
        )
        .select(user_col, F.col("session_id").cast("long"), "n_events", "duration_us")
    )


def sessionize_sql(
    table: str = "events",
    gap_us: int = GAP_US,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> str:
    return f"""
    WITH e AS (
      SELECT {user_col}, {id_col}, epoch_us({ts_col}) AS us FROM {table}
    ),
    marked AS (
      SELECT {user_col}, {id_col}, us,
             CASE WHEN us - lag(us) OVER w IS NULL
                       OR us - lag(us) OVER w > {int(gap_us)}
                  THEN 1 ELSE 0 END AS is_new
      FROM e
      WINDOW w AS (PARTITION BY {user_col} ORDER BY us, {id_col})
    ),
    sess AS (
      SELECT {user_col}, us,
             sum(is_new) OVER (PARTITION BY {user_col} ORDER BY us, {id_col}
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT {user_col}, session_id::BIGINT AS session_id,
           count(*)::BIGINT AS n_events,
           (max(us) - min(us))::BIGINT AS duration_us
    FROM sess GROUP BY {user_col}, session_id
    """
