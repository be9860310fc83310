"""Time-series joins Spark lacks natively: as-of join and binned range join.

The reference engine (oudalab/cms_topn) delegates all relational work to
PostgreSQL, which offers neither operator; both are table stakes for the
event-analytics workloads the sketch layer serves (attribute a conversion to
the most recent prior touch; count points inside sliding intervals), so the
engine provides them as first-class compositions of built-in DataFrame ops —
no Python UDFs, everything stays inside whole-stage codegen.

As-of join — ``asof_join`` (backward, inclusive, left-outer):
    For each left row, attach the right row with the LARGEST right_time <=
    left_time within the same key (ties broken toward the largest
    ``right_tiebreak``), or nulls when no right row qualifies.

    Plan shape: tag both inputs, union them, and run ONE window
    (``last(..., ignorenulls=True)`` over rows-unbounded-preceding) ordered
    by (time, side, tiebreak). That is a SINGLE exchange for BOTH inputs
    combined — the union shuffles once on the key — versus the two
    exchanges + join + per-key re-reduce of a sort-merge-join formulation.
    At 100 TB the exchange is the whole cost, so halving exchanges halves
    the job. A pathologically hot key lands in one task; AQE's skew-sort
    split applies, and event data is key-sharded by construction.

    Row atomicity: the right payload is carried through the window as ONE
    struct column, so a right row whose payload contains a legitimate NULL
    can never "tear" (per-column ``last(ignorenulls)`` would skip to an
    older row for just that column).

Binned range join — ``range_join_pairs`` (inner, half-open [start, end)):
    Join points to intervals with NO equi-key. Spark's native plan for a
    pure inequality join is BroadcastNestedLoopJoin — O(|P|·|I|), a
    scale-killer. The classic fix (Databricks' range-join optimization,
    DuckDB's IEJoin serve the same purpose) is binning: pick a bin width W,
    assign each point to bin floor(t/W), explode each interval over the
    bins it overlaps, equi-join on the bin, then apply the exact residual
    predicate. Each point lives in exactly one bin, so a qualifying
    (point, interval) pair is emitted exactly once — no dedup pass. Cost is
    O(|P| + |I|·ceil(len/W) + matches): linear, shuffled on a key Catalyst
    can hash. A ``max_bins_per_interval`` circuit breaker fails loudly
    (``assert_true``) if a caller picks W so small an interval would
    explode pathologically.

Times are caller-provided orderable columns; the gated queries convert
timestamps to integer epoch microseconds first (the repo-wide
``timestampdiff(MICROSECOND, TIMESTAMP_NTZ epoch, ts)`` == DuckDB
``epoch_us`` convention) so every comparison is integer-exact in both
engines.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["asof_join", "range_join_pairs"]

_T = "__asof_t"
_SIDE = "__asof_side"
_PAY = "__asof_payload"


def _as_list(on: Union[str, Sequence[str]]) -> list:
    return [on] if isinstance(on, str) else list(on)


def _all_not_null(cols: Sequence[Column]) -> Column:
    pred = cols[0].isNotNull()
    for c in cols[1:]:
        pred = pred & c.isNotNull()
    return pred


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Union[str, Sequence[str]],
    left_time: str,
    right_time: str,
    right_tiebreak: Optional[str] = None,
    tolerance: Optional[int] = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: the closest right row at-or-before (``direction=
    "backward"``, the default: largest right_time <= left_time) or
    at-or-after (``"forward"``: smallest right_time >= left_time) each
    left row within the same key.

    Returns all ``left`` columns plus every non-key ``right`` column
    (including ``right_time``); right columns are NULL for left rows with
    no qualifying match (left-outer semantics). Ties on ``right_time`` are
    broken toward the largest ``right_tiebreak`` going backward and the
    smallest going forward (pass a unique right id to make the result
    fully deterministic). ``tolerance`` (same units as the time columns,
    which must then be numeric) additionally requires
    |left_time - right_time| <= tolerance.

    Column names (other than the keys) must be disjoint between the two
    inputs — rename before calling; silently suffixing hides bugs.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"asof_join: direction must be 'backward' or 'forward', got {direction!r}"
        )
    keys = _as_list(on)
    reserved = {_T, _SIDE, _PAY, "__asof_match"}
    taken = reserved & (set(left.columns) | set(right.columns))
    if taken:
        raise ValueError(f"asof_join: column names {sorted(taken)} are reserved")
    for k in keys:
        if k not in left.columns or k not in right.columns:
            raise ValueError(f"asof_join: key column {k!r} must exist on both sides")
    if left_time not in left.columns:
        raise ValueError(f"asof_join: left_time {left_time!r} not in left columns")
    if right_time not in right.columns:
        raise ValueError(f"asof_join: right_time {right_time!r} not in right columns")
    right_payload = [c for c in right.columns if c not in keys]
    clash = sorted(set(left.columns) & set(right_payload))
    if clash:
        raise ValueError(
            f"asof_join: non-key column names must be disjoint; rename {clash} "
            "on one side before joining"
        )
    if right_tiebreak is not None and right_tiebreak not in right_payload:
        raise ValueError(
            f"asof_join: right_tiebreak {right_tiebreak!r} must be a non-key "
            "right column"
        )
    if tolerance is not None:
        for df, c in ((left, left_time), (right, right_time)):
            t = df.schema[c].dataType.typeName()
            if t not in ("byte", "short", "integer", "long", "float", "double", "decimal"):
                raise ValueError(
                    "asof_join: tolerance requires numeric time columns "
                    f"(got {c!r}: {t}); convert timestamps to epoch micros first"
                )

    payload_t = F.struct(*[F.col(c) for c in right_payload])
    tie = (
        [F.col(f"{_PAY}.{right_tiebreak}")] if right_tiebreak is not None else []
    )

    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_time).alias(_T),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(right.select(payload_t).schema[0].dataType).alias(_PAY),
    )
    # SQL semantics: a right row with a NULL key or NULL time can never
    # match (NULL = NULL and NULL <= t are both not-true in a join
    # predicate); without this filter the window would group NULL keys
    # together and sort NULL times first, silently returning them as the
    # oldest match. Left rows always pass through (left-outer).
    right_joinable = right.where(
        F.col(right_time).isNotNull()
        & _all_not_null([F.col(k) for k in keys])
    )
    r_tagged = right_joinable.select(
        *[F.col(k) for k in keys],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in keys],
        F.col(right_time).alias(_T),
        F.lit(0).alias(_SIDE),
        payload_t.alias(_PAY),
    )

    # One exchange for both inputs, either direction. Backward: right rows
    # at the same time sort BEFORE the left row (side 0 < 1), so "<=" is
    # inclusive and a running last() picks the latest (max tiebreak at
    # ties). Forward: the side order flips so equal-time right rows sort
    # AFTER the left row, and a [current, +inf) first() picks the earliest
    # (min tiebreak at ties).
    if direction == "backward":
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col(_T), F.col(_SIDE), *tie)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = F.last(_PAY, ignorenulls=True).over(w)
    else:
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col(_T), F.col(_SIDE).desc(), *tie)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carried = F.first(_PAY, ignorenulls=True).over(w)
    matched = (
        l_tagged.unionByName(r_tagged)
        .withColumn("__asof_match", carried)
        .where(F.col(_SIDE) == 1)
    )
    # A NULL left_time matches nothing in either direction (NULL <= t /
    # NULL >= t are not-true); backward gets this for free from the sort
    # (NULLs first, empty frame behind), forward would otherwise see every
    # right row ahead of the NULL block.
    m: Column = F.when(F.col(_T).isNotNull(), F.col("__asof_match"))
    if tolerance is not None:
        gap = (
            F.col(_T) - m[right_time]
            if direction == "backward"
            else m[right_time] - F.col(_T)
        )
        m = F.when(gap <= F.lit(tolerance), m)  # else NULL: match too far away
    return matched.select(
        *[F.col(c) for c in left.columns],
        *[m[c].alias(c) for c in right_payload],
    )


def range_join_pairs(
    points: DataFrame,
    point_time: str,
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    bin_width: int,
    max_bins_per_interval: int = 4096,
) -> DataFrame:
    """Inner-join points to intervals with start <= t < end — no equi-key.

    Time columns must be integer (epoch micros by repo convention);
    ``bin_width`` is in the same units. Returns all point columns plus all
    interval columns for every qualifying pair, each pair exactly once.
    Pick ``bin_width`` near the typical interval length: each interval is
    replicated once per overlapped bin (ceil(len/W) + 1 worst case), each
    point exactly once. Intervals overlapping more than
    ``max_bins_per_interval`` bins fail the job loudly rather than explode
    the exchange silently.

    Non-key column names must be disjoint between the two inputs.
    """
    if bin_width <= 0:
        raise ValueError("range_join_pairs: bin_width must be a positive integer")
    if "__rj_bin" in points.columns or "__rj_bin" in intervals.columns:
        raise ValueError("range_join_pairs: column name '__rj_bin' is reserved")
    for df, c, side in (
        (points, point_time, "points"),
        (intervals, start_col, "intervals"),
        (intervals, end_col, "intervals"),
    ):
        if c not in df.columns:
            raise ValueError(f"range_join_pairs: column {c!r} not in {side}")
        t = df.schema[c].dataType.typeName()
        if t not in ("byte", "short", "integer", "long"):
            raise ValueError(
                f"range_join_pairs: time column {c!r} must be integer "
                f"(got {t}); convert timestamps to epoch micros first"
            )
    clash = sorted(set(points.columns) & set(intervals.columns))
    if clash:
        raise ValueError(
            f"range_join_pairs: column names must be disjoint; rename {clash} "
            "on one side before joining"
        )

    w = F.lit(int(bin_width)).cast("long")

    def _floor_div(c: Column) -> Column:
        # Exact floor division in long space: c - pmod(c, w) is the largest
        # multiple of w <= c (any sign); dividing an exact multiple is exact
        # in double up to 2^53, far beyond epoch-micros range (~1.7e15). A
        # plain floor(c / w) rounds through an inexact double quotient and
        # can land a bin-edge point in the wrong bin. Beyond 2^53 (e.g.
        # epoch NANOSECOND times) even the exact multiple rounds, which
        # would silently misbin and DROP qualifying pairs — so fail loudly
        # instead, matching the max_bins breaker's style.
        quotient = ((c - F.pmod(c, w)) / w).cast("long")
        return F.when(F.abs(c) < F.lit(1 << 53), quotient).otherwise(
            F.raise_error(
                F.lit(
                    "range_join_pairs: |time| >= 2^53 exceeds the exact "
                    "binning range — rescale times (e.g. ns -> us) first"
                )
            ).cast("long")
        )

    p_binned = points.withColumn(
        "__rj_bin", _floor_div(F.col(point_time).cast("long"))
    )

    start, end = F.col(start_col).cast("long"), F.col(end_col).cast("long")
    first_bin = _floor_div(start)
    n_bins = _floor_div(end - F.lit(1)) - first_bin + F.lit(1)
    # The breaker lives INSIDE the sequence bound so column pruning can
    # never elide it (a free-standing assert_true column would be dropped
    # by Catalyst as unused).
    last_bin = F.when(
        n_bins <= F.lit(int(max_bins_per_interval)), first_bin + n_bins - F.lit(1)
    ).otherwise(
        F.raise_error(
            F.lit(
                "range_join_pairs: interval spans more than "
                f"{int(max_bins_per_interval)} bins of width {int(bin_width)}"
                " — raise bin_width or max_bins_per_interval"
            )
        ).cast("long")
    )
    i_binned = intervals.where(end > start).withColumn(
        "__rj_bin", F.explode(F.sequence(first_bin, last_bin))
    )

    pairs = p_binned.join(i_binned, on="__rj_bin", how="inner").where(
        (F.col(point_time) >= F.col(start_col)) & (F.col(point_time) < F.col(end_col))
    )
    return pairs.select(*points.columns, *intervals.columns)
