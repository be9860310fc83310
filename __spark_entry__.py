"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator from SURVEY.md §2 (the
reference's sketch API rebuilt Spark-first) plus the training-pipeline
operators (dedup, similarity, text analysis). ``oracle_sql()`` provides the
DuckDB-equivalent ANSI SQL for every SQL-expressible query; sketch queries
are configured in their exactness regimes (collision-free CMS width,
sparse-exact HLL, uncompacted KLL/t-digest) so the comparison is equality,
per SURVEY.md §5.2(3).

Every query is oracle-checked (37/37), including winnow_fingerprints and
simhash_docs/simhash_near_pairs (their full hash schemes — splitmix64 via
HUGEINT modular multiplies — recomputed bit-exactly in DuckDB SQL),
ann_lsh_topk (run in its explicitly-labeled full-probe exactness regime, so
brute force is its oracle by construction), a streaming batch-equivalence
gate, iterative connected-components dedup resolution (recursive-CTE
oracle), and the sketch-driven gates (KLL length IQR, CMS vocabulary).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))  # cwd-independent

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cms_topn_spark.core import CmsTopn, TDigest
from cms_topn_spark.functions.sketch_api import (
    bloom_add_agg,
    bloom_contains_udf,
    cms_topn_add_agg,
    cms_topn_union_agg,
    frequency_udf,
    hll_add_agg,
    kll_add_agg,
    mms_add_agg,
    topn,
)
from cms_topn_spark.operators import dedup, similarity, textops
from cms_topn_spark.operators.build import build_partials


_PYFILES_SESSIONS: set = set()


def _ensure_workers_can_import(spark: SparkSession) -> None:
    """If the driver session was created elsewhere (so workers never saw our
    PYTHONPATH), ship the package as a py-file — addPyFile works mid-session."""
    key = id(spark.sparkContext)
    if key in _PYFILES_SESSIONS:
        return
    _PYFILES_SESSIONS.add(key)
    import tempfile

    from tools.make_pyfiles_zip import build

    zip_path = os.path.join(tempfile.gettempdir(), "cms_topn_spark_pyfiles.zip")
    build(zip_path)
    spark.sparkContext.addPyFile(zip_path)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ensure_workers_can_import(spark)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# --------------------------------------------------------------- sketches


def q_cms_topn_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cms_topn_add_agg + topn() over events.event_type (SURVEY §2.2 #15/#18)."""
    sk = cms_topn_add_agg(_t(spark, sf_dir, "events"), "event_type", n=5, salt_partitions=8)
    return topn(spark, sk)


def q_cms_topn_doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter tokens over documents.text; capacity 40 > vocab ⇒ exact.

    The document table is spread to cluster parallelism before the explode
    (no-op when the scan already has ≥ cores splits): the gate table is one
    small file, which otherwise serializes tokenize + fold on one core.
    Result-identical — the linear-update counters are additive and the
    capacity-exceeds-vocabulary regime retains every token, so partitioning
    cannot change the output."""
    from cms_topn_spark.operators.build import spread_small_input

    toks = spread_small_input(
        _t(spark, sf_dir, "documents").select("text")
    ).select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
    sk = cms_topn_add_agg(toks, "tok", n=40, e=0.0001)
    return topn(spark, sk).orderBy(F.desc("frequency"), F.asc("item")).limit(20)


def q_cms_topn_frequency_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cms_topn_frequency as a vectorized column probe (SURVEY §2.2 #19)."""
    ev = _t(spark, sf_dir, "events")
    sk = cms_topn_add_agg(ev, "user_id", n=10, e=0.00002)
    probe = frequency_udf(sk.to_bytes())
    return (
        ev.where(F.col("user_id") < 50)
        .select("user_id")
        .distinct()
        .withColumn("frequency", probe(F.col("user_id")))
    )


def q_cms_topn_union_partials(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cms_topn_union_agg over a sketch-state column (SURVEY §2.2 #17)."""
    ev = _t(spark, sf_dir, "events").select("event_type")
    states = build_partials(ev, lambda: CmsTopn(3, update="linear"), salt_partitions=16)
    sk = cms_topn_union_agg(states, "state")
    return topn(spark, sk)


def q_hll_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = hll_add_agg(_t(spark, sf_dir, "lineitem"), "l_partkey", p=14, sparse_limit=1 << 22)
    return spark.createDataFrame([(int(h.estimate()),)], "distinct_parts long")


def q_hll_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type distinct users through the two-level scale form
    (operators/grouped.py grouped_distinct) rather than
    groupwise_estimate's whole-rows-to-one-task shuffle: with only a
    handful of event types the groupwise form caps parallelism at the
    group count AND exchanges every raw row; the grouped form folds HLL
    states shuffle-free at scan parallelism and exchanges states only.
    Identical estimates — HLL union (sparse-exact sets / dense register
    max) is order-independent, and the packed int64 ingest applies the
    same item encoding (§2.1 #10) as the driver-level hll_add_agg."""
    from cms_topn_spark.operators.grouped import grouped_distinct

    return grouped_distinct(
        _t(spark, sf_dir, "events"),
        "event_type",
        "user_id",
        p=14,
        sparse_limit=1 << 22,
        out_col="distinct_users",
    )


def q_kll_length_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-driven pipeline gating — the two-pass shape a 100-TB curation
    run uses for distribution-based filters: pass 1 folds a KLL sketch over
    per-doc token counts (mergeable partials, no global sort — an exact
    percentile would shuffle the whole corpus), pass 2 gates the corpus to
    the interquartile range read off the sketch. Run in KLL's exact regime
    (k > n) so the driver oracle is quantile_cont; at scale the same code
    with default k trades the gate thresholds' exactness for O(k) state."""
    docs = _t(spark, sf_dir, "documents")
    lens = docs.select(
        F.size(F.split(F.col("text"), " ")).cast("double").alias("n_tokens")
    )
    sk = kll_add_agg(lens, "n_tokens", k=1 << 21)
    lo, hi = (float(x) for x in sk.quantiles([0.25, 0.75]))
    return docs.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens")
    ).where(F.col("n_tokens").between(F.lit(lo), F.lit(hi)))


def q_kll_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = kll_add_agg(_t(spark, sf_dir, "lineitem"), "l_extendedprice", k=1 << 21)
    qs = k.quantiles([0.25, 0.5, 0.75, 0.9])
    return spark.createDataFrame(
        [tuple(float(x) for x in qs)], "q25 double, q50 double, q75 double, q90 double"
    )


def q_tdigest_median_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type t-digest median through the two-level scale form
    (operators/grouped.py grouped_estimate): stage 1 folds per-(task, group)
    digests shuffle-free, stage 2 exchanges DIGEST STATES (not rows) and
    reads the median out fused. The prior groupwise form shuffled all rows
    of each of the 5 event types to a single task — a parallelism-5 ceiling
    and this query's r5 noise sensitivity. In the exact regime (delta ≥ πN
    ⇒ every centroid a singleton) the merged digest holds the identical
    sorted value multiset whatever the merge order, so quantile(0.5) is
    bitwise quantile_cont and partitioning-invariant."""
    from cms_topn_spark.operators.grouped import grouped_estimate, numeric_slice_ingest

    return grouped_estimate(
        _t(spark, sf_dir, "events"),
        "event_type",
        "value",
        lambda: TDigest(delta=1e7),  # delta >= pi*N ⇒ exact regime
        lambda sk: sk.quantile(0.5),
        "median_value",
        "double",
        ingest=numeric_slice_ingest,
    )


def q_bloom_customer_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom semi-join sized from parquet footers (zero extra scan): one pass
    over orders to build partial filters (OR-merged), one pass over customer
    to probe. fpp=1e-6 keeps the expected false-positive count ≪ 1 at any SF
    the sandbox holds while the bit array stays broadcast-sized."""
    from cms_topn_spark.functions.sketch_api import bloom_semi_join
    from cms_topn_spark.sources.parquet_meta import parquet_row_count

    capacity = max(parquet_row_count(os.path.join(sf_dir, "orders.parquet")), 1)
    matched = bloom_semi_join(
        _t(spark, sf_dir, "customer"),
        "c_custkey",
        _t(spark, sf_dir, "orders"),
        "o_custkey",
        capacity=capacity,
        fpp=1e-6,
    )
    return matched.agg(F.count("*").alias("matched_customers"))


_MASK_EXPR = (
    "CASE event_type WHEN 'click' THEN 1 WHEN 'view' THEN 2 WHEN 'purchase' THEN 4 "
    "WHEN 'signup' THEN 8 ELSE 16 END"
)


def q_mms_user_masks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-mask sketch: per-user OR of event-type permission bits (§2.1 #6-8).
    The probe is a vectorized column UDF (mask_udf) — no driver-side loop, the
    same distributed shape that scales to any probe-set size."""
    from cms_topn_spark.functions.sketch_api import mask_udf

    ev = (
        _t(spark, sf_dir, "events")
        .where(F.col("user_id") < 30)
        .select("user_id", F.expr(_MASK_EXPR).alias("mask"))
    )
    mms = mms_add_agg(ev, "user_id", "mask", e=0.000005)
    probe = mask_udf(mms.to_bytes())
    return (
        ev.select("user_id").distinct().withColumn("mask", probe(F.col("user_id")))
    )


def q_stream_event_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming under the hard correctness gate: the events table
    is re-read as a file STREAM (availableNow trigger, one file per
    micro-batch), every micro-batch builds per-partition sketch partials that
    fold into ONE persisted global state (streaming/stream_agg.py — the
    idempotent batch-id frame protocol with atomic fsync'd commits), and the
    final sketch's topn must equal the batch GROUP-BY oracle exactly. This is
    the batch-equivalence property the mergeable-state protocol guarantees:
    streaming and batch builds of the same data produce the same sketch."""
    import shutil
    import tempfile

    from cms_topn_spark.streaming.stream_agg import read_stream_state, sketch_stream_agg

    ev = _t(spark, sf_dir, "events")
    tmp = tempfile.mkdtemp(prefix="stream_gate_")
    try:
        # the file stream source needs a DIRECTORY; stage the table as 4
        # files so availableNow + maxFilesPerTrigger=1 yields four real
        # micro-batches folding into one state (row set unchanged)
        src = os.path.join(tmp, "in")
        ev.repartition(4).write.parquet(src)
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .select("event_type")
        )
        q = sketch_stream_agg(
            stream,
            lambda: CmsTopn(5, update="linear"),
            os.path.join(tmp, "state"),
            os.path.join(tmp, "ckpt"),
        )
        q.awaitTermination()
        sk = read_stream_state(os.path.join(tmp, "state"))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return topn(spark, sk)


def q_grouped_user_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level per-group CMS build (operators/grouped.py): per event_type,
    frequencies of user_ids < 10; zero-count pairs drop (exact at this width).
    States are probed distributed via grouped_probe — no .collect() of data."""
    from cms_topn_spark.core import CmsTopn
    from cms_topn_spark.operators.grouped import grouped_probe, grouped_sketch_states

    ev = _t(spark, sf_dir, "events")
    states = grouped_sketch_states(
        ev, "event_type", "user_id", lambda: CmsTopn(10, 0.00002, 0.99, update="linear")
    )
    return grouped_probe(
        states, "event_type", list(range(10)), item_col="user_id", item_type="long"
    ).where(F.col("frequency") > 0)


# -------------------------------------------------------------- relational


def q_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (operators/sessions.py): lag + running-sum
    windows over user_id, session agg without a second exchange (grouping
    keys are clustered by the window's hash partitioning). Microsecond-exact
    boundaries keep the oracle bit-identical."""
    from cms_topn_spark.operators.sessions import sessionize

    return sessionize(_t(spark, sf_dir, "events"))


_EPOCH_US = (
    "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
)  # == DuckDB epoch_us(ts); tz-free, integer-exact (see q_user_sessions)
_DAY_US = 86_400_000_000


def _day_col() -> "F.Column":
    """Epoch-day bucket == DuckDB ``epoch_us(ts) // 86400000000`` — the ONE
    definition every day-bucketed gate uses, so the oracles can't
    desynchronize."""
    return F.floor(F.expr(_EPOCH_US) / F.lit(_DAY_US)).cast("long")


def q_asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join (operators/joins.py asof_join): attribute each
    purchase to the same user's most recent click at-or-before it —
    left-outer, ties broken toward the largest click event_id. One exchange
    TOTAL for both inputs (tag → union → single keyed window with an atomic
    struct carry); a sort-merge-join formulation would shuffle twice and
    re-reduce per key. PostgreSQL (the reference's host engine) has no
    as-of join at all. Times compared as epoch-µs longs so the DuckDB
    QUALIFY/row_number oracle is integer-exact."""
    from cms_topn_spark.operators.joins import asof_join

    e = _t(spark, sf_dir, "events")
    us = F.expr(_EPOCH_US).cast("long")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", us.alias("ts_us")
    )
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id",
        us.alias("click_ts_us"),
        F.col("event_id").alias("click_id"),
        F.col("value").alias("click_value"),
    )
    out = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_time="ts_us",
        right_time="click_ts_us",
        right_tiebreak="click_id",
    )
    # Unmatched purchases keep the operator's left-outer NULLs; the GATE
    # sentinel-fills them (identically in the SQL oracle) because the
    # harness's value comparison need not be NULL-safe. -1 is impossible for
    # real ids/epoch-µs here.
    return out.select(
        "event_id",
        "user_id",
        "ts_us",
        F.coalesce("click_ts_us", F.lit(-1).cast("long")).alias("click_ts_us"),
        F.coalesce("click_id", F.lit(-1).cast("long")).alias("click_id"),
        F.coalesce("click_value", F.lit(0.0)).alias("click_value"),
    )


def q_range_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned range join (operators/joins.py range_join_pairs): clicks by ANY
    user landing in each purchase's trailing 1-hour window [ts-1h, ts) — a
    pure inequality join with no equi-key, which Spark would otherwise plan
    as an O(|P|·|I|) BroadcastNestedLoopJoin. Binning at the window width
    (1 h) replicates each interval over ≤2 bins and each point exactly once,
    turning the theta-join into a hash-shuffled equi-join plus an exact
    residual filter — linear at 100 TB. Left-outer counts via join-back
    (purchases with zero clicks keep n_clicks = 0)."""
    from cms_topn_spark.operators.joins import range_join_pairs

    hour_us = 3_600_000_000
    e = _t(spark, sf_dir, "events")
    us = F.expr(_EPOCH_US).cast("long")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", us.alias("ts_us")
    )
    clicks = e.where(F.col("event_type") == "click").select(
        us.alias("click_ts_us")
    )
    windows = purchases.select(
        "event_id",
        (F.col("ts_us") - F.lit(hour_us)).alias("w_start"),
        F.col("ts_us").alias("w_end"),
    )
    pairs = range_join_pairs(
        clicks, "click_ts_us", windows, "w_start", "w_end", bin_width=hour_us
    )
    counts = pairs.groupBy("event_id").agg(
        F.count("*").cast("long").alias("n_clicks")
    )
    return purchases.select("event_id").join(counts, "event_id", "left").select(
        "event_id", F.coalesce("n_clicks", F.lit(0).cast("long")).alias("n_clicks")
    )


def q_session_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's BUILT-IN session_window operator (§2.4 window functions),
    complementing the hand-rolled lag/running-sum sessionize gate
    (`user_sessions`): per-user gap-merged sessions from ONE groupBy — the
    engine maintains the merge in its aggregation, no window-function
    pass. Boundary semantics verified EMPIRICALLY (pinned in
    tests/test_partitions.py): a gap of exactly the threshold still
    MERGES — the window end is inclusive for the merge — i.e. the same
    strict `gap > threshold` split rule as sessionize; an early draft
    assumed the >= rule and only the synthetic boundary test caught it
    (the gate corpus's µs timestamps never land on the exact boundary).
    Session start (min event time) + event count identify each session
    integer-exactly in epoch µs."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    return (
        ev.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("w")
        )
        .agg(F.count("*").cast("long").alias("n_events"))
        .select(
            "user_id",
            F.expr(
                "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
                " w.start)"
            )
            .cast("long")
            .alias("session_start_us"),
            "n_events",
        )
    )


def q_seq_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (operators/pipeline.py pack_documents) — the LLM
    training-batch prep step: documents greedily packed into ≤256-token
    groups. Packing is a sequential fold, so the scale form shards the
    order first: id-mod buckets are packed independently in parallel (one
    applyInPandas task per bucket; n_buckets sized to the cluster), and
    the greedy boundary rule is matched EXACTLY by a recursive-CTE oracle
    — pack membership, not just pack counts, is value-checked."""
    from cms_topn_spark.operators.pipeline import pack_documents

    return pack_documents(
        _t(spark, sf_dir, "documents"), max_tokens=256, n_buckets=8
    )


def q_events_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (§2.4 reshaping, pivot's inverse — the wide-to-long
    step every ML feature table needs before per-feature aggregation):
    the per-user pivoted counts melt back to (user_id, event_type, n)
    rows INCLUDING explicit zeros, via the built-in DataFrame.unpivot
    (Expand under the hood: one pass, rows × n_values, no shuffle beyond
    the pivot's own). The oracle rebuilds the dense user × type grid with
    a cross join + FILTER counts."""
    types = ["click", "view", "purchase", "signup", "error"]
    wide = q_events_pivot(spark, sf_dir)
    return wide.unpivot(
        ids=["user_id"],
        values=types,
        variableColumnName="event_type",
        valueColumnName="n",
    )


def q_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level aggregation via ROLLUP (§2.4 exact aggregation): event
    counts at (type, day), (type), and grand-total levels in ONE pass —
    Catalyst's Expand operator replicates each input row once per grouping
    set before a single hash aggregate, so the three levels cost one
    shuffle, not three queries. NULL group cells are sentinel-filled
    identically in both engines (no real NULLs exist in the gate columns)
    and the grouping_id level tag disambiguates; day from the NTZ-safe
    epoch-µs expression."""
    ev = _t(spark, sf_dir, "events").select("event_type", _day_col().alias("day"))
    return (
        ev.rollup("event_type", "day")
        .agg(
            F.count("*").cast("long").alias("n"),
            (F.grouping("event_type") * 2 + F.grouping("day"))
            .cast("long")
            .alias("lvl"),
        )
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce("day", F.lit(-1).cast("long")).alias("day"),
            "lvl",
            "n",
        )
    )


def q_events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (§2.4): per-user counts spread across one column per event
    type. The value list is EXPLICIT — with it, pivot is a single
    groupBy(user_id) with conditional aggregates (one shuffle, stable
    schema); without it Spark first runs a distinct-values job and the
    output schema depends on the data, which is how pivots break at scale.
    Absent combinations fill 0, matching the FILTER-aggregate oracle."""
    types = ["click", "view", "purchase", "signup", "error"]
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type")
    out = ev.groupBy("user_id").pivot("event_type", types).count().na.fill(0, types)
    return out.select(
        "user_id", *[F.col(t).cast("long").alias(t) for t in types]
    )


def q_tpch_q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("long").alias("sum_qty"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("sum_base_cents"),
            F.sum(F.round(F.col("l_discount") * 100).cast("long")).alias("sum_disc_pct"),
            F.count("*").alias("count_order"),
        )
    )


def q_top_nations_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("revenue_cents"),
            F.count("*").alias("n_orders"),
        )
    )


# one bucketed warehouse per (process, sf_dir): repeated gate/bench calls
# overwrite the SAME tables instead of accumulating full table copies in
# /tmp, and atexit removes the directory when the process ends
_BUCKET_WAREHOUSES: dict[str, tuple[str, str]] = {}


def _bucket_db(spark: SparkSession, sf_dir: str) -> str:
    import atexit
    import shutil
    import tempfile

    if sf_dir not in _BUCKET_WAREHOUSES:
        wh = tempfile.mkdtemp(prefix="bucket_wh_")
        db = os.path.basename(wh)  # mkdtemp suffix keeps the identifier unique
        atexit.register(shutil.rmtree, wh, ignore_errors=True)
        _BUCKET_WAREHOUSES[sf_dir] = (wh, db)
    wh, db = _BUCKET_WAREHOUSES[sf_dir]
    # idempotent on a shared session; re-registers after a session restart
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{wh}'")
    return db


_PARTITIONED_STAGING: dict = {}


def q_partition_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-layout partition pruning under the hard gate (plans/
    partitions.py, §2.4 storage/exchange — the directory-level leg next to
    bucketing's Exchange elision and the direct ingest's row-group
    pruning): events are staged ``partitionBy(event_type)`` once per
    sf_dir (process-scoped, removed at exit), the query filters on the
    partition key, and the gate ASSERTS the filter lands in the scan's
    ``PartitionFilters`` (listing-level pruning; ``inputFiles()`` is not
    pruning-aware) — a regression that demotes it to a post-scan filter
    fails loudly, and the corrupt-sibling-partition pytest proves pruned
    scans never open other partitions' files. At 100 TB the same
    layout (usually date + type) makes selective scans independent of
    table size: pruning happens in the file LISTING, before any reader
    opens anything. Per-user click counts; exact GROUP-BY oracle over the
    unpartitioned table."""
    import atexit
    import shutil
    import tempfile

    from cms_topn_spark.plans.partitions import (
        assert_partition_pruned,
        write_partitioned,
    )

    if sf_dir not in _PARTITIONED_STAGING:
        staged = tempfile.mkdtemp(prefix="part_events_")
        atexit.register(shutil.rmtree, staged, ignore_errors=True)
        write_partitioned(
            _t(spark, sf_dir, "events").select("event_id", "user_id", "event_type"),
            staged,
            "event_type",
        )
        _PARTITIONED_STAGING[sf_dir] = staged
    staged = _PARTITIONED_STAGING[sf_dir]

    clicks = spark.read.parquet(staged).where(F.col("event_type") == "click")
    assert_partition_pruned(clicks, "event_type")
    return clicks.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_clicks")
    )


def q_bucketed_orders_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located equijoin (plans/bucketing.py, §2.4 storage/
    exchange): orders and lineitem are written bucketBy+sortBy(orderkey)
    into a process-scoped catalog database (one copy per sf_dir, overwritten
    on repeat calls, removed at exit), then per-order line counts and
    distinct-supplier counts come from a join+groupBy on the bucket key —
    and the function ASSERTS the physical plan has ZERO Exchange operators
    before returning, so a layout regression fails the gate loudly rather
    than silently re-shuffling. At 100 TB this is the repeated fact-×-fact
    join shape: the one hash shuffle happens at write time, every later
    join/agg on the key reads co-located buckets. The merge hint pins the
    SortMergeJoin strategy conf-free; the auto-bucketed-scan scorer is
    pinned off only while the plan is derived (the DataFrame's
    QueryExecution is cached, so the asserted plan is the executed one);
    integer aggregates keep the oracle hash float-free."""
    from cms_topn_spark.plans.bucketing import (
        bucketed_join,
        exchange_count,
        write_bucketed,
    )

    db = _bucket_db(spark, sf_dir)
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), "o_custkey"
    )
    lineitem = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"), "l_suppkey"
    )
    write_bucketed(orders, f"{db}.orders_b", "k", 8)
    write_bucketed(lineitem, f"{db}.lineitem_b", "k", 8)
    joined = bucketed_join(
        spark, f"{db}.orders_b", f"{db}.lineitem_b", "k", hint="merge"
    )
    out = joined.groupBy("k").agg(
        F.count("*").alias("n_items"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
    )
    # derive + assert the physical plan with the bucketed layout pinned:
    # DisableUnnecessaryBucketedScan MAY drop the layout for plans it scores
    # as not benefiting — the gate is about the layout's capability, not the
    # scorer's heuristic (conf restored immediately; the cached
    # QueryExecution keeps the asserted plan for the later collect)
    auto_scan = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev = spark.conf.get(auto_scan, "true")
    try:
        spark.conf.set(auto_scan, "false")
        n_exchanges = exchange_count(out)
    finally:
        spark.conf.set(auto_scan, prev)
    if n_exchanges != 0:
        raise AssertionError(
            f"bucketed join+agg plan has {n_exchanges} Exchange(s); the "
            f"co-located layout was not recognized"
        )
    return out


# ------------------------------------------------- text / dedup / vectors


def q_token_stats(spark, sf_dir):
    return textops.token_stats(_t(spark, sf_dir, "documents"))


def q_lang_id(spark, sf_dir):
    return textops.lang_id(_t(spark, sf_dir, "documents"))


def q_lang_id_ngram(spark, sf_dir):
    return textops.lang_id_ngram(_t(spark, sf_dir, "documents"))


def q_quality_score(spark, sf_dir):
    return textops.quality_score(_t(spark, sf_dir, "documents"))


def q_repetition_stats(spark, sf_dir):
    """Gopher/C4-style repetition filters: duplicate-token and top-bigram
    fractions, pure Catalyst per-row array expressions (no explode/shuffle)."""
    return textops.repetition_stats(_t(spark, sf_dir, "documents"))


def q_doc_fingerprints(spark, sf_dir):
    return textops.fingerprints(_t(spark, sf_dir, "documents"))


def q_tfidf_top_terms(spark, sf_dir):
    """Per-doc top-3 salient terms by df-normalized term frequency (linear
    idf — deterministic across engines; see textops.tfidf_top_terms)."""
    return textops.tfidf_top_terms(_t(spark, sf_dir, "documents"), k=3)


def q_exact_dedup(spark, sf_dir):
    return dedup.exact_dedup(_t(spark, sf_dir, "documents"))


def q_jaccard_pairs(spark, sf_dir):
    return dedup.jaccard_pairs_exact(_t(spark, sf_dir, "documents"), threshold=0.8)


JACCARD_MAX_DF = 20  # sf0.01 has 500 docs; boilerplate shingles hit hundreds


def q_jaccard_pairs_pruned(spark, sf_dir):
    """DF-pruned Jaccard (the 100-TB shape): ubiquitous shingles dropped
    before the self-join; similarity measured over the pruned shingle space —
    its own semantics, checked by its own oracle."""
    return dedup.jaccard_pairs_pruned(
        _t(spark, sf_dir, "documents"), threshold=0.8, max_df=JACCARD_MAX_DF
    )


def q_minhash_lsh_pairs(spark, sf_dir):
    return dedup.minhash_lsh_pairs(_t(spark, sf_dir, "documents"), threshold=0.8)


def q_dup_clusters(spark, sf_dir):
    """Duplicate-cluster resolution: MinHash-LSH near-dup pairs → connected
    components via iterative min-label propagation (dedup.duplicate_clusters)
    — the keep/drop decision step after pair generation. Oracle: recursive-
    CTE transitive closure over the shared exact-Jaccard pair oracle."""
    return dedup.duplicate_clusters(
        dedup.minhash_lsh_pairs(_t(spark, sf_dir, "documents"), threshold=0.8)
    )


def q_simhash_docs(spark, sf_dir):
    return dedup.simhash(_t(spark, sf_dir, "documents"))


def q_simhash_near_pairs(spark, sf_dir):
    """Pigeonhole-banded Hamming-≤3 pairs over 64-bit SimHash signatures.

    Fully oracled since the gram hash moved to splitmix64 over the packed
    8-byte gram word (the SQL-renderable kernel winnowing already used): the
    oracle recomputes signatures bit-exactly in DuckDB and takes ALL-PAIRS
    Hamming ≤ 3, while the operator's pigeonhole banding (k+1 chunks, join on
    any exact-matching chunk, verify full distance) is the O(candidates)
    scale plan being checked against it."""
    return dedup.simhash_near_pairs(_t(spark, sf_dir, "documents"), max_hamming=3)


ANN_QUERY_IDS = list(range(20))


def q_ann_brute_topk(spark, sf_dir):
    return similarity.brute_force_topk(_t(spark, sf_dir, "embeddings"), ANN_QUERY_IDS, k=5)


def q_ann_lsh_topk(spark, sf_dir):
    """Hyperplane LSH in its FULL-PROBE exactness regime: n_planes=8 with
    probe_hamming=8 enumerates every bucket key, so candidates = corpus BY
    CONSTRUCTION and the output equals brute force (same oracle) while still
    exercising the signature build + bucket-join machinery — the same
    explicitly-labeled oracle regime as IVF's n_probe = n_cells. This corpus
    is uniform-random (near-neighbors sit barely above the bulk cosine), so
    no sublinear probe can reach recall 1 here. The operator's DEFAULT config
    (16 planes × 16 tables, probe_hamming=2) probes 0.2 % of keys per table —
    the genuinely sublinear 100-TB plan — and its recall ≥ 0.95 plus a
    candidate-fraction bound are pytest-asserted on planted clusters
    (tests/test_pipeline_operators.py)."""
    return similarity.lsh_topk(
        _t(spark, sf_dir, "embeddings"), ANN_QUERY_IDS, k=5,
        probe_hamming=8, n_planes=8,
    )


def q_ann_ivf_topk(spark, sf_dir):
    """IVF coarse-quantizer ANN (operators/ivf.py): deterministic k-means →
    cell assignment → probe-cells join → exact re-rank. Run in its exactness
    regime (n_probe == n_cells ⇒ candidates = corpus ⇒ equals brute force by
    construction, same oracle-philosophy as the collision-free sketch widths);
    the n_probe < n_cells approximation path is pytest-covered on planted
    clusters (tests/test_ivf.py)."""
    from cms_topn_spark.operators import ivf

    return ivf.ivf_topk(
        _t(spark, sf_dir, "embeddings"), ANN_QUERY_IDS, k=5, n_cells=8, n_probe=8, iters=2
    )


# process-scoped ANN index stages, one per (sf_dir, kind): built on first
# use, re-LOADED from parquet on every query (the lifecycle under test),
# removed at interpreter exit — same pattern as the bucketing warehouse
_ANN_INDEX_DIRS: dict[tuple[str, str], str] = {}


def _ann_index_dir(sf_dir: str, kind: str) -> str:
    import atexit
    import shutil
    import tempfile

    key = (os.path.abspath(sf_dir), kind)
    d = _ANN_INDEX_DIRS.get(key)
    if d is None:
        d = tempfile.mkdtemp(prefix=f"ann_index_{kind}_")
        atexit.register(shutil.rmtree, d, ignore_errors=True)
        _ANN_INDEX_DIRS[key] = d
    return d


def q_ann_ivf_built_topk(spark, sf_dir):
    """The IVF build-once-load-query LIFECYCLE (round-7 verdict #3): the
    index (centroids + assignments + meta) is built and persisted as a
    parquet stage on first use, then every query batch goes through
    ivf_load + ivf_query — no refit, no corpus reassignment. Run in the
    same full-probe exactness regime as ann_ivf_topk (n_probe == n_cells ⇒
    equals brute force ⇒ shared oracle); refit-vs-loaded parity is
    additionally byte-pinned in tests/test_ivf.py."""
    from cms_topn_spark.operators import ivf

    d = _ann_index_dir(sf_dir, "ivf")
    if not os.path.exists(os.path.join(d, "meta.parquet")):
        ivf.ivf_build(_t(spark, sf_dir, "embeddings"), d, n_cells=8, iters=2)
    idx = ivf.ivf_load(spark, d)
    return ivf.ivf_query(
        idx, _t(spark, sf_dir, "embeddings"), ANN_QUERY_IDS, k=5, n_probe=8
    )


def q_ann_lsh_built_topk(spark, sf_dir):
    """The LSH build-once-load-query LIFECYCLE: corpus signatures are
    computed ONCE (the expensive full-corpus projection kernel) and
    persisted as a parquet stage; query batches go through lsh_load +
    lsh_query, which join against the stage instead of recomputing it.
    Same full-probe exactness regime as ann_lsh_topk (n_planes=8,
    probe_hamming=8 ⇒ candidates = corpus ⇒ shared brute-force oracle)."""
    from cms_topn_spark.operators import similarity as sim

    d = _ann_index_dir(sf_dir, "lsh")
    if not os.path.exists(os.path.join(d, "meta.parquet")):
        sim.lsh_build(_t(spark, sf_dir, "embeddings"), d, n_planes=8)
    idx = sim.lsh_load(spark, d)
    return sim.lsh_query(
        idx, _t(spark, sf_dir, "embeddings"), ANN_QUERY_IDS, k=5, probe_hamming=8
    )


COSINE_DUP_THRESHOLD = 0.4


def q_cosine_near_dup_pairs(spark, sf_dir):
    """Exact cosine pairs via distributed block-GEMM (similarity.py:
    cosine_near_dup_pairs_blocked): every vector is shuffled to B+1 block-pair
    tasks — no driver-side collect, no corpus broadcast anywhere in the
    lineage — and the output is exact at ANY threshold, so it keeps the full
    value-hash oracle.

    Why not demonstrate the LSH-bucketed variant here: measured on this
    corpus, the maximum pair cosine is 0.51 (no pairs exist in the near-dup
    regime LSH is built for), and at the demonstrated threshold 0.4 the
    16-table × 8-plane hyperplane LSH has per-pair recall ≈ 0.34 — its output
    would NOT coincide with the exact oracle. cosine_near_dup_pairs_lsh stays
    the first-class operator for true near-dup thresholds (recall ≥ 0.995 at
    s ≥ 0.9) and is pytest-verified on planted duplicates; the corpus-
    broadcast baseline (cosine_near_dup_pairs) is pytest-only."""
    return similarity.cosine_near_dup_pairs_blocked(
        _t(spark, sf_dir, "embeddings"), COSINE_DUP_THRESHOLD
    )


COSINE_PLANTED_THRESHOLD = 0.95


def q_cosine_lsh_planted_pairs(spark, sf_dir):
    """cosine_near_dup_pairs_lsh's BUCKETED regime under the hard gate —
    the 100-TB near-dup plan itself, not its exactness stand-in. The natural
    corpus has no pairs above cosine 0.61 at any SF (measured), so each
    query vector is re-planted at vec_id+10⁶ scaled ×2: cosine-identical
    (scaling preserves hyperplane signs exactly — multiply-by-2 is an
    exponent bump), so every planted pair collides in EVERY table and
    recall is 1.0 by construction, while the 0.95 threshold excludes all
    natural pairs. The emitted set is therefore exactly the 20 planted
    pairs, and the DuckDB oracle is the exact all-pairs scan over the same
    planted corpus. max_candidate_fraction=0.15 asserts the bucketed
    regime: the candidate self-join touches ~7 % of the all-pairs space
    here (measured both SFs; the fraction falls with corpus size as
    buckets thin out), and a bucket-skewed corpus fails loudly instead of
    silently degrading to O(n²)."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dup = emb.where(F.col("vec_id").isin(ANN_QUERY_IDS)).select(
        (F.col("vec_id") + F.lit(PLANTED_NN_OFFSET)).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(2.0)).alias("embedding"),
    )
    planted = emb.unionByName(dup)
    return similarity.cosine_near_dup_pairs_lsh(
        planted, COSINE_PLANTED_THRESHOLD, max_candidate_fraction=0.15
    )


def q_winnow_fingerprints(spark, sf_dir):
    return dedup.winnow_fingerprints(_t(spark, sf_dir, "documents"))


def q_stream_keyed_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The keyed custom-stateful streaming operator under the hard gate:
    events stream through applyInPandasWithState (one CmsTopn per event_type,
    Spark-managed state, update output mode), and the FINAL state per key —
    totals and top-1 frequencies are monotone under the linear update, so
    max() over the update stream reads it — must equal the batch GROUP-BY
    oracle. Collision-negligible width (ε=2e-5) keeps the check exact."""
    import shutil
    import tempfile
    import uuid

    from cms_topn_spark.streaming.stream_agg import keyed_sketch_stream

    ev = _t(spark, sf_dir, "events")
    tmp = tempfile.mkdtemp(prefix="stream_keyed_")
    qn = "keyed_gate_" + uuid.uuid4().hex
    try:
        src = os.path.join(tmp, "in")
        ev.select("event_type", "user_id").repartition(4).write.parquet(src)
        stream = (
            spark.readStream.schema("event_type string, user_id long")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        updates = keyed_sketch_stream(stream, "event_type", "user_id", n=1, eps=0.00002)
        q = (
            updates.writeStream.outputMode("update")
            .format("memory")
            .queryName(qn)
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rows = [
            (r["key"], r["total"], r["top_freq"])
            for r in spark.sql(
                f"SELECT key, max(total) AS total, max(top_freq) AS top_freq "
                f"FROM {qn} GROUP BY key"
            ).collect()
        ]
    finally:
        spark.catalog.dropTempView(qn)
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, "key string, total long, top_freq long")


def q_stream_keyed_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NUMERIC-sketch keyed stateful streaming shape under the hard
    gate: events stream through keyed_quantile_stream (one KLL sketch per
    event_type in Spark-managed state via applyInPandasWithState, update
    output mode), staged as 4 files with maxFilesPerTrigger=1 so every key's
    state genuinely folds across MULTIPLE micro-batches. n is monotone per
    key, so max_by(quantile, n) over the update stream reads the FINAL
    state's readout, which in the exact regime (k=65536 ≥ any per-key count
    at every sandbox SF) equals quantile_cont BITWISE per key — the same
    interpolation the batch grouped_kll gates pin."""
    import shutil
    import tempfile
    import uuid

    from cms_topn_spark.streaming.stream_agg import keyed_quantile_stream

    ev = _t(spark, sf_dir, "events")
    tmp = tempfile.mkdtemp(prefix="stream_kq_")
    qn = "keyed_quant_gate_" + uuid.uuid4().hex
    try:
        src = os.path.join(tmp, "in")
        ev.select("event_type", "value").repartition(4).write.parquet(src)
        stream = (
            spark.readStream.schema("event_type string, value double")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        updates = keyed_quantile_stream(stream, "event_type", "value", k=1 << 16)
        q = (
            updates.writeStream.outputMode("update")
            .format("memory")
            .queryName(qn)
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rows = [
            (r["key"], r["n"], r["q25"], r["q50"], r["q75"])
            for r in spark.sql(
                f"SELECT key, max(n) AS n, max_by(q25, n) AS q25, "
                f"max_by(q50, n) AS q50, max_by(q75, n) AS q75 "
                f"FROM {qn} GROUP BY key"
            ).collect()
        ]
    finally:
        spark.catalog.dropTempView(qn)
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows, "key string, n long, q25 double, q50 double, q75 double"
    )


def q_stream_windowed_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time WINDOWED streaming under the hard gate (the last streaming
    surface): events stream through windowed_sketch_stream — watermarked
    event-time windows, one mergeable CMS top-n state per window, per-window
    idempotent fsync'd frames (streaming/stream_agg.py:133-203) — and every
    window's topn must equal the window-grouped batch GROUP BY oracle.
    Staged as 4 files with maxFilesPerTrigger=1, so rows reach each window
    from MULTIPLE micro-batches out of event-time order: the per-window fold
    path (late-data merge, per-file batch-id skip) is genuinely exercised,
    not just the single-batch case. n=5 covers all event types and the
    default width is collision-negligible for 5 keys, so counts are exact."""
    import shutil
    import tempfile

    from cms_topn_spark.streaming.stream_agg import (
        read_window_states,
        windowed_sketch_stream,
    )

    ev = _t(spark, sf_dir, "events")
    tmp = tempfile.mkdtemp(prefix="stream_win_")
    try:
        src = os.path.join(tmp, "in")
        # stage ts so its EPOCH equals the NTZ wall clock regardless of the
        # session timezone: timestampdiff from the NTZ epoch is tz-free, and
        # timestamp_micros() builds the instant from raw epoch micros — so
        # F.window's (epoch-aligned) day boundaries match DuckDB's
        # epoch(date_trunc('day', ts)) under ANY spark.sql.session.timeZone
        # (a bare cast would shift by the session offset off-UTC)
        ev.select(
            F.timestamp_micros(
                F.expr(
                    "timestampdiff(MICROSECOND,"
                    " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
                )
            ).alias("ts"),
            "event_type",
        ).repartition(4).write.parquet(src)
        stream = (
            spark.readStream.schema("ts timestamp, event_type string")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = windowed_sketch_stream(
            stream,
            "ts",
            "event_type",
            os.path.join(tmp, "state"),
            os.path.join(tmp, "ckpt"),
            lambda: CmsTopn(5, update="linear"),
            window="1 day",
            watermark="2 days",
        )
        q.awaitTermination()
        states = read_window_states(os.path.join(tmp, "state"))
        rows = [
            (int(w), str(item), int(freq))
            for w, sk in sorted(states.items())
            for item, freq in sk.topn_list()
        ]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, "window_start long, item string, frequency long")


def q_grouped_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group KLL quantiles in the map-side-combine scale form: per-user
    event-value quartiles over every user (150 groups at sf0.01, 1500 at
    sf0.1). The exchange moves one KLL state per (task, group) — never the
    group's rows — and quantiles are read out distributed. Per-group n
    (~67 rows) is far below the k=4096 compaction threshold, so each
    quantile equals DuckDB quantile_cont bitwise (the exact regime; the
    compacting path is pytest-covered).

    Physical ingest (round-7 verdict #5): this entry runs the COLUMNAR-
    DIRECT source (grouped_quantiles_parquet) — the library's best physical
    plan for a parquet-backed fold, skipping Spark's columnar→row→Arrow
    double pivot that measured ~8× the scan's own CPU and anti-scales with
    task threads. Same fold, same states-only exchange, same bitwise
    oracle; the generic DataFrame-ingest form (grouped.grouped_quantiles)
    stays first-class — pytest-oracled in tests/test_grouped.py and gated
    through the grouped_estimate entries (tdigest_median_by_type,
    hll_users_by_type) and grouped_kll_quantiles_filtered."""
    from cms_topn_spark.operators.grouped import grouped_quantiles_parquet

    return grouped_quantiles_parquet(
        spark, os.path.join(sf_dir, "events.parquet"), "user_id", "value", k=4096
    )


def q_grouped_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group heavy hitters in the map-side-combine scale form
    (operators/grouped.py grouped_topn): top-3 user-id magnitude buckets per
    event type. The item is the integer bucket floor(log2(user_id+2)),
    computed as length(bin(x))-1 in BOTH engines (pure integer — no libm),
    because bucket populations grow exponentially: every group's top-3
    frequencies are separated by wide margins, so the retained set, its
    order, and its counts are all deterministic — CMS top-n tie order is
    insertion-sequence (merge-order dependent), which would otherwise make
    a heavy-hitter gate over flat distributions flap. Collision-negligible
    width ⇒ counts exact ⇒ the GROUP BY + row_number oracle applies."""
    from cms_topn_spark.operators.grouped import grouped_topn

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        (F.length(F.expr("bin(user_id + 2)")) - 1).cast("int").alias("bucket"),
    )
    return grouped_topn(ev, "event_type", "bucket", n=3, e=0.0001)


def q_grouped_kll_quantiles_direct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME per-group quantiles through the COLUMNAR-DIRECT ingest
    (sources/parquet_direct.py + grouped_quantiles_parquet): each task reads
    its own parquet split with pyarrow and folds it, skipping Spark's
    columnar→row→Arrow double pivot. Measured on this box the pivot is the
    operator's dominant cost at scale (~8× the scan's own CPU) and its
    per-thread throughput drops ~2.6× from 2 to 8 task threads, capping the
    DataFrame form's N→4N efficiency at ~0.44; the direct form restores the
    fold's own scaling (bench.py query-scaling section). Same fold, same
    states-only exchange, same readout — and the same quantile_cont oracle,
    which this entry passes bitwise like the DataFrame form."""
    from cms_topn_spark.operators.grouped import grouped_quantiles_parquet

    return grouped_quantiles_parquet(
        spark, os.path.join(sf_dir, "events.parquet"), "user_id", "value", k=4096
    )


def q_grouped_kll_quantiles_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The direct ingest's PREDICATE PUSHDOWN under the gate — the answer to
    its one documented trade-off (bypassing Catalyst's scan pushdown):
    per-user value quartiles over only the 'click' events, with the
    (column, op, literal) filter pushed into the scan in two layers — the
    driver prunes splits whose row-group statistics prove no match (the
    lakehouse-manifest analogue; pruning is pytest-asserted on sorted
    multi-row-group files) and each task applies the residual mask columnar-
    side with Arrow compute before the fold sees a batch. SQL-WHERE NULL
    semantics; the filter column is read for the mask and dropped before the
    fold. Exact regime as grouped_kll_quantiles ⇒ bitwise quantile_cont
    oracle with the same WHERE."""
    from cms_topn_spark.operators.grouped import grouped_quantiles_parquet

    return grouped_quantiles_parquet(
        spark, os.path.join(sf_dir, "events.parquet"), "user_id", "value",
        k=4096, filters=[("event_type", "==", "click")],
    )


def q_corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship one-scan multi-sketch shape UNDER the oracle gate
    (plans/profile.py): a single pass over documents builds token CMS top-n
    + distinct-text HLL + token-length KLL as one composite mergeable state;
    every reported statistic reads from the merged state. Exact regimes
    throughout (collision-negligible CMS width, sparse-exact HLL,
    no-compaction KLL), so the multi-subquery SQL oracle applies. At 100 TB
    this is N corpus-statistics jobs collapsed into one scan whose exchange
    is a few sketch-sized rows. ``n_tokens=64``: the gate corpora measure a
    max-frequency tie width of exactly 1 at every SF, but top-token
    determinism only holds while ties fit the retained heap (profile.py
    documents the >n-way-tie limitation), so the gate keeps 64 entries —
    far above any plausible tie — rather than relying on the corpus never
    tying."""
    from cms_topn_spark.plans.profile import corpus_profile

    p = corpus_profile(_t(spark, sf_dir, "documents"), n_tokens=64)
    return _profile_df(spark, p)


def q_corpus_profile_direct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-scan composite profile through the COLUMNAR-DIRECT ingest
    (plans/profile.py corpus_profile_parquet → build.sketch_agg_parquet):
    one partial CMS+HLL+KLL composite state per parquet file, pyarrow-pruned
    to the text column, no JVM row pivot — the GLOBAL-build analogue of
    grouped_kll_quantiles_direct, showing the direct path generalizes to
    the flagship north-star shape. Same composite fold, same merge, same
    multi-subquery oracle as corpus_profile. Same ``n_tokens=64`` tie-width
    headroom as q_corpus_profile."""
    from cms_topn_spark.plans.profile import corpus_profile_parquet

    p = corpus_profile_parquet(
        spark, os.path.join(sf_dir, "documents.parquet"), n_tokens=64
    )
    return _profile_df(spark, p)


def _profile_df(spark: SparkSession, p: dict) -> DataFrame:
    """One row per profile dict — shared by both corpus_profile entries so
    the schema string and the dict→tuple conversion live in one place."""
    return spark.createDataFrame(
        [tuple(p.values())],
        "distinct_texts long, total_tokens long, top_token string, "
        "top_token_freq long, len_q25 double, len_q50 double, len_q75 double",
    )


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-window chunking (operators/textops.py chunk_documents): every
    document split into overlapping 32-token windows at stride 16 — the
    training-example preparation step. Pure Catalyst higher-order exprs:
    whole-stage-codegen map, zero shuffle, no Python."""
    from cms_topn_spark.operators.textops import chunk_documents

    return chunk_documents(
        _t(spark, sf_dir, "documents"), chunk_tokens=32, stride=16
    )


def q_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/dedup.py contamination_report):
    split the documents table into a "train corpus" (doc_id % 10 ≠ 0) and an
    "eval benchmark" (doc_id % 10 = 0), then report, per eval document, how
    many train documents CONTAIN ≥ 90 % of its char-5-gram set and the
    maximum containment — the pre-training leak check. Containment (not
    Jaccard): a quoted eval item inside a larger train page must flag.
    Integer ppm division keeps the decision and maximum engine-exact.

    Regime note (same framing as jaccard_pairs' exact baseline): this is the
    EXACT all-pairs oracle regime. Its pair keyspace is |distinct train
    texts| × |distinct eval texts| when gram entropy is low — this synthetic
    corpus shares a ~2000-gram vocabulary across every document, the
    degenerate worst case. In production the eval side is a benchmark
    (thousands of items → the broadcast stream is trivially cheap), and the
    operator's dedup-first + broadcast-eval structure already bounds the
    work to distinct content; for corpus-vs-corpus runs the scale path is
    fingerprint intersection (winnow_fingerprints) rather than exact grams."""
    docs = _t(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 10 != 0)
    ev = docs.where(F.col("doc_id") % 10 == 0)
    return dedup.contamination_report(train, ev, threshold_ppm=900_000)


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact-dedup via Spark's BUILT-IN stateful operator: the
    documents table streams in as 4 files (availableNow, one per
    micro-batch), ``dropDuplicates`` on the content digest carries its seen-
    set in Spark-managed state across micro-batches, and the surviving
    digest set must equal the batch SELECT DISTINCT oracle. Complements the
    custom stateful gates (keyed topn, windowed sketches): where the
    engine's own operator expresses the semantics, we use it — state
    management, checkpointing, and exactly-once come for free. Output is
    the digest set (not doc ids), so the check is independent of which
    arrival-order representative the stream happened to keep."""
    import shutil
    import tempfile
    import uuid

    docs = _t(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="stream_dedup_")
    qn = "stream_dedup_" + uuid.uuid4().hex
    try:
        src = os.path.join(tmp, "in")
        docs.select(F.md5(F.col("text")).alias("digest")).repartition(4).write.parquet(src)
        stream = (
            spark.readStream.schema("digest string")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .dropDuplicates(["digest"])
        )
        q = (
            stream.writeStream.outputMode("append")
            .format("memory")
            .queryName(qn)
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rows = [(r["digest"],) for r in spark.sql(f"SELECT digest FROM {qn}").collect()]
    finally:
        spark.catalog.dropTempView(qn)
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, "digest string")


def q_stream_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming NEAR-dup dedup against a growing MinHash index (streaming/
    stream_agg.py near_dup_stream — the 8th streaming shape, round 7): the
    documents table streams in as 4 files (availableNow, maxFilesPerTrigger
    =1, so pairs MUST be found across micro-batch boundaries out of the
    persisted index, not within one batch), each micro-batch emits pairs
    vs the committed prior batches and appends its own features. The
    accumulated pair set is BATCHING-INVARIANT — it equals all near-dup
    pairs of the whole corpus, so the oracle is the same exact all-pairs
    Jaccard SQL that gates minhash_lsh_pairs, regardless of which file
    each document landed in."""
    import shutil
    import tempfile

    from cms_topn_spark.streaming.stream_agg import (
        near_dup_stream,
        read_near_dup_pairs,
    )

    docs = _t(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="stream_neardup_")
    try:
        src = os.path.join(tmp, "in")
        docs.select("doc_id", "text").repartition(4).write.parquet(src)
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = near_dup_stream(
            stream,
            index_root=os.path.join(tmp, "index"),
            checkpoint_dir=os.path.join(tmp, "ckpt"),
            threshold=0.8,
        )
        q.awaitTermination()
        rows = [
            (r["a_id"], r["b_id"])
            for r in read_near_dup_pairs(spark, os.path.join(tmp, "index")).collect()
        ]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, "a_id long, b_id long")


def q_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM interval join via Spark's built-in watermarked join —
    the last classic streaming shape (complements the foreachBatch fold,
    applyInPandasWithState, watermarked windows, and stateful
    dropDuplicates gates): purchases and clicks arrive as two independent
    streams (2 files each, maxFilesPerTrigger=1, so matches MUST be found
    across micro-batch boundaries out of Spark-managed join state, not
    within one batch), inner-joined on user_id with the click in the
    purchase's trailing 24-hour window [ts-24h, ts). The watermark (35
    days, beyond the corpus's 30-day span) makes nothing late, so the
    emitted pair set must equal the batch inequality-join oracle EXACTLY;
    in production the same job runs with the watermark sized to the
    lateness SLA and the join state stays bounded — that knob, not the
    plan, is the only difference. Output is the (purchase, click) id pair
    set: ids determine the rows fully, and timestamps stay out of the
    cross-engine comparison. Event times staged via timestamp_micros over
    the NTZ-safe epoch expression, so the 24 h arithmetic is identical in
    both engines under any session timezone."""
    import shutil
    import tempfile
    import uuid

    ev = _t(spark, sf_dir, "events")
    tmp = tempfile.mkdtemp(prefix="stream_ij_")
    qn = "stream_ij_" + uuid.uuid4().hex
    # Stream-stream join state lives in one store PER shuffle partition PER
    # micro-batch — on gate-sized data the wall clock is pure state-store
    # checkpoint overhead, so pin a small partition count for the stream's
    # lifetime (restored below; the state partition count is fixed at
    # checkpoint creation, so this only affects THIS query's checkpoint).
    shuffle_before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        staged = ev.select(
            F.timestamp_micros(F.expr(_EPOCH_US)).alias("ts"),
            "event_id",
            "user_id",
            "event_type",
        )
        psrc = os.path.join(tmp, "purchases")
        csrc = os.path.join(tmp, "clicks")
        staged.where(F.col("event_type") == "purchase").repartition(2).write.parquet(psrc)
        staged.where(F.col("event_type") == "click").repartition(2).write.parquet(csrc)
        schema = "ts timestamp, event_id long, user_id long, event_type string"

        def _src(path: str) -> DataFrame:
            return (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(path)
                .withWatermark("ts", "35 days")
            )

        p = _src(psrc).select(
            F.col("event_id").alias("p_event_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        c = _src(csrc).select(
            F.col("event_id").alias("c_event_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        joined = p.join(
            c,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 24 HOURS"))
            & (F.col("c_ts") < F.col("p_ts")),
            "inner",
        ).select("p_event_id", "c_event_id")
        q = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName(qn)
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rows = [
            (r["p_event_id"], r["c_event_id"])
            for r in spark.sql(f"SELECT p_event_id, c_event_id FROM {qn}").collect()
        ]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", shuffle_before)
        spark.catalog.dropTempView(qn)
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, "p_event_id long, c_event_id long")


def q_grouped_user_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group DISTINCT counts in the map-side-combine scale form
    (operators/grouped.py grouped_distinct): distinct active days per user —
    HLL states built shuffle-free per task, merged through a states-only
    exchange, read out distributed. Per-group distinct ≤ 30 days ≪ the
    sparse-exact limit, so each count is exact and the COUNT(DISTINCT)
    GROUP BY oracle applies; at 100 TB per-group cardinalities beyond the
    sparse regime degrade gracefully to the ~0.8 % HLL error instead of an
    exact-distinct hash explosion. Day index from the NTZ-safe epoch-µs
    expression (== DuckDB epoch_us), integer-exact in both engines."""
    from cms_topn_spark.operators.grouped import grouped_distinct

    ev = _t(spark, sf_dir, "events").select("user_id", _day_col().alias("day"))
    return grouped_distinct(ev, "user_id", "day", out_col="active_days")


PLANTED_NN_OFFSET = 1_000_000


def q_ann_lsh_planted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SUBLINEAR multi-probe LSH config under the hard gate. The planted
    corpus is derived deterministically from the embeddings table: each query
    vector is re-added at vec_id+10⁶ scaled by 2 — cosine-identical, so its
    hyperplane signature matches the query's in EVERY table (signs are scale
    invariant) and recall of the true nearest neighbor is 1.0 BY CONSTRUCTION
    even though the default config (16 planes × 16 tables, probe_hamming=2)
    probes only 137 of 65536 bucket keys per table (~0.2 %, asserted below;
    measured candidate fraction ≈3 % of the corpus is pytest-asserted on
    planted clusters). The oracle is DuckDB brute force over the same planted
    corpus — this entry demonstrates the genuinely sublinear 100-TB plan
    green under the gate, complementing ann_lsh_topk's full-probe regime."""
    from cms_topn_spark.operators.similarity import probe_masks

    n_planes, probe_h = 16, 2
    masks = probe_masks(n_planes, probe_h)
    assert len(masks) / (1 << n_planes) < 0.01, "probe fraction must stay sublinear"
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dup = emb.where(F.col("vec_id").isin(ANN_QUERY_IDS)).select(
        (F.col("vec_id") + F.lit(PLANTED_NN_OFFSET)).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(2.0)).alias("embedding"),
    )
    planted = emb.unionByName(dup)
    return similarity.lsh_topk(
        planted, ANN_QUERY_IDS, k=1,
        probe_hamming=probe_h, n_planes=n_planes, n_tables=16,
    )


def q_ann_ivf_planted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SUBLINEAR IVF config under the hard gate, mirroring
    q_ann_lsh_planted_topk: each query vector is re-added at vec_id+10⁶ as
    an IDENTICAL copy (not scaled — IVF assigns by L2, so only an identical
    vector is guaranteed the same cell under ANY centroid set), which makes
    recall of the true nearest neighbor 1.0 BY CONSTRUCTION independent of
    k-means quality: the copy's cell is exactly the query's own nearest
    cell, so n_probe=1 of n_cells=16 (~6 % of the corpus probed, fraction
    asserted below and measured in pytest) always contains the cosine-1
    top-1. The oracle is DuckDB brute force over the same planted corpus.
    Complements ann_ivf_topk's full-probe (n_probe == n_cells) exactness
    regime — together they gate both ends of the recall/probed-fraction
    dial the 100-TB deployment tunes."""
    from cms_topn_spark.operators.ivf import ivf_topk

    n_cells, n_probe = 16, 1
    assert n_probe / n_cells <= 0.125, "probe fraction must stay sublinear"
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dup = emb.where(F.col("vec_id").isin(ANN_QUERY_IDS)).select(
        (F.col("vec_id") + F.lit(PLANTED_NN_OFFSET)).alias("vec_id"), "embedding"
    )
    planted = emb.unionByName(dup)
    return ivf_topk(planted, ANN_QUERY_IDS, k=1, n_cells=n_cells, n_probe=n_probe)


def q_cms_vocab_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-driven vocabulary gating — the CMS used INSIDE a pipeline
    transform: pass 1 folds the corpus token stream into one CMS (mergeable
    partials; at 100 TB this replaces a vocabulary-sized exact count table),
    pass 2 probes every token's corpus frequency through the vectorized
    frequency_udf and reports per-doc rare-token counts (the OOV/noise signal
    quality filters threshold on). Run in the collision-negligible width
    (ε=2e-5 ⇒ w=135915 ≫ vocabulary) so the exact GROUP-BY oracle applies.

    Pass 2 is a PURE MAP (rare_token_probe_udf): each task splits its own
    documents, probes every token in one packed pass, and segment-sums per
    doc — zero exchanges. The previous explode → probe → groupBy(doc_id)
    plan shuffled one row PER TOKEN (~50× the corpus's document count) to
    reassemble rows that were never apart; at 100 TB that exchange IS the
    job, and it existed only as a formulation artifact."""
    from cms_topn_spark.functions.sketch_api import rare_token_probe_udf

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok"))
    sk = cms_topn_add_agg(toks, "tok", n=5, e=0.00002)
    probe = rare_token_probe_udf(sk.to_bytes(), threshold=10)
    # NULL-text docs produce no token rows in the oracle's unnest — exclude
    # them here identically (the probe UDF returns NULL fields for them)
    docs = docs.where(F.col("text").isNotNull())
    return docs.select("doc_id", probe(F.col("text")).alias("_s")).select(
        "doc_id",
        F.col("_s.n_tokens").alias("n_tokens"),
        F.col("_s.n_rare_tokens").alias("n_rare_tokens"),
    )


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus dedup (functions/sketch_api.py bloom_anti_join):
    dedupe a "new crawl batch" (doc_id ≡ 0 mod 3) against the "existing
    corpus" (the rest) WITHOUT joining against it — one scan of the old
    corpus builds an OR-merged Bloom filter over content digests, and the
    new batch filters as a pure broadcast-probe map (no shuffle touches
    either side). The growing-corpus shape: prior snapshots never re-join.
    fpp=1e-9 makes the one-sided false-positive drop probability ≪ 1 for
    any sandbox corpus, so the exact NOT-IN oracle applies; at 10⁹-key
    scale fpp trades retention for filter size (docstring)."""
    from cms_topn_spark.functions.sketch_api import bloom_anti_join
    from cms_topn_spark.sources.parquet_meta import parquet_row_count

    docs = _t(spark, sf_dir, "documents")
    cap = max(parquet_row_count(os.path.join(sf_dir, "documents.parquet")), 1)
    old = docs.where(F.col("doc_id") % 3 != 0).select(
        F.md5(F.col("text")).alias("digest")
    )
    new = docs.where(F.col("doc_id") % 3 == 0).select(
        "doc_id", F.md5(F.col("text")).alias("digest")
    )
    return bloom_anti_join(new, "digest", old, "digest", capacity=cap, fpp=1e-9)


def q_incremental_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dup dedup (operators/dedup.py incremental_near_dup,
    round-7 verdict #4): the prior corpus (doc_id ≢ 0 mod 3) is persisted
    once as a MinHash feature index (band keys + gram sets, a parquet
    stage); the new batch (doc_id ≡ 0 mod 3) runs the kernel pass over
    ITSELF ONLY and joins its band keys against the stage — the old corpus
    text is never re-scanned or re-hashed. Emits all Jaccard-≥0.8 pairs
    touching the batch (batch-vs-prior and batch-vs-batch); oracle = the
    exact all-pairs Jaccard SQL over old∪new restricted to batch-touching
    pairs, so the gate certifies the incremental path equals batch-vs-all
    exact at the threshold."""
    from cms_topn_spark.operators.dedup import (
        incremental_near_dup,
        minhash_index_build,
        minhash_index_load,
    )

    docs = _t(spark, sf_dir, "documents")
    d = _ann_index_dir(sf_dir, "minhash")
    if not os.path.exists(os.path.join(d, "features.parquet")):
        minhash_index_build(docs.where(F.col("doc_id") % 3 != 0), d)
    idx = minhash_index_load(spark, d)
    batch = docs.where(F.col("doc_id") % 3 == 0)
    # index_dir engages the band-bucket layout: the candidate join reads
    # only the bands partitions matching the batch's own key buckets
    return incremental_near_dup(batch, idx, threshold=0.8, index_dir=d)


def q_fingerprint_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-vs-corpus decontamination at the TRAIN-scale shape
    (operators/dedup.py fingerprint_contamination): both sides collapse to
    winnowed fingerprints (window=4 — the standard config, NOT a
    constructed exact regime) and per-eval-doc containment is computed
    against the train corpus fingerprint set through uniform-key joins —
    no broadcast, no per-pair quadratic keyspace, nothing collected. The
    DuckDB oracle recomputes the ENTIRE fingerprint scheme (splitmix64 via
    HUGEINT modular multiplies) bit-exactly, so the gate certifies the real
    windowed operator, not a degenerate configuration. Complements
    contamination_report's broadcast-eval exact-gram regime (which now
    raises toward this path when the eval side exceeds broadcast size)."""
    from cms_topn_spark.operators.dedup import fingerprint_contamination

    docs = _t(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 10 != 0)
    ev = docs.where(F.col("doc_id") % 10 == 0)
    return fingerprint_contamination(train, ev, window=4)


MEDIA_GATE_N = 64  # synthetic media rows for the multimodal gate


def q_media_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal decode pipeline under the hard gate (operators/
    multimodal.py): synthesize the deterministic x-fake media table (3/4
    images, 1/4 videos, sizes/seeds pure functions of the id), decode every
    payload for real, sample video frames (every=2), and reduce each row to
    engine-exact integer pixel statistics. The DuckDB oracle re-derives the
    entire pixel stream — per-id parameters and per-pixel splitmix64 channel
    values — in SQL and must match bit-for-bit. This puts the briefed
    multimodal family (binary payload + typed metadata + mapInArrow decode/
    feature plumbing) under the same CORRECTNESS gate as every other
    operator family; real codecs remain the clearly-marked stub boundary
    (no codec libraries in this container)."""
    from cms_topn_spark.operators.multimodal import (
        media_pixel_stats,
        synthesize_media,
    )

    media = synthesize_media(spark, MEDIA_GATE_N, partitions=4)
    return media_pixel_stats(media, every=2)


SAMPLE_FRACTIONS = {"en": 0.4, "und": 1.0}


def q_stratified_sample(spark, sf_dir):
    """Deterministic per-stratum corpus sampling (operators/pipeline.py):
    keep 40 % of the dominant language and 100 % of the rare stratum — the
    corpus-rebalancing move — via an md5-prefix hash whose DECISION is
    bit-identical in Spark and DuckDB. Pure map: no shuffle, no RNG state."""
    from cms_topn_spark.operators import pipeline
    from cms_topn_spark.operators.textops import (
        lang_pred_from_hit_cols,
        stage_stopword_hits,
    )

    docs = _t(spark, sf_dir, "documents")
    labeled = stage_stopword_hits(docs.select("doc_id", "text")).select(
        "doc_id", F.col("text"), lang_pred_from_hit_cols().alias("pred_lang")
    )
    return pipeline.stratified_sample(
        labeled, SAMPLE_FRACTIONS, "pred_lang"
    ).select("doc_id", "pred_lang")


def q_curate_corpus(spark, sf_dir):
    """Composed curation pipeline (operators/pipeline.py): language gate +
    alpha-ratio quality gate + dup-token repetition gate fused into one scan,
    then exact dedup — scan → codegen'd filter/map → ONE uniform-key
    exchange. The composition itself (not just each operator) sits under the
    value oracle."""
    from cms_topn_spark.operators import pipeline

    return pipeline.curate(_t(spark, sf_dir, "documents"))


# ----------------------------------------------------- canonical ordering
#
# The driver's value-hash compares Spark vs DuckDB outputs; both engines emit
# group-by/join results in engine-dependent order. Every query therefore gets
# one canonical ORDER BY applied to BOTH sides at this wrapper level — the
# queries above stay order-agnostic (no useless global sorts inside library
# operators), and the gate can never flap on row order.

_ORDER: dict[str, str] = {
    "asof_join_events": "event_id",
    "range_join_attribution": "event_id",
    "stream_interval_join": "p_event_id, c_event_id",
    "partition_pruned_scan": "user_id",
    "events_rollup": "lvl, event_type, day",
    "events_pivot": "user_id",
    "events_unpivot": "user_id, event_type",
    "session_window_counts": "user_id, session_start_us",
    "seq_packing": "doc_id",
    "bucketed_orders_join": "k",
    "stream_keyed_quantiles": "key",
    "cms_topn_event_types": "frequency DESC, item",
    "cms_topn_doc_tokens": "frequency DESC, item",
    "cms_topn_frequency_probe": "user_id",
    "cms_topn_union_partials": "frequency DESC, item",
    "hll_distinct_parts": "distinct_parts",
    "hll_users_by_type": "event_type",
    "kll_price_quantiles": "q25",
    "kll_length_gate": "doc_id",
    "tdigest_median_by_type": "event_type",
    "bloom_customer_semijoin": "matched_customers",
    "mms_user_masks": "user_id",
    "stream_event_type_counts": "frequency DESC, item",
    "stream_keyed_topn": "key",
    "stream_windowed_topn": "window_start, frequency DESC, item",
    "stream_dedup": "digest",
    "grouped_topn": "event_type, frequency DESC, item",
    "grouped_kll_quantiles": "user_id",
    "grouped_kll_quantiles_direct": "user_id",
    "grouped_kll_quantiles_filtered": "user_id",
    "grouped_user_days": "user_id",
    "ann_lsh_planted_topk": "query_id, rank",
    "ann_ivf_planted_topk": "query_id, rank",
    "cms_vocab_gate": "doc_id",
    "media_pixel_stats": "media_id",
    "grouped_user_freq": "event_type, user_id",
    "user_sessions": "user_id, session_id",
    "tpch_q1_pricing": "l_returnflag, l_linestatus",
    "top_nations_revenue": "n_name",
    "token_stats": "doc_id",
    "lang_id": "doc_id",
    "lang_id_ngram": "doc_id",
    "quality_score": "doc_id",
    "repetition_stats": "doc_id",
    "doc_fingerprints": "doc_id",
    "tfidf_top_terms": "doc_id, rank",
    "exact_dedup": "doc_id",
    "incremental_dedup": "doc_id",
    "incremental_near_dup": "a_id, b_id",
    "stream_near_dup": "a_id, b_id",
    "contamination_report": "eval_id",
    "fingerprint_decontamination": "eval_id",
    "doc_chunks": "doc_id, chunk_id",
    "corpus_profile": "distinct_texts",
    "corpus_profile_direct": "distinct_texts",
    "jaccard_pairs": "a_id, b_id",
    "jaccard_pairs_pruned": "a_id, b_id",
    "minhash_lsh_pairs": "a_id, b_id",
    "dup_clusters": "doc_id",
    "simhash_docs": "doc_id",
    "simhash_near_pairs": "a_id, b_id",
    "ann_brute_topk": "query_id, rank",
    "ann_lsh_topk": "query_id, rank",
    "ann_ivf_topk": "query_id, rank",
    "ann_ivf_built_topk": "query_id, rank",
    "ann_lsh_built_topk": "query_id, rank",
    "cosine_near_dup_pairs": "a_id, b_id",
    "cosine_lsh_planted_pairs": "a_id, b_id",
    "winnow_fingerprints": "doc_id, fp",
    "curate_corpus": "doc_id",
    "stratified_sample": "doc_id",
}


def _order_cols(spec: str) -> list:
    cols = []
    for part in spec.split(","):
        part = part.strip()
        if part.upper().endswith(" DESC"):
            cols.append(F.col(part[: -len(" DESC")].strip()).desc())
        else:
            cols.append(F.col(part).asc())
    return cols


def _ordered(name: str, fn: Callable) -> Callable:
    spec = _ORDER.get(name)

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        # every query (not just the _t table readers) must be runnable from
        # an externally-created session: the direct-ingest and synthetic-
        # input entries never call _t, so hoist the py-files shipping here
        _ensure_workers_can_import(spark)
        df = fn(spark, sf_dir)
        return df if spec is None else df.orderBy(*_order_cols(spec))

    wrapped.__name__ = getattr(fn, "__name__", name)
    wrapped.__doc__ = fn.__doc__
    return wrapped


def _ordered_sql(name: str, sql: str) -> str:
    spec = _ORDER.get(name)
    if spec is None:
        return sql
    return f"SELECT * FROM ({sql}\n) ORDER BY {spec}"


# ------------------------------------------------------------------ entry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: heavy-hitter tokens over documents at sf0.001 — scan →
    vectorized partial build → salted shuffle → tree merge → explode."""
    return q_cms_topn_doc_tokens(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _ordered(name, fn) for name, fn in _raw_queries().items()}


def _raw_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDER MATTERS: the correctness harness records the first ~50 entries
    # per round. Round-8 rotation (the reorder round-7's registry comment and
    # tests/test_rotation.py prescribe): the 21-entry round-7 tail — all
    # r6-recorded, none in CORRECTNESS_r07 — leads the window so none goes
    # two rounds unrecorded, followed by 29 r7-recorded stalwarts. The new
    # 21-entry tail (positions 50-70) is all r7-RECORDED queries, each with
    # a mechanism twin still in-window this round:
    # jaccard_pairs→jaccard_pairs_pruned (same _jaccard_from_shingles),
    # lang_id→lang_id_ngram, simhash_docs→simhash_near_pairs (scheme
    # bit-exact in pytest), corpus_profile→corpus_profile_direct (identical
    # oracle SQL), grouped_kll_quantiles_direct→grouped_kll_quantiles +
    # grouped_kll_quantiles_filtered (same grouped_quantiles_parquet),
    # grouped_user_freq→grouped_topn (same grouped-states machinery),
    # incremental_dedup→bloom_customer_semijoin (same Bloom mechanism) +
    # exact_dedup (digest mechanism), doc_fingerprints→winnow_fingerprints,
    # doc_chunks→token_stats (same tokenizer), quality_score→curate_corpus
    # (component), repetition_stats→curate_corpus (component),
    # contamination_report→fingerprint_decontamination,
    # cms_topn_union_partials→cms_topn_event_types (same oracle; goldens),
    # hll_distinct_parts→hll_users_by_type, kll_price_quantiles→
    # kll_length_gate, events_unpivot→events_pivot (inverse pair),
    # session_window_counts→user_sessions (same boundary rule),
    # stream_keyed_topn→stream_windowed_topn (same keyed stateful shape),
    # ann_lsh_topk→ann_lsh_built_topk + ann_lsh_planted_topk,
    # ann_ivf_topk→ann_ivf_built_topk + ann_ivf_planted_topk,
    # cosine_near_dup_pairs→cosine_lsh_planted_pairs (same cosine verify).
    # ALL 21 tail entries MUST rotate back into the first 50 next round.
    # tests/test_rotation.py enforces the no-two-misses invariant.
    return {
        # --- the 21 promoted from round-7's tail (unrecorded in r7) ---
        "dup_clusters": q_dup_clusters,
        "jaccard_pairs_pruned": q_jaccard_pairs_pruned,
        "lang_id_ngram": q_lang_id_ngram,
        "ann_lsh_planted_topk": q_ann_lsh_planted_topk,
        "ann_ivf_planted_topk": q_ann_ivf_planted_topk,
        "simhash_near_pairs": q_simhash_near_pairs,
        "corpus_profile_direct": q_corpus_profile_direct,
        "grouped_kll_quantiles_filtered": q_grouped_kll_quantiles_filtered,
        "grouped_topn": q_grouped_topn,
        "bloom_customer_semijoin": q_bloom_customer_semijoin,
        "winnow_fingerprints": q_winnow_fingerprints,
        "token_stats": q_token_stats,
        "curate_corpus": q_curate_corpus,
        "fingerprint_decontamination": q_fingerprint_decontamination,
        "cms_topn_event_types": q_cms_topn_event_types,
        "exact_dedup": q_exact_dedup,
        "hll_users_by_type": q_hll_users_by_type,
        "kll_length_gate": q_kll_length_gate,
        "events_pivot": q_events_pivot,
        "user_sessions": q_user_sessions,
        "stream_windowed_topn": q_stream_windowed_topn,
        # --- 29 r7-recorded stalwarts completing the window ---
        "ann_ivf_built_topk": q_ann_ivf_built_topk,
        "ann_lsh_built_topk": q_ann_lsh_built_topk,
        "incremental_near_dup": q_incremental_near_dup,
        "stream_near_dup": q_stream_near_dup,
        "ann_brute_topk": q_ann_brute_topk,
        "grouped_kll_quantiles": q_grouped_kll_quantiles,
        "asof_join_events": q_asof_join_events,
        "range_join_attribution": q_range_join_attribution,
        "stream_interval_join": q_stream_interval_join,
        "partition_pruned_scan": q_partition_pruned_scan,
        "events_rollup": q_events_rollup,
        "seq_packing": q_seq_packing,
        "bucketed_orders_join": q_bucketed_orders_join,
        "stream_keyed_quantiles": q_stream_keyed_quantiles,
        "cosine_lsh_planted_pairs": q_cosine_lsh_planted_pairs,
        "stratified_sample": q_stratified_sample,
        "cms_topn_doc_tokens": q_cms_topn_doc_tokens,
        "cms_topn_frequency_probe": q_cms_topn_frequency_probe,
        "tdigest_median_by_type": q_tdigest_median_by_type,
        "mms_user_masks": q_mms_user_masks,
        "stream_event_type_counts": q_stream_event_type_counts,
        "stream_dedup": q_stream_dedup,
        "grouped_user_days": q_grouped_user_days,
        "cms_vocab_gate": q_cms_vocab_gate,
        "media_pixel_stats": q_media_pixel_stats,
        "tpch_q1_pricing": q_tpch_q1_pricing,
        "top_nations_revenue": q_top_nations_revenue,
        "tfidf_top_terms": q_tfidf_top_terms,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        # --- r7-recorded tail (positions 50-70) — in-window twins above ---
        "jaccard_pairs": q_jaccard_pairs,
        "lang_id": q_lang_id,
        "simhash_docs": q_simhash_docs,
        "corpus_profile": q_corpus_profile,
        "grouped_kll_quantiles_direct": q_grouped_kll_quantiles_direct,
        "grouped_user_freq": q_grouped_user_freq,
        "incremental_dedup": q_incremental_dedup,
        "doc_fingerprints": q_doc_fingerprints,
        "doc_chunks": q_doc_chunks,
        "quality_score": q_quality_score,
        "repetition_stats": q_repetition_stats,
        "contamination_report": q_contamination_report,
        "cms_topn_union_partials": q_cms_topn_union_partials,
        "hll_distinct_parts": q_hll_distinct_parts,
        "kll_price_quantiles": q_kll_price_quantiles,
        "events_unpivot": q_events_unpivot,
        "stream_keyed_topn": q_stream_keyed_topn,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "cosine_near_dup_pairs": q_cosine_near_dup_pairs,
        "session_window_counts": q_session_window_counts,
    }


def oracle_sql() -> dict[str, str]:
    return {name: _ordered_sql(name, sql) for name, sql in _raw_oracle_sql().items()}


def _raw_oracle_sql() -> dict[str, str]:
    from cms_topn_spark.operators import pipeline

    jaccard = dedup.jaccard_pairs_sql("documents", 0.8)
    sql = {
        "asof_join_events": """
            WITH p AS (
              SELECT event_id, user_id, epoch_us(ts) AS ts_us
              FROM events WHERE event_type = 'purchase'
            ), c AS (
              SELECT user_id, epoch_us(ts) AS click_ts_us,
                     event_id AS click_id, value AS click_value
              FROM events WHERE event_type = 'click'
            )
            SELECT p.event_id, p.user_id, p.ts_us,
                   coalesce(c.click_ts_us, -1) AS click_ts_us,
                   coalesce(c.click_id, -1) AS click_id,
                   coalesce(c.click_value, 0.0) AS click_value
            FROM p LEFT JOIN c
              ON c.user_id = p.user_id AND c.click_ts_us <= p.ts_us
            QUALIFY row_number() OVER (
              PARTITION BY p.event_id
              ORDER BY c.click_ts_us DESC NULLS LAST, c.click_id DESC NULLS LAST
            ) = 1
        """,
        "range_join_attribution": """
            WITH p AS (
              SELECT event_id, epoch_us(ts) AS ts_us
              FROM events WHERE event_type = 'purchase'
            ), c AS (
              SELECT epoch_us(ts) AS us FROM events WHERE event_type = 'click'
            )
            SELECT p.event_id, count(c.us)::BIGINT AS n_clicks
            FROM p LEFT JOIN c
              ON c.us >= p.ts_us - 3600000000 AND c.us < p.ts_us
            GROUP BY p.event_id
        """,
        "stream_interval_join": """
            WITH p AS (
              SELECT event_id AS p_event_id, user_id, ts
              FROM events WHERE event_type = 'purchase'
            ), c AS (
              SELECT event_id AS c_event_id, user_id, ts AS cts
              FROM events WHERE event_type = 'click'
            )
            SELECT p.p_event_id, c.c_event_id
            FROM p JOIN c ON p.user_id = c.user_id
             AND c.cts >= p.ts - INTERVAL 24 HOUR AND c.cts < p.ts
        """,
        "partition_pruned_scan": """
            SELECT user_id, count(*)::BIGINT AS n_clicks
            FROM events WHERE event_type = 'click' GROUP BY user_id
        """,
        "events_rollup": """
            SELECT coalesce(event_type, 'ALL') AS event_type,
                   coalesce(epoch_us(ts) // 86400000000, -1) AS day,
                   (grouping(event_type) * 2
                    + grouping(epoch_us(ts) // 86400000000))::BIGINT AS lvl,
                   count(*)::BIGINT AS n
            FROM events
            GROUP BY ROLLUP(event_type, epoch_us(ts) // 86400000000)
        """,
        "events_unpivot": """
            WITH u AS (SELECT DISTINCT user_id FROM events),
            t AS (
              SELECT unnest(['click','view','purchase','signup','error'])
                     AS event_type
            ),
            c AS (
              SELECT user_id, event_type, count(*)::BIGINT AS n
              FROM events GROUP BY 1, 2
            )
            SELECT u.user_id, t.event_type, coalesce(c.n, 0)::BIGINT AS n
            FROM u CROSS JOIN t
            LEFT JOIN c ON c.user_id = u.user_id AND c.event_type = t.event_type
        """,
        "session_window_counts": """
            -- both window clauses order by (us, event_id): two
            -- independently-sorted windows could place duplicate-timestamp
            -- rows differently and split a session's is_new flag from its
            -- running sum (session membership itself is tie-independent —
            -- a 0 gap always merges — but the oracle must be deterministic)
            WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
            marked AS (
              SELECT user_id, event_id, us,
                     CASE WHEN us - lag(us) OVER w IS NULL
                               OR us - lag(us) OVER w > 1800000000
                          THEN 1 ELSE 0 END AS is_new
              FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
            ),
            sess AS (
              SELECT user_id, us,
                     sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                                       ROWS UNBOUNDED PRECEDING) AS sid
              FROM marked
            )
            SELECT user_id, min(us) AS session_start_us,
                   count(*)::BIGINT AS n_events
            FROM sess GROUP BY user_id, sid
        """,
        "events_pivot": """
            SELECT user_id,
                   count(*) FILTER (event_type = 'click')::BIGINT AS click,
                   count(*) FILTER (event_type = 'view')::BIGINT AS view,
                   count(*) FILTER (event_type = 'purchase')::BIGINT AS purchase,
                   count(*) FILTER (event_type = 'signup')::BIGINT AS signup,
                   count(*) FILTER (event_type = 'error')::BIGINT AS error
            FROM events GROUP BY user_id
        """,
        "bucketed_orders_join": """
            SELECT o_orderkey AS k, count(*)::BIGINT AS n_items,
                   count(DISTINCT l_suppkey)::BIGINT AS n_suppliers
            FROM orders JOIN lineitem ON l_orderkey = o_orderkey
            GROUP BY 1
        """,
        "stream_keyed_quantiles": """
            SELECT event_type AS key, count(value)::BIGINT AS n,
                   quantile_cont(value, 0.25) AS q25,
                   quantile_cont(value, 0.5)  AS q50,
                   quantile_cont(value, 0.75) AS q75
            FROM events GROUP BY 1
        """,
        "cms_topn_event_types": """
            SELECT event_type AS item, count(*)::BIGINT AS frequency
            FROM events GROUP BY event_type ORDER BY frequency DESC LIMIT 5
        """,
        "cms_topn_doc_tokens": """
            WITH tok AS (SELECT unnest(string_split(text, ' ')) AS item FROM documents)
            SELECT item, count(*)::BIGINT AS frequency FROM tok
            GROUP BY item ORDER BY frequency DESC, item LIMIT 20
        """,
        "cms_topn_frequency_probe": """
            SELECT user_id, count(*)::BIGINT AS frequency
            FROM events WHERE user_id < 50 GROUP BY user_id
        """,
        "cms_topn_union_partials": """
            SELECT event_type AS item, count(*)::BIGINT AS frequency
            FROM events GROUP BY event_type ORDER BY frequency DESC LIMIT 3
        """,
        "hll_distinct_parts": """
            SELECT count(DISTINCT l_partkey)::BIGINT AS distinct_parts FROM lineitem
        """,
        "hll_users_by_type": """
            SELECT event_type, count(DISTINCT user_id)::BIGINT AS distinct_users
            FROM events GROUP BY event_type
        """,
        "kll_length_gate": """
            WITH lens AS (
              SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tokens
              FROM documents
            ),
            q AS (
              SELECT quantile_cont(n_tokens, 0.25) AS lo,
                     quantile_cont(n_tokens, 0.75) AS hi
              FROM lens
            )
            SELECT doc_id, n_tokens FROM lens, q
            WHERE n_tokens BETWEEN lo AND hi
        """,
        "kll_price_quantiles": """
            SELECT quantile_cont(l_extendedprice, 0.25) AS q25,
                   quantile_cont(l_extendedprice, 0.5)  AS q50,
                   quantile_cont(l_extendedprice, 0.75) AS q75,
                   quantile_cont(l_extendedprice, 0.9)  AS q90
            FROM lineitem
        """,
        "tdigest_median_by_type": """
            SELECT event_type, quantile_cont(value, 0.5) AS median_value
            FROM events GROUP BY event_type
        """,
        "bloom_customer_semijoin": """
            SELECT count(*)::BIGINT AS matched_customers FROM customer
            WHERE c_custkey IN (SELECT o_custkey FROM orders)
        """,
        "mms_user_masks": f"""
            SELECT user_id, bit_or({_MASK_EXPR})::BIGINT AS mask
            FROM events WHERE user_id < 30 GROUP BY user_id
        """,
        "stream_event_type_counts": """
            SELECT event_type AS item, count(*)::BIGINT AS frequency
            FROM events GROUP BY event_type ORDER BY frequency DESC LIMIT 5
        """,
        "stream_keyed_topn": """
            WITH c AS (
              SELECT event_type, user_id, count(*) AS n
              FROM events GROUP BY event_type, user_id
            )
            SELECT event_type AS key, sum(n)::BIGINT AS total,
                   max(n)::BIGINT AS top_freq
            FROM c GROUP BY event_type
        """,
        "stream_windowed_topn": """
            SELECT epoch(date_trunc('day', ts))::BIGINT AS window_start,
                   event_type AS item, count(*)::BIGINT AS frequency
            FROM events GROUP BY window_start, item
        """,
        "stream_dedup": """
            SELECT DISTINCT md5(text) AS digest FROM documents
        """,
        "grouped_topn": """
            WITH b AS (
              SELECT event_type,
                     (length(bin(user_id + 2)) - 1)::BIGINT AS item,
                     count(*) AS c
              FROM events GROUP BY 1, 2
            ),
            r AS (
              SELECT event_type, item, c,
                     row_number() OVER (
                       PARTITION BY event_type ORDER BY c DESC, item
                     ) AS rk
              FROM b
            )
            SELECT event_type, item, c::BIGINT AS frequency
            FROM r WHERE rk <= 3
        """,
        "grouped_kll_quantiles": """
            SELECT user_id,
                   quantile_cont(value, 0.25) AS q25,
                   quantile_cont(value, 0.5)  AS q50,
                   quantile_cont(value, 0.75) AS q75
            FROM events GROUP BY user_id
        """,
        # identical semantics through the columnar-direct ingest — same oracle
        "grouped_kll_quantiles_direct": """
            SELECT user_id,
                   quantile_cont(value, 0.25) AS q25,
                   quantile_cont(value, 0.5)  AS q50,
                   quantile_cont(value, 0.75) AS q75
            FROM events GROUP BY user_id
        """,
        # the pushed-down filter is the ONLY difference from the direct form
        "grouped_kll_quantiles_filtered": """
            SELECT user_id,
                   quantile_cont(value, 0.25) AS q25,
                   quantile_cont(value, 0.5)  AS q50,
                   quantile_cont(value, 0.75) AS q75
            FROM events WHERE event_type = 'click' GROUP BY user_id
        """,
        "grouped_user_days": """
            SELECT user_id,
                   count(DISTINCT epoch_us(ts) // 86400000000)::BIGINT AS active_days
            FROM events GROUP BY user_id
        """,
        "media_pixel_stats": _media_stats_sql(),
        "cms_vocab_gate": """
            WITH tok AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
            ),
            tf AS (SELECT t, count(*) AS c FROM tok GROUP BY t)
            SELECT doc_id, count(*)::BIGINT AS n_tokens,
                   sum(CASE WHEN tf.c < 10 THEN 1 ELSE 0 END)::BIGINT AS n_rare_tokens
            FROM tok JOIN tf USING (t) GROUP BY doc_id
        """,
        "grouped_user_freq": """
            SELECT event_type, user_id, count(*)::BIGINT AS frequency
            FROM events WHERE user_id < 10 GROUP BY event_type, user_id
        """,
        "user_sessions": _sessions_sql(),
        "tpch_q1_pricing": """
            SELECT l_returnflag, l_linestatus,
                   sum(l_quantity)::BIGINT AS sum_qty,
                   sum(round(l_extendedprice * 100))::BIGINT AS sum_base_cents,
                   sum(round(l_discount * 100))::BIGINT AS sum_disc_pct,
                   count(*)::BIGINT AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "top_nations_revenue": """
            SELECT n_name,
                   sum(round(o_totalprice * 100))::BIGINT AS revenue_cents,
                   count(*)::BIGINT AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "token_stats": textops.token_stats_sql(),
        "lang_id": textops.lang_id_sql(),
        "lang_id_ngram": textops.lang_id_ngram_sql(),
        "quality_score": textops.quality_score_sql(),
        "repetition_stats": textops.repetition_stats_sql(),
        "doc_fingerprints": textops.fingerprints_sql(),
        "tfidf_top_terms": textops.tfidf_top_terms_sql(k=3),
        "exact_dedup": dedup.exact_dedup_sql(),
        # bloom anti-join vs the exact NOT-IN: at fpp=1e-9 the expected
        # false-positive drop count is ~5e-7 rows on this corpus, so the
        # filter's output equals the exact set (same philosophy as the
        # collision-negligible sketch widths)
        "incremental_dedup": """
            WITH old AS (
              SELECT md5(text) AS digest FROM documents WHERE doc_id % 3 <> 0
            ),
            new AS (
              SELECT doc_id, md5(text) AS digest FROM documents
              WHERE doc_id % 3 = 0
            )
            SELECT doc_id, digest FROM new
            WHERE digest NOT IN (SELECT digest FROM old)
        """,
        # incremental path == batch-touching subset of the exact all-pairs
        # operator (32×4 banding miss prob < 1e-7 at s=0.8, as minhash_lsh_pairs)
        "incremental_near_dup": (
            f"SELECT * FROM ({dedup.jaccard_pairs_sql('documents', 0.8)})"
            " WHERE a_id % 3 = 0 OR b_id % 3 = 0"
        ),
        # batching-invariant: the stream's accumulated pairs == ALL corpus
        # near-dup pairs (see q_stream_near_dup) — the full jaccard oracle
        "stream_near_dup": jaccard,
        "doc_chunks": textops.chunk_documents_sql(
            "documents", chunk_tokens=32, stride=16
        ),
        "corpus_profile": """
            WITH tok AS (
              SELECT unnest(string_split(text, ' ')) AS t FROM documents
            ),
            tc AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
            top1 AS (SELECT t, c FROM tc ORDER BY c DESC, t LIMIT 1),
            lens AS (
              SELECT len(string_split(text, ' '))::DOUBLE AS n FROM documents
            )
            SELECT
              (SELECT count(DISTINCT text) FROM documents)::BIGINT AS distinct_texts,
              (SELECT count(*) FROM tok)::BIGINT AS total_tokens,
              (SELECT t FROM top1) AS top_token,
              (SELECT c FROM top1)::BIGINT AS top_token_freq,
              (SELECT quantile_cont(n, 0.25) FROM lens) AS len_q25,
              (SELECT quantile_cont(n, 0.5) FROM lens) AS len_q50,
              (SELECT quantile_cont(n, 0.75) FROM lens) AS len_q75
        """,
        "fingerprint_decontamination": dedup.fingerprint_contamination_sql(
            "SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0",
            "SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0",
            window=4,
        ),
        "contamination_report": dedup.contamination_report_sql(
            "SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0",
            "SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0",
            threshold_ppm=900_000,
        ),
        "jaccard_pairs": jaccard,
        "jaccard_pairs_pruned": dedup.jaccard_pairs_pruned_sql(
            "documents", 0.8, JACCARD_MAX_DF
        ),
        "minhash_lsh_pairs": jaccard,
        "dup_clusters": dedup.duplicate_clusters_sql(jaccard),
        "ann_brute_topk": similarity.brute_force_topk_sql(ANN_QUERY_IDS, k=5),
        # multi-probe h=3 ⇒ recall 1.0 (measured both SFs) ⇒ equals brute force
        "ann_lsh_topk": similarity.brute_force_topk_sql(ANN_QUERY_IDS, k=5),
        # full-probe IVF = brute force by construction (see q_ann_ivf_topk)
        "ann_ivf_topk": similarity.brute_force_topk_sql(ANN_QUERY_IDS, k=5),
        # build-once-load-query lifecycles, same full-probe exactness regimes
        "ann_ivf_built_topk": similarity.brute_force_topk_sql(ANN_QUERY_IDS, k=5),
        "ann_lsh_built_topk": similarity.brute_force_topk_sql(ANN_QUERY_IDS, k=5),
        # sublinear LSH on the planted-duplicate corpus vs brute force over
        # the SAME corpus (cosine-identical dup ⇒ recall 1.0 by construction)
        "ann_lsh_planted_topk": similarity.brute_force_topk_sql(
            ANN_QUERY_IDS,
            k=1,
            table="planted",
            prelude=f"""planted AS (
              SELECT vec_id, embedding FROM embeddings
              UNION ALL
              SELECT vec_id + {PLANTED_NN_OFFSET},
                     list_transform(embedding, x -> x * 2)
              FROM embeddings
              WHERE vec_id IN ({", ".join(str(i) for i in ANN_QUERY_IDS)})
            ), """,
        ),
        # sublinear IVF (n_probe=1 of 16 cells) on the identical-copy planted
        # corpus vs brute force over the same corpus (L2-identical copy ⇒
        # same cell under any centroids ⇒ recall 1.0 by construction)
        "ann_ivf_planted_topk": similarity.brute_force_topk_sql(
            ANN_QUERY_IDS,
            k=1,
            table="planted",
            prelude=f"""planted AS (
              SELECT vec_id, embedding FROM embeddings
              UNION ALL
              SELECT vec_id + {PLANTED_NN_OFFSET}, embedding
              FROM embeddings
              WHERE vec_id IN ({", ".join(str(i) for i in ANN_QUERY_IDS)})
            ), """,
        ),
        "cosine_near_dup_pairs": similarity.cosine_near_dup_pairs_sql(COSINE_DUP_THRESHOLD),
        # bucketed LSH on the planted-duplicate corpus vs the exact all-pairs
        # scan over the SAME corpus (cosine-identical dup ⇒ every planted
        # pair collides in every table ⇒ recall 1.0 by construction; no
        # natural pair reaches the 0.95 threshold)
        "cosine_lsh_planted_pairs": similarity.cosine_near_dup_pairs_sql(
            COSINE_PLANTED_THRESHOLD,
            table="planted",
            prelude=f"""planted AS (
              SELECT vec_id, embedding FROM embeddings
              UNION ALL
              SELECT vec_id + {PLANTED_NN_OFFSET},
                     list_transform(embedding, x -> x * 2)
              FROM embeddings
              WHERE vec_id IN ({", ".join(str(i) for i in ANN_QUERY_IDS)})
            ), """,
        ),
        # full winnowing / simhash schemes recomputed in SQL (splitmix64 via
        # HUGEINT modular multiplies) — bit-exact vs the Spark operators
        "winnow_fingerprints": dedup.winnow_fingerprints_sql(),
        "simhash_docs": dedup.simhash_sql(),
        "simhash_near_pairs": dedup.simhash_near_pairs_sql(max_hamming=3),
        "curate_corpus": _pipeline_sql(),
        "seq_packing": pipeline.pack_documents_sql(max_tokens=256, n_buckets=8),
        "stratified_sample": _stratified_sample_sql(),
    }
    # the direct-ingest twin gates the SAME statistics — alias, don't copy,
    # so the two oracles can never silently diverge
    sql["corpus_profile_direct"] = sql["corpus_profile"]
    return sql


def _media_stats_sql() -> str:
    from cms_topn_spark.operators.multimodal import media_pixel_stats_sql

    return media_pixel_stats_sql(MEDIA_GATE_N, every=2)


def _pipeline_sql() -> str:
    from cms_topn_spark.operators import pipeline

    return pipeline.curate_sql()


def _sessions_sql() -> str:
    from cms_topn_spark.operators.sessions import sessionize_sql

    return sessionize_sql()


def _stratified_sample_sql() -> str:
    from cms_topn_spark.operators import pipeline
    from cms_topn_spark.operators.textops import lang_pred_sql

    inner = pipeline.stratified_sample_sql("labeled", SAMPLE_FRACTIONS, "pred_lang")
    return f"""
    WITH labeled AS (
      SELECT doc_id, text, {lang_pred_sql("text")} AS pred_lang FROM documents
    )
    SELECT doc_id, pred_lang FROM ({inner})
    """
