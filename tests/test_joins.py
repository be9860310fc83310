"""as-of join + binned range join: DuckDB parity, determinism, plan shape."""

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cms_topn_spark.operators.joins import asof_join, range_join_pairs
from cms_topn_spark.plans.bucketing import exchange_count


def _frames(seed=7, n_l=400, n_r=300):
    rng = np.random.default_rng(seed)
    lpd = pd.DataFrame(
        {
            "k": rng.integers(0, 12, n_l),
            "lt": rng.integers(0, 1000, n_l).astype("int64"),
            "lid": np.arange(n_l, dtype="int64"),
        }
    )
    rpd = pd.DataFrame(
        {
            "k": rng.integers(0, 12, n_r),
            "rt": rng.integers(0, 1000, n_r).astype("int64"),
            "rid": np.arange(n_r, dtype="int64"),
            "val": rng.normal(size=n_r),
        }
    )
    # legitimate NULL payloads: would expose per-column last() row tearing
    rpd.loc[rng.integers(0, n_r, 20), "val"] = None
    # forced (k, rt) ties: the rid tiebreak must decide
    rpd.loc[5:9, ["k", "rt"]] = rpd.loc[0:4, ["k", "rt"]].values
    return lpd, rpd


def _duck_asof(lpd, rpd, extra_pred=""):
    con = duckdb.connect()
    con.register("l", lpd)
    con.register("r", rpd)
    return (
        con.execute(
            f"""
            SELECT l.k, l.lt, l.lid, r.rt, r.rid, r.val
            FROM l LEFT JOIN r ON r.k = l.k AND r.rt <= l.lt {extra_pred}
            QUALIFY row_number() OVER (
              PARTITION BY l.lid ORDER BY r.rt DESC NULLS LAST, r.rid DESC NULLS LAST
            ) = 1
            ORDER BY lid
            """
        )
        .df()
        .reset_index(drop=True)
    )


def test_asof_join_duckdb_parity(spark):
    lpd, rpd = _frames()
    out = (
        asof_join(
            spark.createDataFrame(lpd),
            spark.createDataFrame(rpd),
            on="k",
            left_time="lt",
            right_time="rt",
            right_tiebreak="rid",
        )
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    assert out["rt"].isna().sum() > 0, "want some unmatched lefts in the fixture"
    pd.testing.assert_frame_equal(
        out[["k", "lt", "lid", "rt", "rid", "val"]],
        _duck_asof(lpd, rpd),
        check_dtype=False,
    )


def test_asof_join_tolerance(spark):
    lpd, rpd = _frames(seed=11)
    out = (
        asof_join(
            spark.createDataFrame(lpd),
            spark.createDataFrame(rpd),
            on="k",
            left_time="lt",
            right_time="rt",
            right_tiebreak="rid",
            tolerance=50,
        )
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    exp = _duck_asof(lpd, rpd, extra_pred="AND l.lt - r.rt <= 50")
    assert out["rt"].notna().sum() < len(out)  # tolerance actually filters
    pd.testing.assert_frame_equal(
        out[["k", "lt", "lid", "rt", "rid", "val"]], exp, check_dtype=False
    )


def test_asof_join_partitioning_invariance(spark):
    lpd, rpd = _frames(seed=23)
    l, r = spark.createDataFrame(lpd), spark.createDataFrame(rpd)
    a = (
        asof_join(l, r, on="k", left_time="lt", right_time="rt", right_tiebreak="rid")
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    b = (
        asof_join(
            l.repartition(7, "lid"),
            r.repartition(3),
            on="k",
            left_time="lt",
            right_time="rt",
            right_tiebreak="rid",
        )
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_asof_join_single_exchange(spark):
    """Both inputs shuffle in ONE exchange (union before the window)."""
    lpd, rpd = _frames()
    out = asof_join(
        spark.createDataFrame(lpd),
        spark.createDataFrame(rpd),
        on="k",
        left_time="lt",
        right_time="rt",
        right_tiebreak="rid",
    )
    assert exchange_count(out) == 1


def test_asof_join_null_key_and_null_time_semantics(spark):
    """SQL join semantics: NULL = NULL never matches, NULL <= t never
    matches — a NULL-key or NULL-time right row must not be returned."""
    lpd = pd.DataFrame({"k": pd.array([1, None], dtype="Int64"), "lt": [10, 10], "lid": [0, 1]})
    rpd = pd.DataFrame(
        {
            "k": pd.array([1, None], dtype="Int64"),
            "rt": pd.array([None, 1], dtype="Int64"),
            "rid": [7, 8],
        }
    )
    out = (
        asof_join(
            spark.createDataFrame(lpd),
            spark.createDataFrame(rpd),
            on="k",
            left_time="lt",
            right_time="rt",
            right_tiebreak="rid",
        )
        .toPandas()
        .sort_values("lid")
    )
    # row 0: only right row with k=1 has NULL rt -> no match
    # row 1: only right row with NULL k -> no match (and left row survives)
    assert len(out) == 2
    assert out["rid"].isna().all()


def test_asof_join_reserved_names(spark):
    lpd, rpd = _frames()
    l, r = spark.createDataFrame(lpd), spark.createDataFrame(rpd)
    with pytest.raises(ValueError, match="reserved"):
        asof_join(l.withColumn("__asof_t", F.lit(1)), r, on="k", left_time="lt", right_time="rt")


def test_asof_join_validation(spark):
    lpd, rpd = _frames()
    l, r = spark.createDataFrame(lpd), spark.createDataFrame(rpd)
    with pytest.raises(ValueError, match="disjoint"):
        asof_join(l, r.withColumnRenamed("rt", "lt"), on="k", left_time="lt", right_time="lt")
    with pytest.raises(ValueError, match="key column"):
        asof_join(l, r, on="nope", left_time="lt", right_time="rt")
    with pytest.raises(ValueError, match="right_tiebreak"):
        asof_join(l, r, on="k", left_time="lt", right_time="rt", right_tiebreak="k")
    with pytest.raises(ValueError, match="numeric time"):
        asof_join(
            l,
            r.withColumn("rt", F.col("rt").cast("string")),
            on="k",
            left_time="lt",
            right_time="rt",
            tolerance=5,
        )


def _range_frames(seed=3):
    rng = np.random.default_rng(seed)
    ppd = pd.DataFrame(
        {
            "pt": np.concatenate(
                [rng.integers(0, 1000, 300), np.array([0, 100, 200, 299, 300, 999])]
            ).astype("int64")
        }
    )
    ppd["pid"] = np.arange(len(ppd), dtype="int64")
    ipd = pd.DataFrame(
        {
            # edge intervals: empty (150,150), one-wide (500,501), bin-aligned
            # (100,200), spanning (0,1000), tail-overhang (990,1005)
            "s": np.array([100, 150, 0, 990, 500, 500], dtype="int64"),
            "e": np.array([200, 150, 1000, 1005, 530, 501], dtype="int64"),
        }
    )
    ipd["iid"] = np.arange(len(ipd), dtype="int64")
    return ppd, ipd


@pytest.mark.parametrize("bin_width", [1, 64, 100, 4096])
def test_range_join_duckdb_parity(spark, bin_width):
    ppd, ipd = _range_frames()
    got = (
        range_join_pairs(
            spark.createDataFrame(ppd),
            "pt",
            spark.createDataFrame(ipd),
            "s",
            "e",
            bin_width=bin_width,
            max_bins_per_interval=2048,
        )
        .toPandas()
        .sort_values(["pid", "iid"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("p", ppd)
    con.register("i", ipd)
    exp = con.execute(
        "SELECT pt, pid, s, e, iid FROM p JOIN i ON pt >= s AND pt < e ORDER BY pid, iid"
    ).df()
    pd.testing.assert_frame_equal(
        got[["pt", "pid", "s", "e", "iid"]], exp.reset_index(drop=True), check_dtype=False
    )


def test_range_join_breaker_fires(spark):
    ppd, ipd = _range_frames()
    p, i = spark.createDataFrame(ppd), spark.createDataFrame(ipd)
    with pytest.raises(Exception, match="spans more than"):
        range_join_pairs(p, "pt", i, "s", "e", bin_width=1, max_bins_per_interval=8).count()


def test_range_join_validation(spark):
    ppd, ipd = _range_frames()
    p, i = spark.createDataFrame(ppd), spark.createDataFrame(ipd)
    with pytest.raises(ValueError, match="bin_width"):
        range_join_pairs(p, "pt", i, "s", "e", bin_width=0)
    with pytest.raises(ValueError, match="must be integer"):
        range_join_pairs(p.withColumn("pt", F.col("pt").cast("double")), "pt", i, "s", "e", 64)
    with pytest.raises(ValueError, match="disjoint"):
        range_join_pairs(p.withColumnRenamed("pid", "iid"), "pt", i, "s", "e", 64)
    with pytest.raises(ValueError, match="reserved"):
        range_join_pairs(p.withColumn("__rj_bin", F.lit(1)), "pt", i, "s", "e", 64)


def test_range_join_negative_times_exact_bins(spark):
    """Floor-division correctness around zero: -1 and 0 land in different
    bins; a truncate-toward-zero div would merge them."""
    ppd = pd.DataFrame({"pt": np.array([-65, -64, -1, 0, 1, 63, 64], dtype="int64")})
    ppd["pid"] = np.arange(len(ppd), dtype="int64")
    ipd = pd.DataFrame(
        {"s": np.array([-64, 0], dtype="int64"), "e": np.array([0, 64], dtype="int64")}
    )
    ipd["iid"] = np.arange(len(ipd), dtype="int64")
    got = (
        range_join_pairs(
            spark.createDataFrame(ppd), "pt", spark.createDataFrame(ipd), "s", "e", 64
        )
        .toPandas()
        .sort_values(["pid", "iid"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("p", ppd)
    con.register("i", ipd)
    exp = con.execute(
        "SELECT pt, pid, s, e, iid FROM p JOIN i ON pt >= s AND pt < e ORDER BY pid, iid"
    ).df()
    pd.testing.assert_frame_equal(
        got[["pt", "pid", "s", "e", "iid"]], exp.reset_index(drop=True), check_dtype=False
    )


def test_range_join_beyond_2_53_raises(spark):
    """Times beyond double-exact range must fail loudly, never misbin."""
    ppd = pd.DataFrame({"pt": np.array([1 << 54], dtype="int64")})
    ppd["pid"] = np.arange(1, dtype="int64")
    ipd = pd.DataFrame(
        {"s": np.array([0], dtype="int64"), "e": np.array([100], dtype="int64")}
    )
    ipd["iid"] = np.arange(1, dtype="int64")
    with pytest.raises(Exception, match="2\\^53"):
        range_join_pairs(
            spark.createDataFrame(ppd), "pt", spark.createDataFrame(ipd), "s", "e", 64
        ).count()


def _duck_asof_forward(lpd, rpd, extra_pred=""):
    con = duckdb.connect()
    con.register("l", lpd)
    con.register("r", rpd)
    return (
        con.execute(
            f"""
            SELECT l.k, l.lt, l.lid, r.rt, r.rid, r.val
            FROM l LEFT JOIN r ON r.k = l.k AND r.rt >= l.lt {extra_pred}
            QUALIFY row_number() OVER (
              PARTITION BY l.lid ORDER BY r.rt ASC NULLS LAST, r.rid ASC NULLS LAST
            ) = 1
            ORDER BY lid
            """
        )
        .df()
        .reset_index(drop=True)
    )


def test_asof_join_forward_duckdb_parity(spark):
    lpd, rpd = _frames(seed=31)
    out = (
        asof_join(
            spark.createDataFrame(lpd),
            spark.createDataFrame(rpd),
            on="k",
            left_time="lt",
            right_time="rt",
            right_tiebreak="rid",
            direction="forward",
        )
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out[["k", "lt", "lid", "rt", "rid", "val"]],
        _duck_asof_forward(lpd, rpd),
        check_dtype=False,
    )


def test_asof_join_forward_tolerance_and_null_left_time(spark):
    lpd, rpd = _frames(seed=37)
    lpd = lpd.copy()
    lpd["lt"] = pd.array(lpd["lt"], dtype="Int64")
    lpd.loc[0:4, "lt"] = None  # NULL left times must match nothing
    out = (
        asof_join(
            spark.createDataFrame(lpd),
            spark.createDataFrame(rpd),
            on="k",
            left_time="lt",
            right_time="rt",
            right_tiebreak="rid",
            tolerance=40,
            direction="forward",
        )
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    exp = _duck_asof_forward(lpd, rpd, extra_pred="AND r.rt - l.lt <= 40")
    assert out.loc[out["lt"].isna(), "rid"].isna().all()
    pd.testing.assert_frame_equal(
        out[["k", "lt", "lid", "rt", "rid", "val"]], exp, check_dtype=False
    )


def test_asof_join_bad_direction(spark):
    lpd, rpd = _frames()
    with pytest.raises(ValueError, match="direction"):
        asof_join(
            spark.createDataFrame(lpd),
            spark.createDataFrame(rpd),
            on="k",
            left_time="lt",
            right_time="rt",
            direction="nearest",
        )


# ---------------------------------------------------------------- fuzzing

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_small = st.integers(min_value=0, max_value=6)
_times = st.one_of(st.none(), st.integers(min_value=0, max_value=12))


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    lrows=st.lists(st.tuples(_small, _times), min_size=1, max_size=12),
    rrows=st.lists(st.tuples(_small, _times), min_size=0, max_size=12),
    direction=st.sampled_from(["backward", "forward"]),
    tolerance=st.one_of(st.none(), st.integers(min_value=0, max_value=6)),
)
def test_asof_join_fuzz_vs_duckdb(spark, lrows, rrows, direction, tolerance):
    """Tie-dense, NULL-dense fuzz: tiny key/time domains force the exact
    collisions (equal times, NULL keys/times, empty right side) the seeded
    parity tests only sample."""
    lpd = pd.DataFrame(
        {
            "k": pd.array([k for k, _ in lrows], dtype="Int64"),
            "lt": pd.array([t for _, t in lrows], dtype="Int64"),
            "lid": np.arange(len(lrows), dtype="int64"),
        }
    )
    rpd = pd.DataFrame(
        {
            "k": pd.array([k for k, _ in rrows], dtype="Int64"),
            "rt": pd.array([t for _, t in rrows], dtype="Int64"),
            "rid": np.arange(len(rrows), dtype="int64"),
        }
    )
    l = spark.createDataFrame(lpd, "k long, lt long, lid long")
    r = spark.createDataFrame(rpd, "k long, rt long, rid long")
    out = (
        asof_join(
            l, r, on="k", left_time="lt", right_time="rt",
            right_tiebreak="rid", tolerance=tolerance, direction=direction,
        )
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    if direction == "backward":
        pred = "r.rt <= l.lt"
        order = "r.rt DESC NULLS LAST, r.rid DESC NULLS LAST"
        tol_pred = "" if tolerance is None else f"AND l.lt - r.rt <= {tolerance}"
    else:
        pred = "r.rt >= l.lt"
        order = "r.rt ASC NULLS LAST, r.rid ASC NULLS LAST"
        tol_pred = "" if tolerance is None else f"AND r.rt - l.lt <= {tolerance}"
    con = duckdb.connect()
    con.register("l", lpd)
    con.register("r", rpd)
    exp = (
        con.execute(
            f"""
            SELECT l.k, l.lt, l.lid, r.rt, r.rid
            FROM l LEFT JOIN r ON r.k = l.k AND {pred} {tol_pred}
            QUALIFY row_number() OVER (PARTITION BY l.lid ORDER BY {order}) = 1
            ORDER BY lid
            """
        )
        .df()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out[["k", "lt", "lid", "rt", "rid"]], exp, check_dtype=False
    )
