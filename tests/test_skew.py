"""Skew defense: round-robin salt repartitioning flattens pathological
partition imbalance before the partial build (north rule: "explicit salted
repartitioning to defuse hot-key skew")."""

import numpy as np
from pyspark.sql import functions as F

from cms_topn_spark.core import CmsTopn
from cms_topn_spark.operators.build import build_partials
from cms_topn_spark.sources.webpages import generate_webpages
from cms_topn_spark.sources.webpages import extract_host


def _imbalance(states):
    rows = np.array([r["input_rows"] for r in states if r["input_rows"] > 0])
    return rows.max() / max(rows.mean(), 1)


def test_salt_flattens_hot_key_partitioning(spark):
    pages = generate_webpages(spark, 20000, partitions=8).select(
        extract_host(F.col("url")).alias("h0")
    )
    # adversarial: 90% of rows share one hot key AND the layout co-locates
    # rows by key, so the hot key's partition dwarfs the others
    hosts = pages.select(
        F.when(F.rand(42) < 0.9, F.lit("hot.example.com")).otherwise(F.col("h0")).alias("host")
    )
    skewed = hosts.repartition(8, "host")
    unsalted = build_partials(skewed, lambda: CmsTopn(10, update="linear")).collect()
    salted = build_partials(
        skewed, lambda: CmsTopn(10, update="linear"), salt_partitions=8
    ).collect()
    imb_before = _imbalance(unsalted)
    imb_after = _imbalance(salted)
    assert imb_before > 2.0  # the scenario is genuinely skewed
    assert imb_after < 1.2  # round-robin salt flattens it
    # and the merged result is identical either way (commutative merge)
    from cms_topn_spark.core.base import merge_serialized, sketch_from_bytes

    def merge_all(states):
        acc = None
        for r in states:
            acc = merge_serialized(acc, bytes(r["state"]))
        return sketch_from_bytes(acc)

    a, b = merge_all(unsalted), merge_all(salted)
    assert np.array_equal(a.counters, b.counters)
    assert dict(a.topn_list()) == dict(b.topn_list())
