"""Per-group sketch aggregation (the GROUP BY form of the sketch UDAFs).

``applyInPandas`` hands each group to a vectorized builder — the right shape
when group cardinality is modest (each group's state stays executor-local).
For very high-cardinality grouping the two-level build (partials keyed by
(group, partition) then union_agg per group) composes from the same pieces;
this helper covers the common analytics case.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame


def groupwise_estimate(
    df: DataFrame,
    group_col: str,
    value_col: str,
    factory: Callable[[], object],
    estimator: Callable[[object], object],
    out_field: str,
    out_type: str,
    type_tag: int | None = None,
) -> DataFrame:
    """One sketch per group → one row (group, estimate)."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = factory()
        vals = pdf[value_col].dropna()
        if len(vals):
            if type_tag is not None:
                sk.add_batch(vals.tolist(), type_tag=type_tag)
            else:
                sk.add_batch(vals.to_numpy())
        return pd.DataFrame({group_col: [pdf[group_col].iloc[0]], out_field: [estimator(sk)]})

    gtype = dict(df.dtypes)[group_col]
    from pyspark.sql import functions as F

    return (
        # NULL group keys dropped (aggregate-skip semantics): the null
        # group's key reaches pandas as NaN and cannot be written back to
        # an int/long group output column
        df.select(group_col, value_col)
        .where(F.col(group_col).isNotNull())
        .groupBy(group_col)
        .applyInPandas(run, f"{group_col} {gtype}, {out_field} {out_type}")
    )
