"""Parquet footer metadata helpers — statistics without scanning data.

Row counts live in every parquet footer; reading them costs one small
metadata fetch per file instead of a full table scan. This is how operators
that need an input-size estimate up front (e.g. Bloom filter capacity in
``bloom_semi_join``) avoid the double-scan anti-pattern of ``df.count()``
followed by the real pass.
"""

from __future__ import annotations

import pyarrow.dataset as ds


def parquet_row_count(path: str) -> int:
    """Exact row count of a parquet file/directory from footers only."""
    return ds.dataset(path, format="parquet").count_rows()
