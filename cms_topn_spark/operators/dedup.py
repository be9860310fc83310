"""Deduplication operators for training-data pipelines.

Four families, each with the partitioning/shuffle story a 100 TB corpus needs:

- **exact**: hash-groupBy on the content (or its md5 for wide rows). One
  shuffle on a uniformly-distributed key — the optimal plan; AQE handles
  stragglers.
- **n-gram Jaccard (exact)**: char-k-gram shingles → inverted-index self-join
  on shingle → per-pair intersection counts vs set sizes. The join key is the
  shingle hash (64-bit), so the shuffle is uniform; at web scale you add
  document-frequency pruning of ubiquitous shingles (flagged below).
- **MinHash+LSH**: 128 permutations, 32 bands × 4 rows — candidate pairs come
  from band-bucket joins (tiny shuffle), then exact-Jaccard verification.
  This is the scale path: cost is O(docs · shingles) + O(candidates), never
  O(docs²).
- **SimHash**: 64-bit signature; near-dups = signatures at Hamming distance
  ≤ k found by pigeonhole banding of the signature.

Shingle hashing uses the library's Murmur3 kernel; minhash permutations are
splitmix64-derived affine maps — everything deterministic, no RNG state.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.murmur import hash128
from ..sources.webpages import _splitmix64  # deterministic counter-based hash

U64 = np.uint64
SHINGLE_K = 8
N_PERM = 128
N_BANDS = 32
ROWS_PER_BAND = N_PERM // N_BANDS
_MERSENNE = (1 << 61) - 1


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact duplicate groups: keep the min id per distinct content."""
    return df.groupBy(text_col).agg(
        F.min(id_col).alias(id_col), F.count("*").cast("long").alias("copies")
    ).select(id_col, "copies")


def exact_dedup_sql(table: str = "documents") -> str:
    return f"SELECT min(doc_id) AS doc_id, count(*)::BIGINT AS copies FROM {table} GROUP BY text"


# ---------------------------------------------------------------- shingles


def shingle_expr(text_col: str, k: int = SHINGLE_K) -> F.Column:
    """Distinct char-k-gram shingles as an array column (pure Catalyst)."""
    return F.expr(
        f"array_distinct(transform(sequence(1, greatest(length({text_col}) - {k - 1}, 1)),"
        f" i -> substring({text_col}, i, {k})))"
    )


def _shingle_sql(k: int = SHINGLE_K) -> str:
    # DuckDB list comprehension; greatest(..., 2) keeps short texts non-empty
    return (
        f"list_distinct([text[i:i+{k - 1}] for i in range(1, greatest(len(text) - {k - 2}, 2))])"
    )


def jaccard_pairs_exact(
    df: DataFrame, threshold: float = 0.8, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via inverted-index self-join.

    Scale note: the self-join key is the shingle; at 100 TB you first drop
    shingles with document frequency above a cutoff (they only ever connect
    already-connected dup groups) — omitted here because the correctness
    oracle must see identical semantics."""
    sh = df.select(
        F.col(id_col), F.explode(shingle_expr(text_col)).alias("g")
    )
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("a_id"), F.col(f"b.{id_col}").alias("b_id"))
        .agg(F.count("*").alias("i"))
    )
    sa = sizes.select(F.col(id_col).alias("a_id"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col(id_col).alias("b_id"), F.col("sz").alias("szb"))
    return (
        inter.join(F.broadcast(sa), "a_id")
        .join(F.broadcast(sb), "b_id")
        .where(F.col("i") / (F.col("sza") + F.col("szb") - F.col("i")) >= threshold)
        .select("a_id", "b_id")
    )


def jaccard_pairs_sql(table: str = "documents", threshold: float = 0.8) -> str:
    return f"""
    WITH sh AS (
      SELECT doc_id, unnest({_shingle_sql()}) AS g FROM {table}
    ),
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
      FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT a_id, b_id
    FROM inter
    JOIN sizes sa ON sa.doc_id = a_id
    JOIN sizes sb ON sb.doc_id = b_id
    WHERE i * 1.0 / (sa.sz + sb.sz - i) >= {threshold}
    """


# ---------------------------------------------------------------- minhash


def _perm_params() -> tuple[np.ndarray, np.ndarray]:
    idx = np.arange(N_PERM, dtype=np.int64)
    a = (_splitmix64(idx * 2 + 1) % U64(_MERSENNE - 1)) + U64(1)
    b = _splitmix64(idx * 2 + 2) % U64(_MERSENNE)
    return a, b


def _minhash_signatures(texts: pd.Series, k: int = SHINGLE_K) -> np.ndarray:
    """(n_docs, N_PERM) uint64 minhash matrix, vectorized per batch."""
    a, b = _perm_params()
    out = np.empty((len(texts), N_PERM), dtype=U64)
    for row, t in enumerate(texts):
        t = t or ""
        n = max(len(t) - k + 1, 1)
        grams = list({t[i : i + k] for i in range(n)})
        data = "".join(grams).encode("utf-8")
        lens = np.array([len(g.encode("utf-8")) for g in grams], dtype=np.int64)
        offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
        h1, _ = hash128(data, offs, lens)
        hv = (h1 % U64(_MERSENNE)).astype(U64)
        # perm p: min over grams of (a_p * h + b_p) mod M  — outer, vectorized
        vals = (hv[:, None] * a[None, :] + b[None, :]) % U64(_MERSENNE)
        out[row] = vals.min(axis=0)
    return out


def minhash_band_keys(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, band, key): one row per band, key = hash of the band's rows."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            pdf = rb.to_pandas()
            sig = _minhash_signatures(pdf[text_col])
            n = len(pdf)
            bands = sig.reshape(n, N_BANDS, ROWS_PER_BAND)
            # band key: splitmix of the band rows folded together
            key = bands[:, :, 0]
            for r in range(1, ROWS_PER_BAND):
                key = _splitmix64(key ^ bands[:, :, r])
            ids = np.repeat(pdf[id_col].to_numpy(), N_BANDS)
            band_idx = np.tile(np.arange(N_BANDS), n)
            yield pa.RecordBatch.from_pydict(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "band": pa.array(band_idx, pa.int32()),
                    "key": pa.array(key.ravel().astype(np.int64), pa.int64()),
                }
            )

    return df.select(id_col, text_col).mapInArrow(fn, "doc_id long, band int, key long")


def minhash_lsh_pairs(
    df: DataFrame, threshold: float = 0.8, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """MinHash-LSH candidates + exact-Jaccard verification.

    With 32 bands × 4 rows, a pair at true similarity s is missed with
    probability (1-s⁴)³², < 1e-7 at s=0.8 — at the verification threshold the
    candidate set is effectively lossless, so the output equals the exact
    operator (and shares its oracle)."""
    bands = minhash_band_keys(df, id_col, text_col)
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
    )
    # verify candidates with exact jaccard over shingle sets
    sh = df.select(F.col(id_col), shingle_expr(text_col).alias("gs"))
    av = sh.select(F.col(id_col).alias("a_id"), F.col("gs").alias("gs_a"))
    bv = sh.select(F.col(id_col).alias("b_id"), F.col("gs").alias("gs_b"))
    verified = (
        cand.join(av, "a_id")
        .join(bv, "b_id")
        .withColumn("i", F.size(F.array_intersect("gs_a", "gs_b")))
        .withColumn("u", F.size("gs_a") + F.size("gs_b") - F.col("i"))
        .where(F.col("i") / F.col("u") >= threshold)
        .select("a_id", "b_id")
    )
    return verified


# ---------------------------------------------------------------- simhash


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash per document over char shingles (Charikar 2002)."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            pdf = rb.to_pandas()
            sigs = np.empty(len(pdf), dtype=np.int64)
            for row, t in enumerate(pdf[text_col]):
                t = t or ""
                n = max(len(t) - SHINGLE_K + 1, 1)
                grams = list({t[i : i + SHINGLE_K] for i in range(n)})
                data = "".join(grams).encode("utf-8")
                lens = np.array([len(g.encode("utf-8")) for g in grams], dtype=np.int64)
                offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
                h1, _ = hash128(data, offs, lens)
                bits = (h1[:, None] >> np.arange(64, dtype=U64)[None, :]) & U64(1)
                votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
                sig = np.where(votes > 0, np.uint64(1), np.uint64(0))
                sigs[row] = int((sig << np.arange(64, dtype=U64)).sum(dtype=U64).astype(np.int64))
            yield pa.RecordBatch.from_pydict(
                {
                    "doc_id": pa.array(pdf[id_col].to_numpy(), pa.int64()),
                    "simhash": pa.array(sigs, pa.int64()),
                }
            )

    return df.select(id_col, text_col).mapInArrow(fn, "doc_id long, simhash long")


def simhash_near_pairs(df: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs at Hamming ≤ k via pigeonhole banding: split the 64-bit
    signature into k+1 chunks, join on any exact-matching chunk, then verify
    the full Hamming distance — O(candidates), never O(n²)."""
    sigs = simhash(df)
    chunks = max_hamming + 1
    width = 64 // chunks
    parts = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned(F.col("simhash"), c * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("key"),
                    )
                    for c in range(chunks)
                ]
            )
        ).alias("p"),
    ).select("doc_id", "simhash", "p.chunk", "p.key")
    a, b = parts.alias("a"), parts.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            F.col("a.simhash").alias("sa"),
            F.col("b.simhash").alias("sb"),
        )
        .distinct()
    )
    return cand.where(
        F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))) <= max_hamming
    ).select("a_id", "b_id")
