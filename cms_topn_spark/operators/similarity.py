"""Similarity search over embedding columns.

Two paths, as a 100 TB training pipeline needs:

- **brute-force cosine top-k** (the exactness baseline): broadcast the query
  matrix (Q × dim floats), scan the corpus once with ``mapInArrow`` computing
  a Q×B float64 GEMM per Arrow batch, emit per-batch local top-k, reduce with
  a window over query_id. Shuffle volume is O(partitions · Q · k), never the
  corpus.
- **LSH-bucketed ANN** (the scale path): random-hyperplane signatures (
  deterministic splitmix-seeded planes), multi-probe by signature band join,
  exact re-rank inside buckets only. Recall tunable by bands/bits; at web
  scale this is the IVF-style pruning that avoids the full scan per query.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.webpages import _splitmix64

U64 = np.uint64


def _batch_embedding_matrix(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Arrow list<float> column → (n, dim) float64 matrix without per-row Python."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if isinstance(arr, pa.ListArray) or isinstance(arr, pa.LargeListArray):
        offsets = arr.offsets.to_numpy()
        flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
        dim = int(offsets[1] - offsets[0])
        start = int(offsets[0])
        return flat[start : start + len(arr) * dim].reshape(len(arr), dim)
    raise TypeError(f"expected list<float> embeddings, got {arr.type}")


def brute_force_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query id (self excluded).

    Output: (query_id, neighbor_id, rank) with rank 1..k ordered by cosine
    similarity desc, neighbor_id asc on ties."""
    qrows = (
        df.where(F.col(id_col).isin([int(q) for q in query_ids]))
        .select(id_col, vec_col)
        .collect()
    )
    q_ids = np.array([r[id_col] for r in qrows], dtype=np.int64)
    q_mat = np.array([r[vec_col] for r in qrows], dtype=np.float64)
    q_mat = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    spark = df.sparkSession
    b_ids = spark.sparkContext.broadcast(q_ids)
    b_mat = spark.sparkContext.broadcast(q_mat)

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        qi, qm = b_ids.value, b_mat.value
        for rb in batches:
            ids = rb.column(0).to_numpy()
            mat = _batch_embedding_matrix(rb.column(1))
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            sims = qm @ mat.T  # (Q, B)
            # local top-k per query (batch-level pruning before the shuffle)
            kk = min(k + 1, sims.shape[1])  # +1: self may be in-batch
            part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            out_q, out_n, out_s = [], [], []
            for qi_row in range(sims.shape[0]):
                cols = part[qi_row]
                out_q.extend([qi[qi_row]] * len(cols))
                out_n.extend(ids[cols].tolist())
                out_s.extend(sims[qi_row, cols].tolist())
            yield pa.RecordBatch.from_pydict(
                {
                    "query_id": pa.array(np.asarray(out_q, dtype=np.int64), pa.int64()),
                    "neighbor_id": pa.array(np.asarray(out_n, dtype=np.int64), pa.int64()),
                    "sim": pa.array(np.asarray(out_s, dtype=np.float64), pa.float64()),
                }
            )

    local = df.select(id_col, vec_col).mapInArrow(fn, "query_id long, neighbor_id long, sim double")
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        local.where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def brute_force_topk_sql(query_ids: list[int], k: int = 5, table: str = "embeddings") -> str:
    ids = ", ".join(str(int(q)) for q in query_ids)
    return f"""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM {table}
               WHERE vec_id IN ({ids})),
    sims AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             list_cosine_similarity(q.qv, e.embedding::DOUBLE[]) AS sim
      FROM q CROSS JOIN {table} e
      WHERE e.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
      FROM sims
    )
    SELECT query_id, neighbor_id, rank::INT AS rank FROM ranked WHERE rank <= {k}
    """


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a_id, b_id) with cos ≥ t, a<b.

    Exactness baseline: the corpus matrix is broadcast (normalized float64)
    and each partition GEMMs its rows against it — O(n²/P) per task, fine up
    to ~10⁵ vectors. At web scale, swap the candidate generation for the LSH
    buckets of :func:`lsh_topk` (same verify step); the broadcast variant is
    what the DuckDB oracle can check exactly."""
    rows = df.select(id_col, vec_col).collect()
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    mat = np.array([r[vec_col] for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    spark = df.sparkSession
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        all_ids, all_mat = b_ids.value, b_mat.value
        for rb in batches:
            my_ids = rb.column(0).to_numpy()
            my_mat = _batch_embedding_matrix(rb.column(1))
            my_mat = my_mat / np.linalg.norm(my_mat, axis=1, keepdims=True)
            sims = my_mat @ all_mat.T
            keep = sims >= threshold
            # a < b halves the output and drops self-pairs
            keep &= my_ids[:, None] < all_ids[None, :]
            r, c = np.nonzero(keep)
            yield pa.RecordBatch.from_pydict(
                {
                    "a_id": pa.array(my_ids[r], pa.int64()),
                    "b_id": pa.array(all_ids[c], pa.int64()),
                }
            )

    return df.select(id_col, vec_col).mapInArrow(fn, "a_id long, b_id long")


def cosine_near_dup_pairs_sql(threshold: float, table: str = "embeddings") -> str:
    return f"""
    SELECT a.vec_id AS a_id, b.vec_id AS b_id
    FROM {table} a JOIN {table} b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= {threshold}
    """


# ------------------------------------------------------------- LSH path


N_PLANES = 8  # 8-bit signatures → 256 buckets per table
N_TABLES = 16  # independent hash tables for recall


def _planes(dim: int) -> np.ndarray:
    """(N_TABLES, N_PLANES, dim) deterministic gaussian-ish hyperplanes."""
    n = N_TABLES * N_PLANES * dim
    h = _splitmix64(np.arange(n, dtype=np.int64) + 12345)
    # box-muller-free: map two uniforms to approx normal via sum of 4 uniforms
    u = h.astype(np.float64) / 2**64
    g = (
        u
        + _splitmix64(np.arange(n, dtype=np.int64) + 99999).astype(np.float64) / 2**64
        - 1.0
    )
    return g.reshape(N_TABLES, N_PLANES, dim)


def lsh_signatures(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(vec_id, tbl, bucket): hyperplane-LSH bucket keys, one row per table.

    Deterministic splitmix-seeded planes — no RNG state to ship; the bucket
    column is the join key for both ANN (query vs corpus) and near-dup
    (corpus self-join) candidate generation."""

    def sig_fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        planes = None
        for rb in batches:
            ids = rb.column(0).to_numpy()
            mat = _batch_embedding_matrix(rb.column(1))
            if planes is None:
                planes = _planes(mat.shape[1])
            bits_all = np.zeros((len(ids), N_TABLES), dtype=np.int64)
            for t in range(N_TABLES):
                proj = mat @ planes[t].T  # (B, N_PLANES)
                bits = (proj > 0).astype(np.int64)
                bits_all[:, t] = (bits << np.arange(N_PLANES)).sum(axis=1)
            tbl = np.tile(np.arange(N_TABLES), len(ids))
            yield pa.RecordBatch.from_pydict(
                {
                    "vec_id": pa.array(np.repeat(ids, N_TABLES), pa.int64()),
                    "tbl": pa.array(tbl.astype(np.int32), pa.int32()),
                    "bucket": pa.array(bits_all.ravel(), pa.int64()),
                }
            )

    return df.select(id_col, vec_col).mapInArrow(sig_fn, "vec_id long, tbl int, bucket long")


def _cosine_expr() -> F.Column:
    dot = F.aggregate(
        F.zip_with("qv", "nv", lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )
    norm = lambda c: F.sqrt(
        F.aggregate(c, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )
    return dot / (norm(F.col("qv")) * norm(F.col("nv")))


def cosine_near_dup_pairs_lsh(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Bucketed cosine near-duplicate pairs — the 100-TB shape.

    Candidates come from a hyperplane-LSH bucket SELF-join (cost
    O(Σ bucket²) per table, never O(n²) and never a corpus broadcast), then
    exact cosine verification. Complements :func:`cosine_near_dup_pairs`
    (the broadcast exactness baseline): false positives are impossible (every
    emitted pair is verified); recall at similarity s is
    1 − (1 − p^B)^T with p = 1 − arccos(s)/π, B = N_PLANES, T = N_TABLES —
    ≥ 99.5 % at s = 0.9 with the default 16 × 8 configuration, and tunable by
    the table/plane constants."""
    sigs = lsh_signatures(df, id_col, vec_col).persist()
    a, b = sigs.alias("a"), sigs.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("a_id"), F.col("b.vec_id").alias("b_id"))
        .distinct()
    )
    emb_a = df.select(F.col(id_col).alias("a_id"), F.col(vec_col).alias("qv"))
    emb_b = df.select(F.col(id_col).alias("b_id"), F.col(vec_col).alias("nv"))
    return (
        cand.join(emb_a, "a_id")
        .join(emb_b, "b_id")
        .where(_cosine_expr() >= threshold)
        .select("a_id", "b_id")
    )


def lsh_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_hamming: int = 0,
) -> DataFrame:
    """ANN top-k: random-hyperplane LSH buckets, exact re-rank inside buckets.

    ``probe_hamming`` enables multi-probe (Lv et al., VLDB 2007): each query
    additionally probes every bucket within Hamming distance h of its own
    bucket key, trading candidate-set size for recall without growing the
    index. Per-table candidate probability at cosine s rises from p^B to
    Σ_{i≤h} C(B,i)·p^(B-i)·(1-p)^i with p = 1 − arccos(s)/π. h=0 is the
    classic one-bucket probe; h=3 with the default 16×8 config reaches
    recall ≈ 1 even on uniform-random corpora (where near-neighbors sit
    barely above the bulk — the adversarial case). The exactness baseline is
    brute_force_topk (same output schema)."""
    sigs = lsh_signatures(df, id_col, vec_col)
    qsigs = sigs.where(F.col("vec_id").isin([int(q) for q in query_ids])).select(
        F.col("vec_id").alias("query_id"), "tbl", "bucket"
    )
    if probe_hamming > 0:
        masks = [m for m in range(1 << N_PLANES) if bin(m).count("1") <= probe_hamming]
        qsigs = qsigs.select(
            "query_id",
            "tbl",
            F.explode(
                F.array(*[F.col("bucket").bitwiseXOR(F.lit(m)) for m in masks])
            ).alias("bucket"),
        )
    cand = (
        F.broadcast(qsigs)
        .join(sigs, ["tbl", "bucket"])
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    # query embeddings only — broadcasting the unfiltered corpus would ship
    # every vector to every executor
    emb_q = (
        df.where(F.col(id_col).isin([int(q) for q in query_ids]))
        .select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    )
    emb_n = df.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"))
    scored = (
        cand.join(F.broadcast(emb_q), "query_id")
        .join(emb_n, "neighbor_id")
        .withColumn("sim", _cosine_expr())
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
