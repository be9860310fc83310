"""Dedup / text / similarity operators vs DuckDB oracles at sf0.001.

Mirrors the driver's correctness gate inside pytest (fast scale) so
`python -m pytest -x -q` covers the full operator surface."""

import math
import os

import duckdb
import pytest

TABLES = ("documents", "embeddings", "events")


@pytest.fixture(scope="module")
def con(sf001_dir):
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf001_dir}/{t}.parquet'")
    return c


def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        return float(v) if isinstance(v, float) and not math.isnan(v) else v

    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


def compare(df, con, sql):
    rows = [tuple(r) for r in df.collect()]
    res = con.execute(sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(c.lower() for c in df.columns) == sorted(c.lower() for c in ocols)
    assert rowset(df.columns, rows) == rowset(ocols, orows)
    return len(rows)


@pytest.fixture(scope="module")
def docs(spark, sf001_dir):
    return spark.read.parquet(os.path.join(sf001_dir, "documents.parquet"))


class TestTextOps:
    def test_token_stats(self, docs, con):
        from cms_topn_spark.operators import textops

        compare(textops.token_stats(docs), con, textops.token_stats_sql())

    def test_lang_id(self, docs, con):
        from cms_topn_spark.operators import textops

        compare(textops.lang_id(docs), con, textops.lang_id_sql())

    def test_quality_score(self, docs, con):
        from cms_topn_spark.operators import textops

        compare(textops.quality_score(docs), con, textops.quality_score_sql())

    def test_fingerprints(self, docs, con):
        from cms_topn_spark.operators import textops

        compare(textops.fingerprints(docs), con, textops.fingerprints_sql())


class TestDedup:
    def test_exact_dedup(self, docs, con):
        from cms_topn_spark.operators import dedup

        compare(dedup.exact_dedup(docs), con, dedup.exact_dedup_sql())

    def test_jaccard_exact_and_lsh_agree(self, docs, con):
        from cms_topn_spark.operators import dedup

        n = compare(dedup.jaccard_pairs_exact(docs, 0.8), con, dedup.jaccard_pairs_sql())
        n2 = compare(dedup.minhash_lsh_pairs(docs, 0.8), con, dedup.jaccard_pairs_sql())
        assert n == n2  # LSH recall = 1 at this threshold/band config

    def test_simhash_near_pairs_cover_planted_dups(self, docs, spark):
        from cms_topn_spark.operators import dedup

        exact = {
            (r["a_id"], r["b_id"]) for r in dedup.jaccard_pairs_exact(docs, 0.9).collect()
        }
        sim = {
            (r["a_id"], r["b_id"]) for r in dedup.simhash_near_pairs(docs, max_hamming=6).collect()
        }
        # simhash at hamming<=6/64 should recover the vast majority of >0.9 dups
        assert exact, "fixture should contain planted near-duplicates"
        assert len(exact & sim) / len(exact) >= 0.8

    def test_simhash_deterministic(self, docs):
        from cms_topn_spark.operators import dedup

        a = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
        b = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs.repartition(7)).collect()}
        assert a == b


class TestSimilarity:
    def test_brute_force_matches_duckdb(self, spark, sf001_dir, con):
        from cms_topn_spark.operators import similarity

        emb = spark.read.parquet(os.path.join(sf001_dir, "embeddings.parquet"))
        qids = list(range(10))
        compare(
            similarity.brute_force_topk(emb, qids, k=5),
            con,
            similarity.brute_force_topk_sql(qids, k=5),
        )

    def test_lsh_recall_against_bruteforce(self, spark, sf001_dir):
        from cms_topn_spark.operators import similarity

        emb = spark.read.parquet(os.path.join(sf001_dir, "embeddings.parquet"))
        qids = list(range(10))
        exact = {
            (r["query_id"], r["neighbor_id"])
            for r in similarity.brute_force_topk(emb, qids, k=5).collect()
        }
        approx = {
            (r["query_id"], r["neighbor_id"])
            for r in similarity.lsh_topk(emb, qids, k=5).collect()
        }
        # approximate path: proper output shape and non-trivial recall.
        # These fixture embeddings are uniform-random (near-neighbors sit at
        # cosine ~0.3, barely above the bulk), the adversarial case for
        # hyperplane LSH — on clustered real embeddings recall is far higher.
        # The exactness baseline (oracle-checked) is brute_force_topk.
        assert len(approx) == len(exact)
        assert len(exact & approx) / len(exact) >= 0.15


class TestLangIdNgram:
    def test_lang_id_ngram(self, docs, con):
        from cms_topn_spark.operators import textops

        compare(textops.lang_id_ngram(docs), con, textops.lang_id_ngram_sql())
