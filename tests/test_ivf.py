"""IVF coarse-quantizer ANN: determinism, full-probe == brute force, and
clustered-data recall with partial probing."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from cms_topn_spark.operators import ivf, similarity


@pytest.fixture(scope="module")
def emb(spark, sf001_dir):
    return spark.read.parquet(os.path.join(sf001_dir, "embeddings.parquet"))


def test_kmeans_deterministic(spark, emb):
    a = ivf.kmeans_fit(emb, n_cells=8, iters=2)
    b = ivf.kmeans_fit(emb.repartition(7), n_cells=8, iters=2)
    # partial-sum merge is float-exact only per partitioning; same partitioning
    # must be bit-identical, different partitioning agrees to fp tolerance
    c = ivf.kmeans_fit(emb, n_cells=8, iters=2)
    assert np.array_equal(a, c)
    assert np.allclose(a, b)


def test_full_probe_equals_brute_force(spark, emb):
    qids = list(range(10))
    exact = sorted(tuple(r) for r in similarity.brute_force_topk(emb, qids, k=5).collect())
    full = sorted(
        tuple(r)
        for r in ivf.ivf_topk(emb, qids, k=5, n_cells=8, n_probe=8, iters=2).collect()
    )
    assert full == exact  # probing every cell = brute force by construction


def test_clustered_recall_with_partial_probe(spark):
    """Planted clusters: IVF with n_probe=1 must recover within-cluster
    neighbors (the workload IVF exists for)."""
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(8, 16)) * 10
    rows = []
    vid = 0
    for c in range(8):
        for _ in range(40):
            v = centers[c] + rng.normal(size=16) * 0.05
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qids = [0, 40, 80, 120]
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.brute_force_topk(df, qids, k=5).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf.ivf_topk(df, qids, k=5, n_cells=8, n_probe=1, iters=4).collect()
    }
    assert len(got & exact) / len(exact) >= 0.95


def test_assign_covers_all_vectors(spark, emb):
    cents = ivf.kmeans_fit(emb, n_cells=8, iters=1)
    assigned = ivf.ivf_assign(emb, cents)
    assert assigned.count() == emb.count()
    cells = [r["cell"] for r in assigned.select("cell").distinct().collect()]
    assert all(0 <= c < 8 for c in cells)


def test_empty_query_ids_returns_empty(spark, emb):
    out = ivf.ivf_topk(emb, query_ids=[987654321], k=5, n_cells=8, n_probe=2, iters=1)
    assert out.count() == 0
    assert out.columns == ["query_id", "neighbor_id", "rank"]


def test_ivf_planted_sublinear_probes_fraction_and_recall(spark, sf001_dir):
    """The gated sublinear config (n_probe=1 of 16 cells): the probed cells
    cover a small fraction of the corpus, yet recall of the planted
    identical-copy nearest neighbor is 1.0 by construction."""
    import os

    import numpy as np
    from pyspark.sql import functions as F

    from cms_topn_spark.operators.ivf import ivf_assign, ivf_topk, kmeans_fit

    qids = list(range(20))
    off = 1_000_000
    emb = (
        spark.read.parquet(os.path.join(sf001_dir, "embeddings.parquet"))
        .select("vec_id", "embedding")
    )
    dup = emb.where(F.col("vec_id").isin(qids)).select(
        (F.col("vec_id") + F.lit(off)).alias("vec_id"), "embedding"
    )
    planted = emb.unionByName(dup)
    n_corpus = planted.count()

    # measured probed fraction: queries' nearest cells vs cell populations
    cents = kmeans_fit(planted, n_cells=16, iters=3)
    assigned = ivf_assign(planted, cents)
    cell_sizes = {
        r["cell"]: r["n"]
        for r in assigned.groupBy("cell").agg(F.count("*").alias("n")).collect()
    }
    qrows = planted.where(F.col("vec_id").isin(qids)).collect()
    q_mat = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    d2 = (q_mat * q_mat).sum(1)[:, None] - 2.0 * (q_mat @ cents.T)
    d2 += (cents * cents).sum(1)[None, :]
    probed = d2.argmin(axis=1)
    frac = sum(cell_sizes.get(int(c), 0) for c in probed) / (len(qids) * n_corpus)
    assert frac < 0.35, frac  # mean probed fraction ≪ the corpus

    got = {
        r["query_id"]: r["neighbor_id"]
        for r in ivf_topk(planted, qids, k=1, n_cells=16, n_probe=1).collect()
    }
    assert got == {q: q + off for q in qids}  # recall 1.0 by construction


class TestIndexLifecycle:
    """Build-once-load-query vs refit-per-call (round-7 verdict #3): the
    persisted index must answer identically to the in-memory fit — centroids
    byte-for-byte through the parquet stage, query results row-for-row, and
    the planted-cluster recall gate green through the LOADED index."""

    def test_ivf_build_load_query_parity(self, spark, emb, tmp_path):
        d = str(tmp_path / "ivf_idx")
        built = ivf.ivf_build(emb, d, n_cells=8, iters=2)
        loaded = ivf.ivf_load(spark, d)
        fitted = ivf.kmeans_fit(emb, n_cells=8, iters=2)
        # float64 centroids round-trip parquet doubles bit-exactly
        assert loaded.centroids.tobytes() == fitted.tobytes()
        assert built.centroids.tobytes() == fitted.tobytes()
        qids = list(range(10))
        refit = sorted(
            tuple(r)
            for r in ivf.ivf_topk(emb, qids, k=5, n_cells=8, n_probe=4, iters=2).collect()
        )
        served = sorted(
            tuple(r) for r in ivf.ivf_query(loaded, emb, qids, k=5, n_probe=4).collect()
        )
        assert served == refit

    def test_ivf_load_rejects_partial_index(self, spark, emb, tmp_path):
        import shutil

        d = str(tmp_path / "ivf_bad")
        ivf.ivf_build(emb, d, n_cells=8, iters=1)
        # simulate a truncated centroid stage: rewrite with one cell missing
        cents = spark.read.parquet(f"{d}/centroids.parquet").where("cell <> 3")
        cents.collect()  # materialize before overwriting the source
        pdf = cents.toPandas()
        shutil.rmtree(f"{d}/centroids.parquet")
        spark.createDataFrame(pdf).write.parquet(f"{d}/centroids.parquet")
        with pytest.raises(ValueError, match="missing centroids"):
            ivf.ivf_load(spark, d)

    def test_oversized_n_probe_clamps_identically_in_both_forms(self, spark, emb, tmp_path):
        """n_probe > n_cells clamps to full probe in BOTH lifecycles (the
        clamp lives in the shared search), so refit-vs-loaded parity holds
        at the API edge too."""
        d = str(tmp_path / "ivf_np")
        idx = ivf.ivf_build(emb, d, n_cells=4, iters=1)
        refit = sorted(
            tuple(r)
            for r in ivf.ivf_topk(emb, [0, 1], k=3, n_cells=4, n_probe=9, iters=1).collect()
        )
        served = sorted(
            tuple(r) for r in ivf.ivf_query(idx, emb, [0, 1], k=3, n_probe=9).collect()
        )
        full = sorted(
            tuple(r) for r in ivf.ivf_query(idx, emb, [0, 1], k=3, n_probe=4).collect()
        )
        assert served == refit == full

    def test_lsh_build_load_query_parity(self, spark, emb, tmp_path):
        d = str(tmp_path / "lsh_idx")
        similarity.lsh_build(emb, d, n_planes=8)
        loaded = similarity.lsh_load(spark, d)
        assert (loaded.n_planes, loaded.n_tables) == (8, similarity.N_TABLES)
        qids = list(range(10))
        recompute = sorted(
            tuple(r)
            for r in similarity.lsh_topk(
                emb, qids, k=5, probe_hamming=2, n_planes=8
            ).collect()
        )
        served = sorted(
            tuple(r)
            for r in similarity.lsh_query(loaded, emb, qids, k=5, probe_hamming=2).collect()
        )
        assert served == recompute

    def test_lsh_signature_stage_round_trips(self, spark, emb, tmp_path):
        d = str(tmp_path / "lsh_sig")
        similarity.lsh_build(emb, d, n_planes=8)
        loaded = similarity.lsh_load(spark, d)
        direct = sorted(
            tuple(r)
            for r in similarity.lsh_signatures(emb, n_planes=8).collect()
        )
        staged = sorted(tuple(r) for r in loaded.signatures.collect())
        assert staged == direct

    def test_planted_recall_through_loaded_index(self, spark, tmp_path):
        """The planted-cluster recall gate, served from the parquet stage."""
        rng = np.random.default_rng(11)
        centers = rng.normal(size=(8, 16)) * 10
        rows = []
        vid = 0
        for c in range(8):
            for _ in range(40):
                v = centers[c] + rng.normal(size=16) * 0.05
                rows.append((vid, [float(x) for x in v]))
                vid += 1
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        qids = [0, 40, 80, 120]
        exact = {
            (r["query_id"], r["neighbor_id"])
            for r in similarity.brute_force_topk(df, qids, k=5).collect()
        }
        d = str(tmp_path / "ivf_planted")
        ivf.ivf_build(df, d, n_cells=8, iters=4)
        loaded = ivf.ivf_load(spark, d)
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf.ivf_query(loaded, df, qids, k=5, n_probe=1).collect()
        }
        assert len(got & exact) / len(exact) >= 0.95
