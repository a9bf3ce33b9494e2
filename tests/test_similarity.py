"""Similarity search (X2): fast path ≡ exact path, LSH recall vs brute

force, IVF recall."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dwh_etl_framework_spark.operators import similarity

from conftest import SF_DIR


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def query_vec(embeddings):
    return embeddings.filter(F.col("vec_id") == 0)


def test_fast_and_exact_topk_agree(spark, embeddings, query_vec):
    others = embeddings.filter(F.col("vec_id") != 0)
    fast = [r.vec_id for r in similarity.brute_force_topk(others, query_vec, k=10).collect()]
    exact = [r.vec_id for r in
             similarity.brute_force_topk(others, query_vec, k=10, exact=True).collect()]
    assert fast == exact


def test_brute_force_self_similarity(spark, embeddings):
    """cosine(v, v) = 1 — the query vector itself ranks first when included."""
    q = embeddings.filter(F.col("vec_id") == 0)
    top = similarity.brute_force_topk(embeddings, q, k=1).collect()[0]
    assert top.vec_id == 0
    assert top.cosine_sim == pytest.approx(1.0, abs=1e-9)


def _brute_force_pairs(embeddings, threshold):
    a = embeddings.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = embeddings.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    return {
        (r.id_a, r.id_b)
        for r in (
            a.crossJoin(b)
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("cs", similarity.cosine(F.col("va"), F.col("vb")))
            .filter(F.col("cs") >= threshold)
            .collect()
        )
    }


@pytest.fixture(scope="module")
def near_dup_vectors(spark):
    """The fixture embeddings have no near-dups (max pair cosine ≈ 0.5), so

    synthesize: 150 seeded random base vectors + 40 perturbed copies with
    cosine ≥ ~0.99 to their base."""
    import numpy as np

    rng = np.random.default_rng(42)
    base = rng.normal(size=(150, 64)).astype("float32")
    rows = [(i, base[i].tolist()) for i in range(150)]
    for j in range(40):
        noisy = base[j] + rng.normal(scale=0.03, size=64).astype("float32")
        rows.append((1000 + j, noisy.astype("float32").tolist()))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_lsh_near_dup_recall(spark, near_dup_vectors):
    truth = _brute_force_pairs(near_dup_vectors, 0.9)
    assert len(truth) >= 35  # the 40 planted pairs (minus any noise outliers)
    got = {
        (r.id_a, r.id_b)
        for r in similarity.lsh_near_dup_pairs(
            near_dup_vectors, dim=64, n_planes=12, n_tables=3, threshold=0.9
        ).collect()
    }
    assert not (got - truth), "bucketed pairs are exact-verified: no false positives"
    recall = len(got & truth) / len(truth)
    assert recall >= 0.8, f"LSH recall {recall:.2f} below 0.8 ({len(got)}/{len(truth)})"


def test_ivf_topk_overlaps_brute_force(spark, embeddings, query_vec):
    others = embeddings.filter(F.col("vec_id") != 0)
    truth = [r.vec_id for r in similarity.brute_force_topk(others, query_vec, k=10).collect()]
    centroids = embeddings.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid_vec")
    )
    got = [r.vec_id for r in
           similarity.ivf_topk(others, query_vec, centroids, k=10, n_probe=4).collect()]
    overlap = len(set(got) & set(truth))
    assert overlap >= 3, f"IVF(4/16 probes) overlap with exact top-10 too low: {overlap}"


def test_knn_join_matches_per_query_brute_force(spark, embeddings):
    """x32's operator: for a sample of query ids, the k-NN join row set

    must equal running brute_force_topk per query."""
    queries = embeddings.filter(F.col("vec_id") < 5)
    joined = similarity.knn_join(embeddings, queries, k=3).collect()
    by_query = {}
    for r in joined:
        by_query.setdefault(r.query_id, []).append((r.rk, r.neighbor_id))
    assert set(by_query) == {0, 1, 2, 3, 4}
    for qid, rows in by_query.items():
        assert [rk for rk, _ in sorted(rows)] == [1, 2, 3]
        qv = embeddings.filter(F.col("vec_id") == qid)
        brute = [
            r.vec_id
            for r in similarity.brute_force_topk(
                embeddings.filter(F.col("vec_id") != qid), qv, k=3
            ).collect()
        ]
        assert [n for _, n in sorted(rows)] == brute, f"query {qid}"


def test_knn_join_ivf_recall_vs_exact(spark, embeddings):
    """On the uniform-random synthetic corpus "neighbors" are arbitrary

    (max pairwise cosine ≈ 0.5), the worst case for list-restricted
    candidates — still require better-than-baseline recall (probing 6/16
    lists blind would cover ~37%; require 0.5)."""
    centroids = embeddings.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid_vec"),
    )
    approx = similarity.knn_join_ivf(embeddings, centroids, k=3, n_probe=6).collect()
    exact = similarity.knn_join(embeddings, embeddings, k=3).collect()
    a_set = {(r.query_id, r.neighbor_id) for r in approx}
    e_set = {(r.query_id, r.neighbor_id) for r in exact}
    recall = len(a_set & e_set) / len(e_set)
    assert recall >= 0.5, f"IVF knn-join recall too low: {recall:.2f}"


def test_knn_join_ivf_finds_planted_near_neighbors(spark, embeddings):
    """The case IVF exists for: a GENUINE near-duplicate (tiny perturbation

    ⇒ same or adjacent inverted list) must appear as its twin's rank-1
    neighbor in the approximate join."""
    base = embeddings.limit(50)
    planted = base.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            F.col("embedding"), lambda x: x.cast("double") * 1.0001
        ).alias("embedding"),
        F.col("label"),
    )
    corpus = embeddings.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding"), "label"
    ).unionByName(planted)
    centroids = corpus.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid_vec"),
    )
    got = similarity.knn_join_ivf(corpus, centroids, k=1, n_probe=4).collect()
    rank1 = {r.query_id: r.neighbor_id for r in got}
    hits = sum(1 for qid in range(50) if rank1.get(qid + 100000) == qid)
    assert hits >= 45, f"only {hits}/50 planted twins found at rank 1"


def test_kmeans_codebook_trains_and_converges(spark, embeddings):
    cb = similarity.train_kmeans_codebook(embeddings, n_centroids=8, max_iter=6)
    rows = cb.collect()
    assert 1 <= len(rows) <= 8
    assert sum(r.n_members for r in rows) == embeddings.count()
    dim = len(rows[0].centroid_vec)
    assert all(len(r.centroid_vec) == dim for r in rows)


def test_kmeans_codebook_improves_planted_cluster_recall(spark, embeddings):
    """Train on a corpus with planted tight clusters: the trained codebook

    must put each planted twin pair in the same inverted list, so the
    IVF knn-join finds every twin at rank 1 with n_probe=1."""
    base = embeddings.limit(40)
    planted = base.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(F.col("embedding"), lambda x: x.cast("double") * 1.0001).alias("embedding"),
        F.col("label"),
    )
    corpus = base.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
        "label",
    ).unionByName(planted)
    cb = similarity.train_kmeans_codebook(corpus, n_centroids=6, max_iter=5)
    centroids = cb.select("centroid_id", "centroid_vec")
    got = similarity.knn_join_ivf(corpus, centroids, k=1, n_probe=1).collect()
    rank1 = {r.query_id: r.neighbor_id for r in got}
    hits = sum(1 for r in base.collect() if rank1.get(r.vec_id + 100000) == r.vec_id)
    assert hits >= 38, f"only {hits}/40 planted twins at rank 1 with trained codebook"
