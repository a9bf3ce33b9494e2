"""Direct regression coverage for every rows-only registry entry.

These queries have no DuckDB oracle (sketches, xxhash64-derived hashes,
mapInPandas) so the driver records only a rows-count for them — and the
ones past the driver's first-50 window get no driver evidence at all.
tools/coverage_check.py now REQUIRES each such query to be exercised by
name in tests; this module is that evidence, asserting each entry's
semantic invariant against its exact twin where one exists.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dwh_etl_framework_spark.queries import QUERIES

from conftest import SF_DIR


def _run(spark, name):
    return QUERIES[name].fn(spark, SF_DIR)


def test_r17b_approx_count_distinct_tracks_exact(spark):
    exact = {
        r.o_orderpriority: r.n_customers
        for r in _run(spark, "r17_count_distinct").collect()
    }
    approx = {
        r.o_orderpriority: r.approx_customers
        for r in _run(spark, "r17b_approx_count_distinct").collect()
    }
    assert set(approx) == set(exact)
    for k, est in approx.items():
        # rsd=0.02: generous 10% envelope still catches wiring mistakes
        assert abs(est - exact[k]) <= max(2, 0.1 * exact[k]), (k, est, exact[k])


def test_r24e_approx_percentiles_track_exact(spark):
    exact = {
        r.o_orderpriority: r
        for r in _run(spark, "r24c_percentiles").collect()
    }
    approx = {
        r.o_orderpriority: r.approx_p50_p90_p99
        for r in _run(spark, "r24e_approx_percentiles").collect()
    }
    assert set(approx) == set(exact)
    for k, (p50, p90, p99) in approx.items():
        assert p50 <= p90 <= p99, "percentiles must be monotone"
        lo, hi = exact[k].median_price * 0.8, exact[k].median_price * 1.2
        assert lo <= p50 <= hi, (k, p50, exact[k].median_price)
        assert exact[k].min_price <= p50 <= exact[k].max_price


def test_x02b_cascade_query_equals_exact_jaccard_query(spark):
    exact_pairs = {
        (r.doc_a, r.doc_b) for r in _run(spark, "x02_ngram_jaccard").collect()
    }
    cascade_pairs = {
        (r.doc_a, r.doc_b)
        for r in _run(spark, "x02b_lsh_jaccard_cascade").collect()
    }
    # every cascade pair is exact-verified (no false positives); on the
    # fixture corpus the banding finds every exact pair too
    assert cascade_pairs == exact_pairs


def test_x03_minhash_lsh_query_estimates_bounded(spark):
    rows = _run(spark, "x03_minhash_lsh").collect()
    assert rows, "fixture corpus has near-dup candidates"
    for r in rows:
        assert r.doc_a < r.doc_b
        assert 0.0 <= r.est_jaccard <= 1.0
    pairs = [(r.doc_a, r.doc_b) for r in rows]
    assert len(pairs) == len(set(pairs)), "candidate pairs deduplicated"


def test_x04_simhash_query_within_hamming_budget(spark):
    rows = _run(spark, "x04_simhash").collect()
    for r in rows:
        assert r.doc_a < r.doc_b
        assert 0 <= r.hamming <= 3


def test_x05b_fast_topk_query_matches_exact_ids(spark):
    exact_ids = [r.vec_id for r in _run(spark, "x05_cosine_topk").collect()]
    fast_ids = [r.vec_id for r in _run(spark, "x05b_cosine_topk_fast").collect()]
    assert fast_ids == exact_ids


def test_x06_embedding_near_dup_query_pairs_verified(spark):
    rows = _run(spark, "x06_embedding_near_dup").collect()
    for r in rows:
        assert r.id_a < r.id_b
        assert r.cosine_sim >= 0.9 - 1e-9


def test_x06b_ivf_query_overlaps_exact(spark):
    exact_ids = {r.vec_id for r in _run(spark, "x05_cosine_topk").collect()}
    ivf_ids = {r.vec_id for r in _run(spark, "x06b_ivf_topk").collect()}
    assert len(ivf_ids & exact_ids) >= 3, (
        f"IVF(4/16 probes) overlap with exact top-10 too low: {ivf_ids}"
    )


def test_x12_media_features_query_deterministic_stub(spark):
    df = _run(spark, "x12_media_features")
    n_docs = _run(spark, "x11_binary_columns").count()
    rows = df.collect()
    assert len(rows) == n_docs
    for r in rows[:20]:
        assert r.doc_id is not None
    # stub decode is deterministic: running twice yields identical rows
    assert rows == df.collect()


def test_x32b_knn_join_ivf_subset_of_exact_candidates(spark):
    """x32b_knn_join_ivf (rows-only): every approximate neighbor must be a

    real corpus vector ranked by true cosine — i.e. each (query, neighbor)
    edge must appear in the exact x32-style join at some rank, and rk
    must be 1..3 per query. (Recall bounds live in tests/test_similarity.py.)"""
    from dwh_etl_framework_spark.operators import similarity

    approx = _run(spark, "x32b_knn_join_ivf").collect()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    exact = similarity.knn_join(emb, emb, k=50).collect()
    true_sim = {(r.query_id, r.neighbor_id): r.cosine_sim for r in exact}
    by_query = {}
    matched = 0
    for r in approx:
        by_query.setdefault(r.query_id, []).append((r.rk, r.cosine_sim))
        assert r.neighbor_id != r.query_id
        if (r.query_id, r.neighbor_id) in true_sim:
            # similarity reported for the pair must BE the true cosine
            assert r.cosine_sim == pytest.approx(
                true_sim[(r.query_id, r.neighbor_id)], abs=1e-9
            )
            matched += 1
    assert matched > 0  # the deep-rank overlap is never empty in practice
    for qid, rows in by_query.items():
        rks = sorted(rk for rk, _ in rows)
        assert rks == list(range(1, len(rks) + 1)), (qid, rks)
        sims = [s for _, s in sorted(rows)]
        assert sims == sorted(sims, reverse=True), f"rk order != sim order: {qid}"


def test_x35_kmeans_ivf_topk_returns_true_cosines(spark):
    """x35_kmeans_ivf_topk (rows-only): the trained-codebook ANN must

    return k=10 rows whose cosine_sim values are the TRUE similarities to
    the query vector (re-ranking is exact even when the candidate set is
    approximate), in descending order."""
    from dwh_etl_framework_spark.operators import similarity

    rows = _run(spark, "x35_kmeans_ivf_topk").collect()
    assert len(rows) == 10
    sims = [r.cosine_sim for r in rows]
    assert sims == sorted(sims, reverse=True)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qv = emb.filter(F.col("vec_id") == 0)
    truth = {
        r.neighbor_id: r.cosine_sim
        for r in similarity.knn_join(emb, qv, k=400).collect()
    }
    for r in rows:
        assert r.cosine_sim == pytest.approx(truth[r.vec_id], abs=1e-6)
