"""Similarity-search query-surface entries (X2) wired to

operators/similarity.py, over the ``embeddings`` fixture (64-dim float)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dwh_etl_framework_spark.operators import similarity
from dwh_etl_framework_spark.queries.registry import fixtures, query

_DIM = 64


@query(
    "x05_cosine_topk",
    oracle="""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    e_exp AS (
        SELECT vec_id, label, embedding,
               unnest(generate_series(1, len(embedding))) AS i
        FROM embeddings WHERE vec_id <> 0
    ),
    dots AS (
        SELECT e.vec_id, e.label,
               SUM(CAST(floor(CAST(e.embedding[i] AS DOUBLE)
                              * CAST(q.qe[i] AS DOUBLE) * 1e12) AS BIGINT)) AS dot,
               SUM(CAST(floor(CAST(e.embedding[i] AS DOUBLE)
                              * CAST(e.embedding[i] AS DOUBLE) * 1e12) AS BIGINT)) AS na
        FROM e_exp e, q
        GROUP BY 1, 2
    ),
    qn AS (
        SELECT SUM(CAST(floor(CAST(qe[i] AS DOUBLE)
                              * CAST(qe[i] AS DOUBLE) * 1e12) AS BIGINT)) AS nb
        FROM (SELECT qe, unnest(generate_series(1, len(qe))) AS i FROM q)
    )
    SELECT vec_id, label,
           CAST(dot AS DOUBLE)
               / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE)))
               AS cosine_sim
    FROM dots, qn
    ORDER BY cosine_sim DESC, vec_id ASC
    LIMIT 10
    """,
)
def x05_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 brute-force cosine top-10 against the vec_id=0 query vector.

    JVM-side zip_with products with DECIMAL accumulation (bit-reproducible
    across engines — see operators/similarity._dot_exact), final division in
    double, TakeOrderedAndProject top-k. The double fast path is
    x05b; bench uses this same plan shape."""
    t = fixtures(spark, sf_dir)
    qv = t.embeddings.filter(F.col("vec_id") == 0)
    return (
        similarity.brute_force_topk(
            t.embeddings.filter(F.col("vec_id") != 0),
            qv,
            k=10,
            exact=True,
        )
        .select("vec_id", "label", "cosine_sim")
    )


@query("x05b_cosine_topk_fast", oracle=None)
def x05b_cosine_topk_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 brute-force top-10, double-precision fast path (the plan you run

    at 100 TB). No oracle: double reduction order is engine-specific;
    tests/test_similarity.py asserts it returns the same ids as x05."""
    t = fixtures(spark, sf_dir)
    qv = t.embeddings.filter(F.col("vec_id") == 0)
    return similarity.brute_force_topk(
        t.embeddings.filter(F.col("vec_id") != 0), qv, k=10, exact=False
    ).select("vec_id", "label", "cosine_sim")


@query("x06_embedding_near_dup", oracle=None)
def x06_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1/X2 embedding near-duplicate pairs (cosine ≥ 0.9) via

    random-hyperplane LSH buckets — exact cosine only inside buckets.
    No oracle (bucket assignment is implementation-defined);
    tests/test_similarity.py checks recall ≥ 0.8 against brute force on
    planted near-duplicates. NOTE: on the driver fixtures this returns 0
    rows BY DESIGN — the synthetic embeddings' max pairwise cosine is ≈0.5,
    i.e. the corpus genuinely has no near-dups; the operator's behavior is
    proven by the planted-duplicate test."""
    t = fixtures(spark, sf_dir)
    return similarity.lsh_near_dup_pairs(
        t.embeddings, dim=_DIM, n_planes=12, n_tables=3, threshold=0.9
    ).orderBy("id_a", "id_b")


@query("x06b_ivf_topk", oracle=None)
def x06b_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 IVF-style ANN top-10: coarse centroids (first 16 vectors as a

    deterministic codebook), probe the 4 nearest lists. At ingest scale the
    table is partitioned by centroid ⇒ partition pruning is the index.
    Recall vs brute force is asserted in tests/test_similarity.py."""
    t = fixtures(spark, sf_dir)
    centroids = (
        t.embeddings.filter(F.col("vec_id") < 16)
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("centroid_vec"),
        )
    )
    qv = t.embeddings.filter(F.col("vec_id") == 0)
    return similarity.ivf_topk(
        t.embeddings.filter(F.col("vec_id") != 0), qv, centroids, k=10, n_probe=4
    )
