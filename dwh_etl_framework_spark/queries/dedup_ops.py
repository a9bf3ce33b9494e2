"""Dedup query-surface entries (X1) wired to operators/dedup.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dwh_etl_framework_spark.operators import dedup
from dwh_etl_framework_spark.queries.registry import fixtures, query


@query(
    "x01_exact_dedup",
    oracle="""
    SELECT text, MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
    FROM documents
    GROUP BY text
    """,
)
def x01_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 exact dedup via hash-groupBy: survivor = lowest doc_id per

    identical text. One shuffle; at 100 TB group on md5(text) to shrink
    shuffle payload (operators/dedup.exact_dedup docstring)."""
    t = fixtures(spark, sf_dir)
    return dedup.exact_dedup(t.documents, "text", "doc_id").select(
        "text", "doc_id", "n_copies"
    )


@query(
    "x02_ngram_jaccard",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    idx AS (
        SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
        FROM toks WHERE len(t) >= 3
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
        FROM idx
    ),
    counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT i.doc_a, i.doc_b, i.n_common,
           ca.n AS n_a, cb.n AS n_b,
           CAST(i.n_common AS DOUBLE) / (ca.n + cb.n - i.n_common) AS jaccard
    FROM inter i
    JOIN counts ca ON i.doc_a = ca.doc_id
    JOIN counts cb ON i.doc_b = cb.doc_id
    WHERE CAST(i.n_common AS DOUBLE) / (ca.n + cb.n - i.n_common) >= 0.5
    """,
)
def x02_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 exact word-3-gram Jaccard near-dup pairs (J ≥ 0.5) via shingle

    equi-join — the verify tier of the dedup cascade."""
    t = fixtures(spark, sf_dir)
    return dedup.ngram_jaccard_pairs(
        t.documents, "text", "doc_id", n=3, threshold=0.5
    )


@query("x02b_lsh_jaccard_cascade", oracle=None)
def x02b_lsh_jaccard_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 cascade: LSH discovery → exact Jaccard verify restricted to

    candidates — the scale-honest composition (the Σ·df² shingle self-join
    never runs over the full corpus). No SQL oracle (the LSH tier hashes
    with xxhash64); tests/test_dedup.py proves every returned pair appears
    in the exact x02 result with an identical jaccard value."""
    t = fixtures(spark, sf_dir)
    return dedup.lsh_jaccard_cascade(
        t.documents, "text", "doc_id", n=3, k=64, bands=16, rows_per_band=4,
        est_threshold=0.5, threshold=0.5,
    ).orderBy("doc_a", "doc_b")


@query("x03_minhash_lsh", oracle=None)
def x03_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 MinHash(k=64) + LSH(16 bands × 4 rows) candidate pairs with

    estimated Jaccard ≥ 0.5. No SQL oracle: the minhash permutations hash
    with Spark's xxhash64, which DuckDB cannot reproduce — correctness is
    covered by tests/test_dedup.py comparing LSH candidates against the
    exact x02 pairs (recall ≥ threshold) on the fixtures."""
    t = fixtures(spark, sf_dir)
    sigs = dedup.minhash_signatures(t.documents, "text", "doc_id", n=3, k=64)
    return dedup.lsh_candidate_pairs(
        sigs, "doc_id", bands=16, rows_per_band=4, est_threshold=0.5
    ).orderBy("doc_a", "doc_b")


@query("x04_simhash", oracle=None)
def x04_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 SimHash near-dup pairs (hamming ≤ 3) with 16-bit-chunk blocking.

    No SQL oracle (xxhash64-derived bits); tests/test_dedup.py checks
    agreement with exact Jaccard pairs on the fixtures."""
    t = fixtures(spark, sf_dir)
    fp = dedup.simhash(t.documents, "text", "doc_id")
    return dedup.simhash_pairs(fp, "doc_id", max_hamming=3).orderBy(
        "doc_a", "doc_b"
    )
