"""X1 dedup clustering: near-dup pairs → connected components → survivor

per cluster. The oracle computes the same components with a recursive CTE
(transitive closure + min-reachable), proving the iterative DataFrame
label propagation exact."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dwh_etl_framework_spark.operators import dedup
from dwh_etl_framework_spark.operators.graph import dedup_clusters
from dwh_etl_framework_spark.queries.registry import fixtures, query


@query(
    "x20_dedup_clusters",
    oracle="""
    WITH RECURSIVE toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    idx AS (
        SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
        FROM toks WHERE len(t) >= 3
    ),
    sh AS (
        SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
        FROM idx
    ),
    counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT i.doc_a, i.doc_b
        FROM inter i
        JOIN counts ca ON i.doc_a = ca.doc_id
        JOIN counts cb ON i.doc_b = cb.doc_id
        WHERE CAST(i.n_common AS DOUBLE) / (ca.n + cb.n - i.n_common) >= 0.5
    ),
    edges AS (
        SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION ALL SELECT doc_b, doc_a FROM pairs
    ),
    reach AS (
        SELECT u AS node, v AS reachable FROM edges
        UNION
        SELECT r.node, e.v
        FROM reach r JOIN edges e ON r.reachable = e.u
    ),
    cc AS (
        SELECT node, LEAST(node, MIN(reachable)) AS component
        FROM reach GROUP BY node
    )
    SELECT d.doc_id,
           COALESCE(cc.component, d.doc_id) AS cluster,
           d.doc_id = COALESCE(cc.component, d.doc_id) AS is_survivor
    FROM documents d LEFT JOIN cc ON d.doc_id = cc.node
    """,
)
def x20_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 clustering: exact-Jaccard pairs (J ≥ 0.5, the x02 graph) fed into

    iterative connected components (operators/graph.py); every document gets
    (cluster = min reachable doc_id, is_survivor). Oracle: recursive-CTE
    transitive closure in DuckDB."""
    t = fixtures(spark, sf_dir)
    pairs = dedup.ngram_jaccard_pairs(
        t.documents, "text", "doc_id", n=3, threshold=0.5
    ).select("doc_a", "doc_b")
    return dedup_clusters(t.documents, pairs, "doc_id")
