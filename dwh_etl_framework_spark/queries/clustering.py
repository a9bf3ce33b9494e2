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


@query(
    "x52_cluster_canonical",
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
    ),
    membered AS (
        SELECT d.doc_id,
               COALESCE(cc.component, d.doc_id) AS cluster,
               CAST(len(list_distinct(string_split(d.text, ' '))) AS BIGINT)
                   AS n_distinct
        FROM documents d LEFT JOIN cc ON d.doc_id = cc.node
    ),
    ranked AS (
        SELECT *,
               row_number() OVER (
                   PARTITION BY cluster
                   ORDER BY n_distinct DESC, doc_id ASC
               ) AS rn,
               first_value(doc_id) OVER (
                   PARTITION BY cluster
                   ORDER BY n_distinct DESC, doc_id ASC
               ) AS canonical_id
        FROM membered
    )
    SELECT doc_id, cluster, n_distinct, canonical_id,
           rn = 1 AS is_canonical
    FROM ranked
    """,
)
def x52_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 canonical selection per dedup cluster — the "which duplicate do

    we keep" step after clustering: within each connected component of
    the near-dup graph (the x20 clusters) the document with the richest
    vocabulary (distinct-token count, doc_id tiebreak) becomes the
    canonical survivor; every member points at it.

    Scale shape: reuses the iterative connected-components operator
    (1 Spark job/iteration, operators/graph.py), one map-side distinct
    count per doc, then a single window over the cluster key — cluster
    cardinality is corpus-sized but each partition holds whole (small)
    clusters, so the rank never sees skew beyond the largest cluster,
    which dedup's bucket caps already bound upstream."""
    t = fixtures(spark, sf_dir)
    from pyspark.sql import Window

    pairs = dedup.ngram_jaccard_pairs(
        t.documents, "text", "doc_id", n=3, threshold=0.5
    ).select("doc_a", "doc_b")
    # round-7 lineage cut: the vertex list and the vocabulary score both
    # derive from ONE documents pass (quality carries doc_id) — uncut,
    # dedup_clusters' vertex scan and this projection each read
    # documents.parquet (x65/x87 rule).
    quality = t.documents.select(
        "doc_id",
        F.size(F.array_distinct(F.split("text", " ")))
        .cast("bigint")
        .alias("n_distinct"),
    ).localCheckpoint(eager=False)
    clusters = dedup_clusters(quality.select("doc_id"), pairs, "doc_id").select(
        "doc_id", "cluster"
    )
    w = Window.partitionBy("cluster").orderBy(
        F.desc("n_distinct"), F.asc("doc_id")
    )
    return (
        clusters.join(quality, "doc_id")
        .withColumn("__rn", F.row_number().over(w))
        .withColumn("canonical_id", F.first("doc_id").over(w))
        .select(
            "doc_id",
            "cluster",
            "n_distinct",
            "canonical_id",
            (F.col("__rn") == 1).alias("is_canonical"),
        )
    )
