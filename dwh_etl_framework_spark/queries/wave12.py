"""Round-7 wave: time-sliced corpus health.

**x89_drift_timeline** is the time axis VERDICT r6 asked for on the x65
drift monitor: per-(source, month) total-variation distance between each
ingest slice's token distribution and that source's full-history
distribution. The fixture has no date column, so the slice key is a
deterministic pseudo-date derived from doc_id (``doc_id % 365`` days
from 2024-01-01) — the derivation is part of the query text in BOTH
engines, so the oracle checks the whole pipeline including the axis.
A real deployment swaps the derivation for its ingest date column; the
rest of the plan is unchanged.

This is the monitor a curation team runs per ingest batch: a (source,
month) whose tv_ppm jumps against the source's own history means the
source changed its content mix mid-stream (scraper drift, upstream
format change, injected spam) even when the source's aggregate drift
vs the corpus (x65) still looks flat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dwh_etl_framework_spark.queries.registry import fixtures, query

#: pseudo-date: documents carry no timestamp, so slices derive from
#: doc_id — deterministic, uniform across a year, identical SQL text in
#: both engines modulo the date-format call.
SPARK_MONTH = (
    "date_format(date_add(DATE '2024-01-01', "
    "CAST(doc_id % 365 AS INT)), 'yyyy-MM')"
)
DUCK_MONTH = (
    "strftime(DATE '2024-01-01' + CAST(doc_id % 365 AS INT), '%Y-%m')"
)


@query(
    "x89_drift_timeline",
    oracle=f"""
    WITH st AS (
        SELECT source, {DUCK_MONTH} AS month,
               unnest(string_split(text, ' ')) AS token
        FROM documents
    ),
    c AS (
        SELECT source, month, token, CAST(COUNT(*) AS BIGINT) AS c_smt
        FROM st GROUP BY source, month, token
    ),
    n_sm AS (
        SELECT source, month, CAST(SUM(c_smt) AS BIGINT) AS n_slice
        FROM c GROUP BY source, month
    ),
    cs AS (
        SELECT source, token, CAST(SUM(c_smt) AS BIGINT) AS c_st
        FROM c GROUP BY source, token
    ),
    ns AS (
        SELECT source, CAST(SUM(c_st) AS BIGINT) AS n_s FROM cs GROUP BY source
    ),
    q AS (
        SELECT cs.source, cs.token,
               CAST(cs.c_st * 1000000 // ns.n_s AS BIGINT) AS q_ppm
        FROM cs JOIN ns ON ns.source = cs.source
    ),
    qtot AS (
        SELECT source, CAST(SUM(q_ppm) AS BIGINT) AS q_total
        FROM q GROUP BY source
    ),
    p AS (
        SELECT c.source, c.month, c.token,
               CAST(c.c_smt * 1000000 // n_sm.n_slice AS BIGINT) AS p_ppm
        FROM c JOIN n_sm ON n_sm.source = c.source AND n_sm.month = c.month
    ),
    per AS (
        SELECT p.source, p.month,
               CAST(SUM(abs(p.p_ppm - q.q_ppm)) AS BIGINT) AS present_diff,
               CAST(SUM(q.q_ppm) AS BIGINT) AS q_present
        FROM p JOIN q ON q.source = p.source AND q.token = p.token
        GROUP BY p.source, p.month
    )
    SELECT per.source, per.month, n_sm.n_slice AS n_tokens,
           CAST((per.present_diff + qtot.q_total - per.q_present) // 2
                AS BIGINT) AS tv_ppm
    FROM per
    JOIN n_sm ON n_sm.source = per.source AND n_sm.month = per.month
    JOIN qtot ON qtot.source = per.source
    """,
)
def x89_drift_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 drift over TIME: per-(source, month) TV distance vs the source's

    own full-history token distribution, exact integer ppm. Same log-free
    ½·Σ|p−q| decomposition as x65 — Σ_present|p−q| + (Q_total −
    Σ_present q) charges tokens the slice never emits without a
    |slices|×|vocab| cross product. Against the source's OWN history
    rather than the corpus: a per-ingest mix change is visible even when
    the source's aggregate x65 drift stays flat.

    Scale shape: ONE corpus-proportional exchange — the (source, month,
    token) count, map-side combined, then localCheckpoint'd (the x65
    lineage-cut rule): the slice totals, the source-level rollup, and the
    p⋈q join all read the materialized vocabulary×months table instead
    of re-running the explode over the corpus. The source-level q table
    derives from that SAME table by a second (vocab-sized, not
    corpus-sized) aggregate. Per-source scalar totals ride a broadcast
    join. Corpus text is scanned once; nothing wider than
    (source, month, token) ever shuffles."""
    t = fixtures(spark, sf_dir)
    c = (
        t.documents.select(
            "source",
            F.expr(SPARK_MONTH).alias("month"),
            F.explode(F.split("text", " ")).alias("token"),
        )
        .groupBy("source", "month", "token")
        .agg(F.count(F.lit(1)).alias("c_smt"))
        # lazy: the corpus scan lands inside the timed action (bench rule)
        .localCheckpoint(eager=False)
    )
    n_sm = c.groupBy("source", "month").agg(F.sum("c_smt").alias("n_slice"))
    cs = c.groupBy("source", "token").agg(F.sum("c_smt").alias("c_st"))
    ns = cs.groupBy("source").agg(F.sum("c_st").alias("n_s"))
    q = cs.join(ns, "source").select(
        "source",
        "token",
        F.expr("CAST(c_st * 1000000 div n_s AS BIGINT)").alias("q_ppm"),
    )
    qtot = F.broadcast(q.groupBy("source").agg(F.sum("q_ppm").alias("q_total")))
    p = c.join(n_sm, ["source", "month"]).select(
        "source",
        "month",
        "token",
        F.expr("CAST(c_smt * 1000000 div n_slice AS BIGINT)").alias("p_ppm"),
    )
    per = (
        p.join(q, ["source", "token"])
        .groupBy("source", "month")
        .agg(
            F.sum(F.abs(F.col("p_ppm") - F.col("q_ppm"))).alias(
                "present_diff"
            ),
            F.sum("q_ppm").alias("q_present"),
        )
    )
    return (
        per.join(n_sm, ["source", "month"])
        .join(qtot, "source")
        .select(
            "source",
            "month",
            F.col("n_slice").cast("long").alias("n_tokens"),
            F.expr(
                "CAST((present_diff + q_total - q_present) div 2 AS BIGINT)"
            ).alias("tv_ppm"),
        )
    )
