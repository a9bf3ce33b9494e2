"""Round-6 wave-7: count-min sketch frequency estimation.

**x86_cms_topk** completes the repo's mergeable-sketch family — Misra-
Gries candidates (x80), bloom membership (x72), HyperLogLog distincts
(x84), and now count-min frequencies (Cormode & Muthukrishnan 2005):
d md5-hash rows × w counters, point estimate = min over rows, one-sided
error (never undercounts, overcount ≤ e·n/w w.h.p.). Counters are
SUM-mergeable the way HLL registers are MAX-mergeable, so per-day /
per-stream sketches combine without touching raw data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dwh_etl_framework_spark.operators.sketch import (
    CMS_D,
    CMS_W,
    DUCK_HEX,
    cms_col_expr,
    cms_estimate,
    cms_sketch,
)
from dwh_etl_framework_spark.queries.registry import fixtures, query

#: report the top-K users by estimated event count.
CMS_TOPK = 20

_DUCK_COL = cms_col_expr(DUCK_HEX, "user_id")

_X86_ORACLE = f"""
    WITH rows_d AS (
        SELECT user_id, unnest(generate_series(0, {CMS_D - 1})) AS r
        FROM events
    ),
    cells AS (
        SELECT r, {_DUCK_COL} AS col, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM rows_d GROUP BY 1, 2
    ),
    users AS (SELECT DISTINCT user_id FROM events),
    probes AS (
        SELECT user_id, r, {_DUCK_COL} AS col
        FROM (
            SELECT user_id, unnest(generate_series(0, {CMS_D - 1})) AS r
            FROM users
        )
    ),
    est AS (
        SELECT p.user_id, CAST(MIN(c.cnt) AS BIGINT) AS est_count
        FROM probes p
        JOIN cells c ON c.r = p.r AND c.col = p.col
        GROUP BY 1
    ),
    exact AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_count
        FROM events GROUP BY 1
    )
    SELECT e.user_id, e.est_count, x.exact_count,
           CAST(e.est_count - x.exact_count AS BIGINT) AS overcount
    FROM est e JOIN exact x ON x.user_id = e.user_id
    ORDER BY e.est_count DESC, e.user_id ASC
    LIMIT {CMS_TOPK}
"""


@query("x86_cms_topk", oracle=_X86_ORACLE)
def x86_cms_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation with the exact audit beside

    it: the {CMS_D}×{CMS_W} counter table estimates every user's event
    count (min over hash rows — never an undercount), and the top-{CMS_TOPK}
    users by estimate carry their exact counts and the one-sided
    overcount. All-integer ⇒ the oracle reproduces every counter and
    every min bit-for-bit.

    Scale shape: the sketch build is one partial+final aggregate whose
    map side reduces each partition to ≤ d·w counter rows — user ids
    never shuffle for the sketch; the probe broadcasts the ≤ d·w-row
    sketch and is map-only over the key table; the exact COUNT beside it
    is the audit (sampled at production scale). Two sketches merge by
    SUMMING counters — per-day sketches compose without raw data."""
    t = fixtures(spark, sf_dir)
    sk = cms_sketch(t.events, "user_id")
    users = t.events.select("user_id").distinct()
    est = cms_estimate(sk, users, "user_id")
    exact = t.events.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("exact_count")
    )
    return (
        est.join(exact, on="user_id")
        .select(
            "user_id",
            "est_count",
            "exact_count",
            (F.col("est_count") - F.col("exact_count"))
            .cast("long")
            .alias("overcount"),
        )
        .orderBy(F.col("est_count").desc(), F.col("user_id").asc())
        .limit(CMS_TOPK)
    )
