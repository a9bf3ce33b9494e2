"""Sessionization, user-feature materialization, embedding outliers
(SURVEY.md §2b/§2c extensions — the feature-engineering tier of an event
warehouse plus embedding QA for the vector tier).

- **x47_sessionize** — batch sessionization of the event stream: a new
  session starts after a >30-minute gap per user; per-session stats
  (event count, span, purchases). The batch twin of the streaming session
  window (R31), expressed as lag + running-sum windows so DuckDB can
  value-check it exactly. One user-keyed window shuffle reused by the
  session aggregate — at 100 TB the events table is already partitioned
  by user-affine keys and this is a single exchange.
- **x48_user_features** — per-user behavioral feature materialization
  (the feature-store pattern): event-type counts via conditional
  aggregation (no pivot shuffle), exact cent-sums for monetary values,
  active-day and span features. One user-keyed aggregate; every feature
  is map-side combinable, so the shuffle carries partial states, not
  events.
- **x49_embedding_outliers** — per-label centroid + fixed-point L2
  distance, flagging vectors > 4× their label's mean distance
  (corrupt-embedding QA before ANN indexing). All arithmetic is integer
  fixed point (µ-units) so centroids and distances are bit-identical
  across engines and reduction orders; the centroid table is
  |labels|×|dims| rows and broadcasts.

Timestamps: ``unix_timestamp`` ≡ DuckDB ``floor(epoch(...))`` (the
fixture carries µs precision, so the floor is explicit on the oracle
side; session tz pinned UTC, see session.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dwh_etl_framework_spark.queries.registry import fixtures, query

#: x47: gap (seconds) that closes a session — the classic 30 minutes.
SESSION_GAP_S = 1800

#: x49: a vector is an outlier past this multiple of its label's mean
#: squared distance.
OUTLIER_FACTOR = 4


@query(
    "x47_sessionize",
    oracle=f"""
    WITH ev AS (
        SELECT user_id, event_id, event_type,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ts_s
        FROM events
    ),
    gaps AS (
        SELECT *,
               CASE WHEN lag(ts_s) OVER w IS NULL
                         OR ts_s - lag(ts_s) OVER w > {SESSION_GAP_S}
                    THEN 1 ELSE 0 END AS is_new
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)
    ),
    sess AS (
        SELECT *,
               SUM(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts_s, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_seq
        FROM gaps
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           CAST(count(*) AS BIGINT) AS n_events,
           MIN(ts_s) AS start_s, MAX(ts_s) AS end_s,
           MAX(ts_s) - MIN(ts_s) AS duration_s,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purchases
    FROM sess
    GROUP BY user_id, session_seq
    """,
)
def x47_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (the R31 session-window twin as windows):

    a session breaks after a 30-minute silence per user; sessions are
    numbered per user in time order and aggregated. The lag and the
    running sum share one (user_id)-keyed sort/shuffle; the session
    aggregate re-keys on (user_id, session_seq), which is a refinement of
    the same partitioning, so AQE plans no second wide exchange of the
    event rows."""
    t = fixtures(spark, sf_dir)
    ev = t.events.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_timestamp("ts").alias("ts_s"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    gaps = ev.withColumn(
        "is_new",
        F.when(
            F.lag("ts_s").over(w).isNull()
            | (F.col("ts_s") - F.lag("ts_s").over(w) > SESSION_GAP_S),
            1,
        ).otherwise(0),
    )
    sess = gaps.withColumn(
        "session_seq",
        F.sum("is_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_s").alias("start_s"),
        F.max("ts_s").alias("end_s"),
        (F.max("ts_s") - F.min("ts_s")).alias("duration_s"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("n_purchases"),
    )


@query(
    "x48_user_features",
    oracle="""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purchases,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clicks,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_errors,
           CAST(sum(CASE WHEN event_type = 'purchase'
                         THEN CAST(value AS DECIMAL(14,2)) END) * 100
                AS BIGINT) AS purchase_cents,
           CAST(count(DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE))
                AS BIGINT) AS active_days,
           CAST(floor(epoch(MIN(CAST(ts AS TIMESTAMP)))) AS BIGINT)
               AS first_seen_s,
           CAST(floor(epoch(MAX(CAST(ts AS TIMESTAMP)))) AS BIGINT)
               AS last_seen_s
    FROM events
    GROUP BY user_id
    """,
)
def x48_user_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral feature materialization (the feature-store

    pattern): event-type counts as conditional aggregates — NOT a pivot,
    so there is exactly one user-keyed shuffle and every feature
    partial-aggregates map-side. Monetary sums go through DECIMAL cents
    (reduction-order-exact, r16 rule); timestamps floor to epoch
    seconds. COUNT(DISTINCT date) rewrites to a partial distinct inside
    the same aggregate (expand+two-phase), not a second shuffle of raw
    events."""
    t = fixtures(spark, sf_dir)
    typed = lambda v: F.sum(  # noqa: E731
        F.when(F.col("event_type") == v, 1).otherwise(0)
    ).cast("bigint")
    return t.events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        typed("purchase").alias("n_purchases"),
        typed("click").alias("n_clicks"),
        typed("error").alias("n_errors"),
        (
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.col("value").cast("decimal(14,2)"),
                )
            )
            * 100
        )
        .cast("bigint")
        .alias("purchase_cents"),
        F.countDistinct(F.col("ts").cast("date")).alias("active_days"),
        F.min(F.unix_timestamp("ts")).alias("first_seen_s"),
        F.max(F.unix_timestamp("ts")).alias("last_seen_s"),
    )


@query(
    "x49_embedding_outliers",
    oracle=f"""
    WITH q AS (
        SELECT vec_id, label, i AS pos,
               CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e6) AS BIGINT) AS qv
        FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
    ),
    cent AS (
        SELECT label, pos,
               CAST(floor(CAST(SUM(qv) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cq
        FROM q GROUP BY label, pos
    ),
    dist AS (
        SELECT q.vec_id, q.label,
               CAST(SUM((q.qv - cent.cq) * (q.qv - cent.cq)) AS BIGINT)
                   AS dist_fp
        FROM q JOIN cent ON cent.label = q.label AND cent.pos = q.pos
        GROUP BY q.vec_id, q.label
    ),
    lab AS (
        SELECT label,
               CAST(floor(CAST(SUM(dist_fp) AS DOUBLE) / COUNT(*)) AS BIGINT)
                   AS mean_dist_fp
        FROM dist GROUP BY label
    )
    SELECT dist.vec_id, dist.label, dist.dist_fp, lab.mean_dist_fp,
           dist.dist_fp > {OUTLIER_FACTOR} * lab.mean_dist_fp AS is_outlier
    FROM dist JOIN lab ON lab.label = dist.label
    """,
)
def x49_embedding_outliers(
    spark: SparkSession, sf_dir: str, *, lineage_cut: bool = True
) -> DataFrame:
    """X2 embedding QA: per-label centroid in integer µ-units, per-vector

    squared L2 distance to its own centroid, outlier flag past 4× the
    label's mean distance — the corrupt-embedding screen a vector store
    runs before (re)indexing.

    Exactness: elements quantize to floor(x·1e6) BIGINT once, so every
    later sum/mean/compare is integer and reduction-order-free (the
    float-sum alternative is order-dependent and engine-divergent; the
    integer centroid loses <1e-6 per dim, irrelevant for outlier
    screening). Scale shape: dims explode once; the centroid table is
    |labels|×64 rows and broadcasts back onto the exploded dims, the
    per-label mean table is |labels| rows and broadcasts onto the
    per-vector distances — the only wide exchanges are the two keyed
    partial aggregates (label,pos) and (vec_id)."""
    t = fixtures(spark, sf_dir)
    q = t.embeddings.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding")).alias("pos0", "x"),
    ).select(
        "vec_id",
        "label",
        (F.col("pos0") + 1).alias("pos"),
        F.floor(F.col("x").cast("double") * 1e6).cast("bigint").alias("qv"),
    )
    cent = q.groupBy("label", "pos").agg(
        F.floor(F.sum("qv").cast("double") / F.count(F.lit(1)))
        .cast("bigint")
        .alias("cq")
    )
    diff = F.col("qv") - F.col("cq")
    dist = (
        q.join(F.broadcast(cent), ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(F.sum(diff * diff).cast("bigint").alias("dist_fp"))
    )
    # lineage cut (the x65 rule) at the SMALL table: dist (one row per
    # vector) feeds two consumers (lab + the final join) — uncut,
    # Catalyst clones the whole explode→centroid→distance subtree per
    # consumer and the embedding array column scans 4× (plan-audited
    # round 6). The exploded q table is NOT checkpointed deliberately:
    # long-form is ~7× the array's bytes, so materializing it would cost
    # more than its two remaining scans.
    if lineage_cut:
        dist = dist.localCheckpoint(eager=False)
    lab = dist.groupBy("label").agg(
        F.floor(F.sum("dist_fp").cast("double") / F.count(F.lit(1)))
        .cast("bigint")
        .alias("mean_dist_fp")
    )
    return dist.join(F.broadcast(lab), "label").select(
        "vec_id",
        "label",
        "dist_fp",
        "mean_dist_fp",
        (F.col("dist_fp") > OUTLIER_FACTOR * F.col("mean_dist_fp")).alias(
            "is_outlier"
        ),
    )
