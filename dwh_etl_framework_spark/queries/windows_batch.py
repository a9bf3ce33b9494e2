"""Time-window aggregation R30-R31 in batch form (SURVEY.md §2b).

Streaming execution of the same plans (readStream + watermark +
writeStream) lives in ``dwh_etl_framework_spark/streaming`` with
batch-equivalence tests; the driver's DuckDB oracle checks the batch
semantics here. ``events.ts`` is ns in parquet — both engines are pinned to
µs (Spark truncates on read; the oracle casts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dwh_etl_framework_spark.queries.registry import fixtures, query

_VAL = "CAST(value AS DECIMAL(12,2))"


@query(
    "r30_tumbling_window",
    oracle=f"""
    SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS window_start,
           time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP))
               + INTERVAL '1 hour' AS window_end,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM({_VAL}) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def r30_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R30 tumbling-window aggregate (the reference's declared-but-stub

    delta/incremental mode done right, airflow_etl.py:452-463). Same plan
    runs under Structured Streaming with a watermark (see streaming/)."""
    t = fixtures(spark, sf_dir)
    w = F.window("ts", "1 hour")
    return (
        t.events.groupBy(w, "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "r31_sliding_window",
    oracle=f"""
    WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, value FROM events),
    assigned AS (
        SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start, value FROM e
        UNION ALL
        SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes', value
        FROM e
    )
    SELECT window_start,
           window_start + INTERVAL '1 hour' AS window_end,
           COUNT(*) AS n_events,
           CAST(SUM({_VAL}) AS DOUBLE) AS sum_value
    FROM assigned
    GROUP BY 1, 2
    """,
)
def r31_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R31 sliding windows (1h length, 30m slide ⇒ each event lands in

    exactly 2 windows; the oracle materializes that assignment with a
    UNION ALL)."""
    t = fixtures(spark, sf_dir)
    return (
        t.events.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "r32_watermark_late_filter",
    oracle=f"""
    WITH e AS (
        SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
        FROM events
    ),
    wm AS (
        SELECT *,
               MAX(ts) OVER (
                   ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS high_wm
        FROM e
    ),
    kept AS (SELECT * FROM wm WHERE ts >= high_wm - INTERVAL '1 hour')
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM({_VAL}) AS DOUBLE) AS sum_value
    FROM kept
    GROUP BY 1, 2
    """,
)
def r32_watermark_late_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R32 late-data semantics as a HASH-CHECKABLE batch twin: replay the

    events in arrival order (event_id), maintain the high watermark
    (running max event time − 1 h delay), drop events that arrive below
    it, then window-aggregate the survivors — exactly what
    ``streaming/windows.py`` does with ``withWatermark`` (whose drops the
    pytest replay asserts but no SQL oracle could check until now).

    The running max uses a GLOBAL arrival-order window because stream
    arrival order is inherently sequential — this twin exists to pin the
    drop semantics for the oracle at validation scale and is not a
    production operator (the production path IS the watermarked stream,
    where the engine tracks the watermark in O(1) state); it is excluded
    from bench headliners."""
    t = fixtures(spark, sf_dir)
    w = Window.orderBy("event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    kept = (
        t.events.withColumn("__high_wm", F.max("ts").over(w))
        .filter(F.col("ts") >= F.col("__high_wm") - F.expr("INTERVAL 1 HOUR"))
    )
    return (
        kept.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "r31b_session_window",
    oracle="""
    WITH e AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
    ),
    marked AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                         OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                            >= INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS new_session
        FROM e
    ),
    sessions AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_id
        FROM marked
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def r31b_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R31 session windows (30m gap) per user. Spark's session_window merges

    events whose [ts, ts+gap) intervals overlap; the oracle reproduces that
    with gaps-and-islands SQL (session end = last event + gap)."""
    t = fixtures(spark, sf_dir)
    return (
        t.events.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "r33b_interval_join_twin",
    oracle="""
    WITH c AS (SELECT user_id, event_id AS click_id,
                      CAST(ts AS TIMESTAMP) AS cts
               FROM events WHERE event_type = 'click'),
         p AS (SELECT user_id, event_id AS purchase_id,
                      CAST(ts AS TIMESTAMP) AS pts
               FROM events WHERE event_type = 'purchase')
    SELECT c.user_id, click_id, purchase_id,
           CAST(date_diff('second', cts, pts) AS BIGINT) AS gap_s
    FROM c JOIN p
      ON c.user_id = p.user_id
     AND pts >= cts
     AND pts <= cts + INTERVAL 30 MINUTE
    """,
)
def r33b_interval_join_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R33 stream-stream interval join, batch twin: purchases attributed to

    a same-user click at most 30 minutes earlier — THE SAME OPERATOR
    (``streaming.join.interval_join``) the streaming tests replay over file
    streams; on batch frames the watermarks are no-ops, so this entry
    hash-checks the join condition itself against DuckDB while
    ``tests/test_stream_join.py`` checks the streaming execution (state
    eviction, multi-micro-batch, out-of-order arrival) agrees with it."""
    from dwh_etl_framework_spark.streaming.join import interval_join

    t = fixtures(spark, sf_dir)
    clicks = t.events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), "ts"
    )
    purchases = t.events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )
    joined = interval_join(
        clicks, purchases, on="user_id", lookback="30 minutes"
    )
    return joined.select(
        "user_id",
        "l_click_id",
        "r_purchase_id",
        (F.unix_timestamp("r_ts") - F.unix_timestamp("l_ts")).alias("gap_s"),
    ).withColumnsRenamed({"l_click_id": "click_id", "r_purchase_id": "purchase_id"})
