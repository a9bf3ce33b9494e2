"""Event-analytics queries over the events stream table: funnel conversion

and cohort retention — the query class a DWH's event data exists to answer,
composed from R3/R16/R19/R23 primitives (no new physical machinery: each is
one or two keyed shuffles at any scale)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dwh_etl_framework_spark.queries.registry import fixtures, query


@query(
    "x21_funnel",
    oracle="""
    WITH su AS (
        SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS first_signup
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    pu AS (
        SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS first_purchase_after
        FROM events e JOIN su ON e.user_id = su.user_id
        WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) >= su.first_signup
        GROUP BY e.user_id
    )
    SELECT su.user_id, su.first_signup, pu.first_purchase_after,
           pu.user_id IS NOT NULL AS converted,
           CAST(CASE WHEN pu.user_id IS NOT NULL THEN
                date_diff('second', su.first_signup, pu.first_purchase_after)
           END AS BIGINT) AS seconds_to_convert
    FROM su LEFT JOIN pu ON su.user_id = pu.user_id
    """,
)
def x21_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel conversion: first signup → first subsequent purchase per user,

    with time-to-convert. Two keyed aggregations + one left join; at scale
    both aggregate map-side before one shuffle each."""
    t = fixtures(spark, sf_dir)
    # lineage cut at the SMALL table (the x65 rule): `su` (one row per
    # signed-up user) feeds both the purchase match and the final join —
    # uncut, the signup scan+agg runs twice (round-6 audit: 3 events
    # scans; now 2, one per event_type filter).
    su = (
        t.events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_signup"))
        .localCheckpoint(eager=False)
    )
    pu = (
        t.events.filter(F.col("event_type") == "purchase")
        .join(su, "user_id")
        .filter(F.col("ts") >= F.col("first_signup"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase_after"))
    )
    return (
        su.join(pu, "user_id", "left")
        .select(
            "user_id",
            "first_signup",
            "first_purchase_after",
            F.col("first_purchase_after").isNotNull().alias("converted"),
            F.when(
                F.col("first_purchase_after").isNotNull(),
                F.unix_timestamp("first_purchase_after")
                - F.unix_timestamp("first_signup"),
            ).alias("seconds_to_convert"),
        )
    )


@query(
    "x22_cohort_retention",
    oracle="""
    WITH firsts AS (
        SELECT user_id, MIN(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS cohort_day
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT e.user_id, f.cohort_day,
               date_diff('day', f.cohort_day, CAST(CAST(e.ts AS TIMESTAMP) AS DATE))
                   AS day_offset
        FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT cohort_day, CAST(day_offset AS INTEGER) AS day_offset,
           COUNT(*) AS active_users
    FROM activity
    WHERE day_offset <= 14
    GROUP BY 1, 2
    """,
)
def x22_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day, counted on each

    subsequent active day offset (the classic retention triangle)."""
    t = fixtures(spark, sf_dir)
    firsts = t.events.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("cohort_day")
    )
    activity = (
        t.events.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.col("ts").cast("date"), F.col("cohort_day")).alias(
                "day_offset"
            ),
        )
        .distinct()
    )
    return (
        activity.filter(F.col("day_offset") <= 14)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("active_users"))
    )
