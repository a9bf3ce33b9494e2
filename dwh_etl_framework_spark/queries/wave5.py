"""Fifth wave: scalable range join, event-transition matrix, approximate

percentiles — closing out R24/R28-adjacent surface."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dwh_etl_framework_spark.operators.rangejoin import range_join
from dwh_etl_framework_spark.queries.registry import fixtures, query


@query(
    "x24_range_join",
    oracle="""
    WITH bands AS (
        SELECT * FROM (VALUES
            ('tiny',   0.0,    1000.0),
            ('small',  1000.0, 10000.0),
            ('medium', 10000.0, 50000.0),
            ('large',  50000.0, 100000.0)
        ) AS t(band, lo, hi)
    )
    SELECT b.band,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))) AS DECIMAL(18,2))
               AS total_price
    FROM lineitem l
    JOIN bands b ON l.l_extendedprice >= b.lo AND l.l_extendedprice < b.hi
    GROUP BY b.band
    """,
)
def x24_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: price bands × lineitem without a nested-loop join —

    intervals exploded into fixed-width buckets, equi-join on bucket +
    residual BETWEEN (operators/rangejoin.py). The oracle is the plain
    theta join: banding changes the plan, never the result."""
    t = fixtures(spark, sf_dir)
    bands = spark.createDataFrame(
        [("tiny", 0.0, 1000.0), ("small", 1000.0, 10000.0),
         ("medium", 10000.0, 50000.0), ("large", 50000.0, 100000.0)],
        "band string, lo double, hi double",
    )
    joined = range_join(
        t.lineitem.select("l_orderkey", "l_extendedprice"),
        bands,
        value_col="l_extendedprice",
        lo_col="lo",
        hi_col="hi",
        bucket_width=1000.0,
    )
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("l_extendedprice").cast("decimal(14,2)"))
        .cast("decimal(18,2)")
        .alias("total_price"),
    )


@query(
    "x25_event_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (
                   PARTITION BY user_id
                   ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC
               ) AS next_type
        FROM events
    )
    SELECT event_type, next_type, COUNT(*) AS n_transitions
    FROM seq
    WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
)
def x25_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-transition matrix (Markov counts): each user's event sequence

    → (event, next event) pair counts. lead() over (user, time) — one keyed
    shuffle — then a small aggregation; the behavioral-analytics staple."""
    t = fixtures(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return (
        t.events.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


@query("r24e_approx_percentiles", oracle=None)
def r24e_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R24 approximate percentiles (Greenwald-Khanna sketch,

    ``approx_percentile``): the at-scale path where exact sorting is too
    expensive. No oracle — sketch internals are engine-specific; the exact
    twin r24c_percentiles carries the value check, and accuracy parameter
    1000 bounds rank error to 0.1%."""
    t = fixtures(spark, sf_dir)
    return t.orders.groupBy("o_orderpriority").agg(
        F.percentile_approx("o_totalprice", [0.5, 0.9, 0.99], 1000).alias(
            "approx_p50_p90_p99"
        )
    )
