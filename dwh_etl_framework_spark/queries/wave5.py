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
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))) AS DOUBLE)
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
    # SQL VALUES → JVM LocalRelation: known stats, no Python-worker scan
    # inside the broadcast build (createDataFrame goes through a Python RDD
    # whose size Catalyst can't estimate)
    bands = spark.sql(
        """
        SELECT band, CAST(lo AS DOUBLE) AS lo, CAST(hi AS DOUBLE) AS hi
        FROM VALUES ('tiny', 0.0, 1000.0), ('small', 1000.0, 10000.0),
                    ('medium', 10000.0, 50000.0), ('large', 50000.0, 100000.0)
             AS t(band, lo, hi)
        """
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
        .cast("double")
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


@query(
    "x26_date_dimension",
    oracle="""
    SELECT CAST(d AS DATE) AS date_key,
           CAST(year(d) AS INTEGER) AS year,
           CAST(month(d) AS INTEGER) AS month,
           CAST(dayofmonth(d) AS INTEGER) AS day,
           CAST(quarter(d) AS INTEGER) AS quarter,
           CAST(weekofyear(d) AS INTEGER) AS iso_week,
           CAST(dayofweek(d) + 1 AS INTEGER) AS dow_sunday1,
           dayofweek(d) IN (0, 6) AS is_weekend,
           CAST(date_trunc('month', d) AS DATE) AS month_start,
           last_day(CAST(d AS DATE)) AS month_end
    FROM generate_series(DATE '1995-01-01', DATE '1996-12-31',
                         INTERVAL 1 DAY) AS t(d)
    """,
)
def x26_date_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generated date dimension (calendar spine) — the conformed dimension

    every DWH needs and the reference never builds: sequence() + explode
    generates it *in-engine* (no source table), with the standard calendar
    attributes. At scale this materializes once and broadcasts everywhere."""
    fixtures(spark, sf_dir)
    d = F.col("date_key")
    return (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.lit("1995-01-01").cast("date"),
                    F.lit("1996-12-31").cast("date"),
                    F.expr("INTERVAL 1 DAY"),
                )
            ).alias("date_key")
        )
        .select(
            "date_key",
            F.year(d).alias("year"),
            F.month(d).alias("month"),
            F.dayofmonth(d).alias("day"),
            F.quarter(d).alias("quarter"),
            F.weekofyear(d).alias("iso_week"),
            F.dayofweek(d).alias("dow_sunday1"),
            F.dayofweek(d).isin(1, 7).alias("is_weekend"),
            F.date_trunc("month", d).cast("date").alias("month_start"),
            F.last_day(d).alias("month_end"),
        )
    )
