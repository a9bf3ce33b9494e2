"""Aggregation / window-analytics / set operators R16-R21 (SURVEY.md §2b)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dwh_etl_framework_spark.queries.registry import fixtures, query

# Decimal-exact revenue/charge terms (see registry.py determinism rules).
# Built lazily: Column construction needs an active SparkContext.
def _PRICE():
    return F.col("l_extendedprice").cast("decimal(14,2)")


def _DISC():
    return F.col("l_discount").cast("decimal(4,2)")


def _TAX():
    return F.col("l_tax").cast("decimal(4,2)")


def _QTY():
    return F.col("l_quantity").cast("decimal(12,2)")


@query(
    "r16_agg_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) * 100 AS BIGINT)
               AS sum_qty_fp,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) * 100 AS BIGINT)
               AS sum_base_price_fp,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) * 10000
               AS BIGINT) AS sum_disc_price_fp,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))
                    * (1 + CAST(l_tax AS DECIMAL(4,2)))) * 1000000
               AS BIGINT) AS sum_charge_fp,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def r16_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R16 flagship: TPC-H-Q1-shaped pricing summary (the canonical DWH

    transform-step aggregation, spark.sql surface airflow_etl.py:251).
    Map-side partial aggregation + one shuffle on the 2 group keys; decimal
    sums are exact so the result is reduction-order-independent.

    The money sums ship as fixed-point BIGINT at each expression's natural
    decimal scale (qty/price ×100, disc_price ×10⁴, charge ×10⁶): a
    decimal→DOUBLE cast stops being engine-exact once the unscaled value
    passes 2⁵³ (DuckDB's int128→double path double-rounds — observed as a
    1-ULP sum_charge mismatch at sf1), while the fixed-point integer is
    exact at any scale. The avg columns keep the one-double-division rule:
    their unscaled sums stay far below 2⁵³ at any test SF."""
    t = fixtures(spark, sf_dir)
    cnt = F.count(F.lit(1))
    return (
        t.lineitem.filter(F.col("l_shipdate") <= "1998-09-01")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # exact decimal reductions; terminal cast to BIGINT because
            # DECIMAL must never reach the output schema (driver-hasher rule)
            (F.sum(_QTY()) * 100).cast("bigint").alias("sum_qty_fp"),
            (F.sum(_PRICE()) * 100).cast("bigint").alias("sum_base_price_fp"),
            (F.sum(_PRICE() * (F.lit(1) - _DISC())) * 10000)
            .cast("bigint")
            .alias("sum_disc_price_fp"),
            (F.sum(_PRICE() * (F.lit(1) - _DISC()) * (F.lit(1) + _TAX())) * 1000000)
            .cast("bigint")
            .alias("sum_charge_fp"),
            (F.sum(_QTY()).cast("double") / cnt).alias("avg_qty"),
            (F.sum(_DISC()).cast("double") / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


@query(
    "r17_count_distinct",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def r17_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R17 exact count-distinct (Spark plans a two-phase expand+agg)."""
    t = fixtures(spark, sf_dir)
    return t.orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query("r17b_approx_count_distinct", oracle=None)
def r17b_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R17 approximate count-distinct (HyperLogLog++). No oracle: sketch

    estimates are engine-specific by construction (rows-only check); the
    exact twin r17_count_distinct carries the value check."""
    t = fixtures(spark, sf_dir)
    return t.orders.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_customers")
    )


@query(
    "r18_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def r18_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R18 ROLLUP grouping sets (subtotals + grand total)."""
    t = fixtures(spark, sf_dir)
    return t.lineitem.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(_QTY()).cast("double").alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "r18b_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def r18b_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R18 CUBE grouping sets."""
    t = fixtures(spark, sf_dir)
    return t.orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@query(
    "r19_window_analytics",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(rank() OVER w AS INTEGER) AS price_rank,
           CAST(dense_rank() OVER w AS INTEGER) AS price_dense_rank,
           lag(o_totalprice) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
               AS prev_price,
           lead(o_totalprice) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
               AS next_price,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS DOUBLE) AS running_spend
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
    """,
)
def r19_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R19 ranking + lag/lead + running aggregate with an explicit frame

    (journal ordering generalized, airflow_etl.py:172). One shuffle on
    o_custkey shared by all five window functions (same partitioning)."""
    t = fixtures(spark, sf_dir)
    w_price = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    w_time = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    w_run = w_time.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return t.orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.rank().over(w_price).alias("price_rank"),
        F.dense_rank().over(w_price).alias("price_dense_rank"),
        F.lag("o_totalprice").over(w_time).alias("prev_price"),
        F.lead("o_totalprice").over(w_time).alias("next_price"),
        F.sum(F.col("o_totalprice").cast("decimal(14,2)"))
        .over(w_run)
        .cast("double")
        .alias("running_spend"),
    )


@query(
    "r20_topk_per_group",
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal
    FROM (
        SELECT c_nationkey, c_custkey, c_acctbal,
               row_number() OVER (
                   PARTITION BY c_nationkey
                   ORDER BY c_acctbal DESC, c_custkey ASC
               ) AS rn
        FROM customer
    ) WHERE rn <= 3
    """,
)
def r20_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R20 top-k per group (3 richest customers per nation)."""
    t = fixtures(spark, sf_dir)
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        t.customer.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_nationkey", "c_custkey", "c_acctbal")
    )


@query(
    "r21_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def r21_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R21 INTERSECT (customers having both final and open orders)."""
    t = fixtures(spark, sf_dir)
    f = t.orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    o = t.orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    return f.intersect(o)


@query(
    "r21b_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey AS custkey FROM orders
    """,
)
def r21b_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R21 EXCEPT (set-difference twin of the r08 anti-join)."""
    t = fixtures(spark, sf_dir)
    return t.customer.select(F.col("c_custkey").alias("custkey")).subtract(
        t.orders.select(F.col("o_custkey").alias("custkey"))
    )
