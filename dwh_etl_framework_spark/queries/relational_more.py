"""Second-wave relational coverage: outer joins, analytic window extras,

offset pagination, subqueries, statistical aggregates, percentiles —
rounding out SURVEY.md §2b groups R5/R15/R19/R20/R24.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dwh_etl_framework_spark.queries.registry import fixtures, query


@query(
    "r05b_full_outer_join",
    oracle="""
    WITH cust AS (
        SELECT c_nationkey AS nk, COUNT(*) AS n_customers
        FROM customer GROUP BY c_nationkey
    ),
    supp AS (
        SELECT s_nationkey AS nk, COUNT(*) AS n_suppliers
        FROM supplier GROUP BY s_nationkey
    )
    SELECT COALESCE(c.nk, s.nk) AS nationkey,
           COALESCE(c.n_customers, 0) AS n_customers,
           COALESCE(s.n_suppliers, 0) AS n_suppliers
    FROM cust c FULL OUTER JOIN supp s ON c.nk = s.nk
    """,
)
def r05b_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R5 FULL OUTER equi-join (nations having customers xor suppliers

    survive with zero-filled counts)."""
    t = fixtures(spark, sf_dir)
    cust = t.customer.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    supp = t.supplier.groupBy(F.col("s_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).alias("n_suppliers")
    )
    return (
        cust.join(supp, on="nk", how="full_outer")
        .select(
            F.col("nk").alias("nationkey"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
    )


@query(
    "r15b_in_subquery",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    )
      AND o_orderkey NOT IN (
        SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
    )
    """,
)
def r15b_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R15 IN / NOT IN subqueries (planned as semi/anti joins) — expressed

    through spark.sql to exercise the SQL-step surface (F7)."""
    fixtures(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_custkey IN (
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        )
          AND o_orderkey NOT IN (
            SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
        )
        """
    )


@query(
    "r19b_window_extras",
    oracle="""
    SELECT c_custkey, c_nationkey,
           CAST(ntile(4) OVER w AS INTEGER) AS balance_quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume,
           first_value(c_custkey) OVER w AS richest_custkey,
           nth_value(c_custkey, 2) OVER
               (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS second_richest
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
    """,
)
def r19b_window_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R19 analytic extras: ntile, percent_rank, cume_dist, first_value,

    nth_value with an explicit full-partition frame. percent_rank/cume_dist
    are rank-ratio formulas — deterministic doubles, no accumulation."""
    t = fixtures(spark, sf_dir)
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return t.customer.select(
        "c_custkey",
        "c_nationkey",
        F.ntile(4).over(w).alias("balance_quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.first("c_custkey").over(w).alias("richest_custkey"),
        F.nth_value("c_custkey", 2).over(w_full).alias("second_richest"),
    )


@query(
    "r20b_limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10 OFFSET 20
    """,
)
def r20b_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R20 pagination: total-ordered sort + OFFSET/LIMIT."""
    t = fixtures(spark, sf_dir)
    return (
        t.orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .offset(20)
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "r21c_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def r21c_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R21 UNION (distinct) — union + dedup in one shuffle."""
    t = fixtures(spark, sf_dir)
    return (
        t.customer.select(F.col("c_nationkey").alias("nationkey"))
        .unionByName(t.supplier.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )


@query(
    "r24b_exact_stats",
    oracle="""
    WITH sums AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               SUM(CAST(l_quantity AS DECIMAL(12,2))) AS s1,
               SUM(CAST(l_quantity AS DECIMAL(12,2))
                   * CAST(l_quantity AS DECIMAL(12,2))) AS s2
        FROM lineitem
        GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           CAST(s1 AS DOUBLE) / n AS mean_qty,
           (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
               / (n - 1) AS var_qty,
           sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
               / (n - 1)) AS stddev_qty
    FROM sums
    """,
)
def r24b_exact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R24 statistical aggregates with exact arithmetic: mean/variance/stddev

    derived from decimal Σx and Σx² (built-in stddev accumulates doubles in
    partition order — not reproducible across engines; this formulation is,
    and still one aggregation pass)."""
    t = fixtures(spark, sf_dir)
    q = F.col("l_quantity").cast("decimal(12,2)")
    sums = t.lineitem.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).alias("s1"),
        F.sum(q * q).alias("s2"),
    )
    s1d = F.col("s1").cast("double")
    s2d = F.col("s2").cast("double")
    n = F.col("n")
    var = (s2d - s1d * s1d / n) / (n - 1)
    return sums.select(
        "l_returnflag",
        "n",
        (s1d / n).alias("mean_qty"),
        var.alias("var_qty"),
        F.sqrt(var).alias("stddev_qty"),
    )


@query(
    "r24c_percentiles",
    oracle="""
    SELECT o_orderpriority,
           quantile_cont(o_totalprice, 0.5) AS median_price,
           quantile_cont(o_totalprice, 0.9) AS p90_price,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def r24c_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R24 exact percentiles: Spark ``percentile`` and DuckDB

    ``quantile_cont`` share the same definition (linear interpolation at
    rank (n-1)p on the sorted values) — deterministic on identical input."""
    t = fixtures(spark, sf_dir)
    return t.orders.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", 0.5).alias("median_price"),
        F.percentile("o_totalprice", 0.9).alias("p90_price"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


@query(
    "r02b_scalar_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           o_totalprice - (SELECT CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2)))
                                  AS DOUBLE) / COUNT(*) AS DOUBLE) FROM orders)
               AS delta_from_mean
    FROM orders
    WHERE o_totalprice > (SELECT CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2)))
                                 AS DOUBLE) / COUNT(*) AS DOUBLE) FROM orders)
    """,
)
def r02b_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2/R13 scalar subquery predicate: orders above the mean price

    (mean via decimal sum / count — exact, then one double division)."""
    fixtures(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice,
               o_totalprice - (SELECT CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2)))
                                      AS DOUBLE) / COUNT(*) AS DOUBLE) FROM orders)
                   AS delta_from_mean
        FROM orders
        WHERE o_totalprice > (SELECT CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2)))
                                     AS DOUBLE) / COUNT(*) AS DOUBLE) FROM orders)
        """
    )


@query(
    "r18c_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def r18c_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R18 explicit GROUPING SETS (neither pure ROLLUP nor CUBE) through the

    SQL-step surface."""
    fixtures(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS n_rows
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )
