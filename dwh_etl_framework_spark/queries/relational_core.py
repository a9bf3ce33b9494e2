"""Core relational operators R1-R15 (SURVEY.md §2b) over the TPC-H-ish

fixtures. Reference grounding per-query in docstrings (`airflow_etl.py` is
``/root/reference/src/airflow_dwh_etl_framework/etl/airflow_etl.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dwh_etl_framework_spark.plans.params import fill_sql_parameters
from dwh_etl_framework_spark.queries.registry import fixtures, query


@query(
    "r01_projection",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal FROM customer
    """,
)
def r01_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1 projection/column select (generated `SELECT {all_columns}`,

    airflow_etl.py:170). Catalyst prunes the parquet scan to 3 columns."""
    t = fixtures(spark, sf_dir)
    return t.customer.select("c_custkey", "c_name", "c_acctbal")


@query(
    "r02_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24.0
    """,
)
def r02_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2 predicate filter (WHERE chains, airflow_etl.py:175,:192). All

    conjuncts push down to the parquet scan (PushedFilters)."""
    t = fixtures(spark, sf_dir)
    return t.lineitem.filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24.0)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


@query(
    "r03_window_row_number",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey ASC
           ) AS INTEGER) AS rnk
    FROM orders
    """,
)
def r03_window_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R3 row_number with multi-key partition + mixed-direction order —

    exactly the journal-merge ranking shape (airflow_etl.py:171-172)."""
    t = fixtures(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").asc()
    )
    return t.orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.row_number().over(w).alias("rnk"),
    )


@query(
    "r04_top1_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY o_custkey
            ORDER BY o_orderdate DESC, o_orderkey ASC
        ) AS rnk
        FROM orders
    ) WHERE rnk = 1
    """,
)
def r04_top1_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R4 latest-record-wins dedup — the journal-merge core

    (airflow_etl.py:166-177): rank rows per key, keep rank 1."""
    t = fixtures(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").asc()
    )
    return (
        t.orders.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    )


@query(
    "r05_left_join",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name, r.r_name
    FROM customer c
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def r05_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R5 LEFT OUTER equi-join chain (information_schema query shape,

    airflow_etl.py:116-124). nation/region are broadcast: no shuffle of
    customer at any scale."""
    t = fixtures(spark, sf_dir)
    return (
        t.customer.join(
            F.broadcast(t.nation),
            t.customer.c_nationkey == t.nation.n_nationkey,
            "left",
        )
        .join(
            F.broadcast(t.region),
            F.col("n_regionkey") == F.col("r_regionkey"),
            "left",
        )
        .select("c_custkey", "c_name", "n_name", "r_name")
    )


@query(
    "r06_case_when",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'high'
                WHEN o_orderpriority = '3-MEDIUM' THEN 'medium'
                ELSE 'low' END AS priority_class,
           CASE WHEN o_orderstatus = 'F' THEN 'Y' ELSE 'N' END AS is_final
    FROM orders
    """,
)
def r06_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R6 CASE WHEN (pk-flag derivation, airflow_etl.py:114)."""
    t = fixtures(spark, sf_dir)
    return t.orders.select(
        "o_orderkey",
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high")
        .when(F.col("o_orderpriority") == "3-MEDIUM", "medium")
        .otherwise("low")
        .alias("priority_class"),
        F.when(F.col("o_orderstatus") == "F", "Y").otherwise("N").alias("is_final"),
    )


@query(
    "r07_distinct",
    oracle="""
    SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
    """,
)
def r07_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R7 DISTINCT (SELECT DISTINCT {pk}, airflow_etl.py:190-191); plans as

    a partial+final hash aggregate, map-side combined."""
    t = fixtures(spark, sf_dir)
    return t.customer.select("c_mktsegment", "c_nationkey").distinct()


@query(
    "r08_anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def r08_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R8 anti-join = the delta-merge DELETE..USING semantics

    (airflow_etl.py:185-196): customers with no orders."""
    t = fixtures(spark, sf_dir)
    return t.customer.join(
        t.orders, t.customer.c_custkey == t.orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "r09_sort_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 25
    """,
)
def r09_sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R9+R20 global sort + LIMIT; Spark plans TakeOrderedAndProject (no full

    sort materialization — each partition keeps 25, driver merges)."""
    t = fixtures(spark, sf_dir)
    return (
        t.orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "r10_update_where",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 0.0 ELSE c_acctbal END AS acctbal_adj,
           CASE WHEN c_acctbal < 0 THEN 'Y' ELSE 'N' END AS was_negative
    FROM customer
    """,
)
def r10_update_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R10 UPDATE..WHERE as conditional column rewrite (journal state flip

    shape, airflow_etl.py:216-223)."""
    t = fixtures(spark, sf_dir)
    return t.customer.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, F.lit(0.0))
        .otherwise(F.col("c_acctbal"))
        .alias("acctbal_adj"),
        F.when(F.col("c_acctbal") < 0, "Y").otherwise("N").alias("was_negative"),
    )


@query(
    "r11_union_append",
    oracle="""
    SELECT o_orderkey, o_totalprice, 'open' AS bucket
    FROM orders WHERE o_orderstatus = 'O'
    UNION ALL
    SELECT o_orderkey, o_totalprice, 'final' AS bucket
    FROM orders WHERE o_orderstatus = 'F'
    """,
)
def r11_union_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R11 INSERT-SELECT/append as UNION ALL (journal append,

    airflow_etl.py:166-177); unionByName so column order can't drift."""
    t = fixtures(spark, sf_dir)
    open_ = t.orders.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey", "o_totalprice", F.lit("open").alias("bucket")
    )
    final = t.orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_totalprice", F.lit("final").alias("bucket")
    )
    return open_.unionByName(final)


@query(
    "r13_param_predicate",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate, l_extendedprice
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01'
      AND l_quantity >= 30.0
    """,
)
def r13_param_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R13 parameterized predicate via the engine's F10 templating

    (fill_sql_parameters, reference airflow_etl.py:378-399 / README
    report_date convention) — runs through spark.sql like a real select step
    (F7/F11)."""
    fixtures(spark, sf_dir)
    sql = fill_sql_parameters(
        """
        SELECT l_orderkey, l_linenumber, l_shipdate, l_extendedprice
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '{report_date}'
          AND l_quantity >= {min_qty}
        """,
        {"report_date": "1998-09-01", "min_qty": 30.0},
    )
    return spark.sql(sql)


@query(
    "r14_inner_join_agg",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
               AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def r14_inner_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R14 inner equi-joins + grouped agg (revenue per nation, the documented

    multi-dependency SELECT-step shape, README.md:89-150). nation is
    broadcast; customer is left to Catalyst/AQE (broadcastable at small SF,
    shuffled at 100 TB where it no longer fits); lineitem⋈orders shuffles
    once on orderkey. Revenue is decimal so the reduction is exact
    (order-independent)."""
    t = fixtures(spark, sf_dir)
    revenue = F.col("l_extendedprice").cast("decimal(14,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    return (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            # exact decimal reduction, then ONE terminal double conversion —
            # DECIMAL must never reach the output schema (driver-hasher rule)
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "r15_semi_join",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000
    )
    """,
)
def r15_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R15 left-semi join (EXISTS in step SQL surface, airflow_etl.py:251)."""
    t = fixtures(spark, sf_dir)
    big = t.orders.filter(F.col("o_totalprice") > 100000)
    return t.customer.join(
        big, t.customer.c_custkey == big.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")
