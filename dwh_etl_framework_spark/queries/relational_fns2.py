"""Second-wave scalar functions (R22/R23): more string/date surface, plus

pivot-style conditional aggregation and ordered string aggregation."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dwh_etl_framework_spark.queries.registry import fixtures, query


@query(
    "r22b_string_more",
    oracle="""
    SELECT p_partkey,
           translate(p_name, 'aeiou', '12345') AS name_translated,
           repeat(p_brand, 2) AS brand_twice,
           reverse(p_name) AS name_reversed,
           replace(p_type, 'O', '0') AS type_zeroed,
           left(p_name, 5) AS name_left5,
           right(p_name, 3) AS name_right3,
           CAST(strpos(p_name, 'widget') AS INTEGER) AS widget_pos,
           starts_with(p_type, 'PRO') AS is_promo,
           contains(p_name, 'bolt') AS has_bolt,
           CAST(ascii(p_brand) AS INTEGER) AS first_char_code
    FROM part
    """,
)
def r22b_string_more(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R22 extended string surface (translate/repeat/reverse/left/right/

    instr/startswith/contains/ascii), all codegen'd JVM expressions."""
    t = fixtures(spark, sf_dir)
    return t.part.select(
        "p_partkey",
        F.translate("p_name", "aeiou", "12345").alias("name_translated"),
        F.repeat("p_brand", 2).alias("brand_twice"),
        F.reverse("p_name").alias("name_reversed"),
        F.replace(F.col("p_type"), F.lit("O"), F.lit("0")).alias("type_zeroed"),
        F.substring("p_name", 1, 5).alias("name_left5"),
        F.col("p_name").substr(F.length("p_name") - 2, F.lit(3)).alias(
            "name_right3"
        ),
        F.instr("p_name", "widget").alias("widget_pos"),
        F.startswith(F.col("p_type"), F.lit("PRO")).alias("is_promo"),
        F.contains(F.col("p_name"), F.lit("bolt")).alias("has_bolt"),
        F.ascii("p_brand").alias("first_char_code"),
    )


@query(
    "r23b_date_more",
    oracle="""
    SELECT o_orderkey,
           CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow_sunday1,
           CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
           CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
           CAST(o_orderdate AS DATE) + 30 AS plus30d,
           CAST(o_orderdate AS DATE) - 7 AS minus7d,
           make_date(CAST(year(o_orderdate) AS INTEGER),
                     CAST(month(o_orderdate) AS INTEGER), 1) AS month_first,
           CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start,
           CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter_start
    FROM orders
    """,
)
def r23b_date_more(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R23 extended date surface. DuckDB dayofweek is 0=Sunday vs Spark

    1=Sunday — the oracle shifts; everything else aligns directly."""
    t = fixtures(spark, sf_dir)
    d = F.col("o_orderdate").cast("date")
    return t.orders.select(
        "o_orderkey",
        F.dayofweek("o_orderdate").alias("dow_sunday1"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.weekofyear("o_orderdate").alias("iso_week"),
        F.date_add(d, 30).alias("plus30d"),
        F.date_sub(d, 7).alias("minus7d"),
        F.make_date(F.year("o_orderdate"), F.month("o_orderdate"), F.lit(1)).alias(
            "month_first"
        ),
        F.date_trunc("week", "o_orderdate").cast("date").alias("week_start"),
        F.date_trunc("quarter", "o_orderdate").cast("date").alias("quarter_start"),
    )


@query(
    "x13_pivot",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CASE WHEN o.o_orderstatus = 'O'
                    THEN CAST(o.o_totalprice AS DECIMAL(14,2)) END)
                AS DOUBLE) AS open_total,
           CAST(SUM(CASE WHEN o.o_orderstatus = 'F'
                    THEN CAST(o.o_totalprice AS DECIMAL(14,2)) END)
                AS DOUBLE) AS final_total,
           CAST(SUM(CASE WHEN o.o_orderstatus = 'P'
                    THEN CAST(o.o_totalprice AS DECIMAL(14,2)) END)
                AS DOUBLE) AS partial_total
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def x13_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R18-adjacent PIVOT: order totals per nation spread across status

    columns. Explicit pivot value list ⇒ deterministic output schema and a
    single aggregation pass (no second job to discover values)."""
    t = fixtures(spark, sf_dir)
    joined = (
        t.orders.join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    pivoted = (
        joined.groupBy("n_name")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.sum(F.col("o_totalprice").cast("decimal(14,2)")))
    )
    return pivoted.select(
        "n_name",
        F.col("O").cast("double").alias("open_total"),
        F.col("F").cast("double").alias("final_total"),
        F.col("P").cast("double").alias("partial_total"),
    )


@query(
    "x14_listagg",
    oracle="""
    SELECT c_nationkey,
           string_agg(c_name, ',' ORDER BY c_name) AS customer_names,
           COUNT(*) AS n_customers
    FROM customer
    GROUP BY c_nationkey
    """,
)
def x14_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R16-adjacent ordered string aggregation (LISTAGG): collect_list →

    array_sort → array_join gives a deterministic order-insensitive-input
    result (the sort makes shuffle order irrelevant)."""
    t = fixtures(spark, sf_dir)
    return t.customer.groupBy("c_nationkey").agg(
        F.array_join(F.array_sort(F.collect_list("c_name")), ",").alias(
            "customer_names"
        ),
        F.count(F.lit(1)).alias("n_customers"),
    )


@query(
    "r12_truncate_reload",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_rows
    FROM customer
    WHERE c_acctbal > 0
    GROUP BY c_mktsegment
    """,
)
def r12_truncate_reload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R12/F16 truncate+full-reload: overwrite a managed parquet location

    with the filtered relation, then serve from the reloaded table — the
    write path (sources/sinks.overwrite_table) is part of the checked
    surface, not just the read path."""
    import tempfile

    from dwh_etl_framework_spark.sources.sinks import overwrite_table

    t = fixtures(spark, sf_dir)
    target = f"{tempfile.gettempdir()}/dwh_etl_framework_spark_r12"
    overwrite_table(
        t.customer.filter(F.col("c_acctbal") > 0),
        target,
        target_file_partitions=4,
    )
    return (
        spark.read.parquet(target)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
