"""Scalar function operators R22-R24 (SURVEY.md §2b).

Cross-engine determinism notes (all verified against DuckDB):
- ``round()`` is only applied to DECIMAL inputs — Spark rounds doubles on
  their shortest decimal repr (HALF_UP) while DuckDB rounds the binary
  value, so ``round(DOUBLE)`` can differ on .5 boundaries. Decimal rounding
  is exact half-away-from-zero in both.
- libm-backed fns (exp/log/pow) are avoided: JVM StrictMath vs C libm can
  differ in the last ulp. sqrt is IEEE-exact, so it's fine.
- count/length-ish fns: DuckDB returns BIGINT where Spark returns INT —
  both sides cast explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dwh_etl_framework_spark.queries.registry import fixtures, query


@query(
    "r22_string_fns",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           lower(p_brand) AS brand_lower,
           substring(p_name, 1, 8) AS name_prefix,
           p_brand || '/' || p_type AS brand_type,
           trim('  ' || p_name || ' ') AS name_trimmed,
           CAST(length(p_name) AS INTEGER) AS name_len,
           string_split(p_name, ' ')[1] AS first_word,
           CAST(regexp_extract(p_brand, '([0-9]+)', 1) AS INTEGER) AS brand_num,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_devoweled,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded
    FROM part
    """,
)
def r22_string_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R22 string functions (identifier lowercasing convention

    airflow_etl.py:505-510; SQL-step surface). All JVM-side, codegen'd."""
    t = fixtures(spark, sf_dir)
    return t.part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias(
            "name_trimmed"
        ),
        F.length("p_name").alias("name_len"),
        F.split("p_name", " ").getItem(0).alias("first_word"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).cast("int").alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("name_devoweled"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
    )


@query(
    "r23_date_fns",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS order_year,
           CAST(month(o_orderdate) AS INTEGER) AS order_month,
           CAST(quarter(o_orderdate) AS INTEGER) AS order_quarter,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(o_orderdate AS DATE) AS order_date,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-09-01')
                AS INTEGER) AS days_to_report,
           CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
    FROM orders
    """,
)
def r23_date_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R23 date/time functions (report_date logic airflow_etl.py:392-394,

    oracle date mapping connector.py:43-44). Session tz pinned UTC so epoch
    matches DuckDB's naive-as-UTC semantics."""
    t = fixtures(spark, sf_dir)
    return t.orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.quarter("o_orderdate").alias("order_quarter"),
        # DuckDB's date_trunc('month') yields DATE; pin both sides to DATE
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.datediff(
            F.lit("1998-09-01").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("days_to_report"),
        F.add_months(F.col("o_orderdate").cast("date"), 3).alias("plus3m"),
        F.last_day(F.col("o_orderdate").cast("date")).alias("month_end"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
    )


@query(
    "r24_math_fns",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(round(CAST(l_extendedprice * l_discount AS DECIMAL(16,4)), 2)
                AS DOUBLE) AS disc_amount,
           abs(l_extendedprice - 1000.0) AS dist_from_1k,
           CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
           CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
           sqrt(l_extendedprice) AS price_sqrt,
           l_linenumber % 3 AS line_mod3,
           greatest(l_discount, l_tax) AS max_rate,
           least(l_discount, l_tax) AS min_rate
    FROM lineitem
    """,
)
def r24_math_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R24 math/decimal functions (DWH amount-column surface). Rounding goes

    through DECIMAL (see module docstring); sqrt/abs are IEEE-exact."""
    t = fixtures(spark, sf_dir)
    return t.lineitem.select(
        "l_orderkey",
        "l_linenumber",
        # decimal rounding for .5-boundary portability, then terminal DOUBLE
        # (DECIMAL must never reach the output schema — driver-hasher rule)
        F.round(
            (F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(16,4)"), 2
        )
        .cast("double")
        .alias("disc_amount"),
        F.abs(F.col("l_extendedprice") - 1000.0).alias("dist_from_1k"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        (F.col("l_linenumber") % 3).alias("line_mod3"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
    )
