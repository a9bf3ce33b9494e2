"""Fourth wave: unpivot/melt, null-handling functions, LIKE patterns,

salted skew join — closing remaining §2b corners."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dwh_etl_framework_spark.operators.skew import salted_join
from dwh_etl_framework_spark.queries.registry import fixtures, query


@query(
    "r18d_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS value
    FROM lineitem WHERE l_orderkey < 200
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice
    FROM lineitem WHERE l_orderkey < 200
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', l_discount
    FROM lineitem WHERE l_orderkey < 200
    """,
)
def r18d_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R18-adjacent UNPIVOT/melt: wide measures → (measure, value) rows

    (the inverse of x13_pivot; plans as a single Expand, no joins)."""
    t = fixtures(spark, sf_dir)
    return t.lineitem.filter(F.col("l_orderkey") < 200).unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "value",
    ).withColumn("measure", F.expr("substring(measure, 3)"))


@query(
    "r24d_null_fns",
    oracle="""
    SELECT c_custkey,
           nullif(c_mktsegment, 'BUILDING') AS segment_or_null,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'suppressed') AS segment_filled,
           CASE WHEN nullif(c_mktsegment, 'BUILDING') IS NULL THEN 1 ELSE 0 END
               AS was_nulled,
           ifnull(NULL, c_nationkey) AS nk_filled
    FROM customer
    """,
)
def r24d_null_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R24/R6 null-handling surface: nullif / coalesce / ifnull / IS NULL."""
    t = fixtures(spark, sf_dir)
    nulled = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    return t.customer.select(
        "c_custkey",
        nulled.alias("segment_or_null"),
        F.coalesce(nulled, F.lit("suppressed")).alias("segment_filled"),
        F.when(nulled.isNull(), 1).otherwise(0).alias("was_nulled"),
        F.ifnull(F.lit(None), F.col("c_nationkey")).alias("nk_filled"),
    )


@query(
    "r22c_like_patterns",
    oracle="""
    SELECT p_partkey, p_name,
           p_name LIKE '%widget%' AS is_widget,
           p_name NOT LIKE 'small%' AS not_small,
           p_type ILIKE 'promo' AS is_promo_ci,
           p_name LIKE '_old%' AS second_char_old
    FROM part
    """,
)
def r22c_like_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R22 LIKE / NOT LIKE / ILIKE / single-char wildcard patterns."""
    t = fixtures(spark, sf_dir)
    return t.part.select(
        "p_partkey",
        "p_name",
        F.col("p_name").like("%widget%").alias("is_widget"),
        (~F.col("p_name").like("small%")).alias("not_small"),
        F.col("p_type").ilike("promo").alias("is_promo_ci"),
        F.col("p_name").like("_old%").alias("second_char_old"),
    )


@query(
    "x18_salted_join",
    oracle="""
    SELECT e.event_id, e.user_id, e.value, c.c_name, c.c_mktsegment
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    """,
)
def x18_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant salted join (operators/skew.py): events.user_id is a

    15-value hot-key column joined against customer — exactly the power-law
    shape that melts one reducer at 100 TB. The oracle is the PLAIN join:
    salting changes distribution, never semantics."""
    t = fixtures(spark, sf_dir)
    left = t.events.select(
        "event_id", F.col("user_id").alias("c_custkey"), "user_id", "value"
    )
    right = t.customer.select("c_custkey", "c_name", "c_mktsegment")
    return salted_join(left, right, on=["c_custkey"], num_salts=8).select(
        "event_id", "user_id", "value", "c_name", "c_mktsegment"
    )


@query(
    "r25d_array_set_ops",
    oracle="""
    WITH pairs AS (
        SELECT p1.p_partkey AS k1, p2.p_partkey AS k2,
               string_split(p1.p_name, ' ') AS w1,
               string_split(p2.p_name, ' ') AS w2
        FROM part p1 JOIN part p2 ON p2.p_partkey = p1.p_partkey + 1
        WHERE p1.p_partkey < 100
    )
    SELECT k1, k2,
           -- empty set-op results surface as NULL in this DuckDB build where
           -- Spark's array_join gives '' — coalesce to match
           COALESCE(array_to_string(list_sort(list_intersect(w1, w2)), ','), '')
               AS common_words,
           COALESCE(array_to_string(list_sort(list_distinct(list_concat(w1, w2))),
               ','), '') AS all_words,
           COALESCE(array_to_string(list_sort(list_filter(w1,
               x -> NOT list_contains(w2, x))), ','), '') AS only_in_first
    FROM pairs
    """,
)
def r25d_array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R25 array set operations (intersect/union/except) on token arrays of

    adjacent parts. Results are sorted then joined to strings: Spark and
    DuckDB order set-op outputs differently, so raw arrays would
    hash-mismatch even with equal contents."""
    t = fixtures(spark, sf_dir)
    p1 = t.part.filter(F.col("p_partkey") < 100).select(
        F.col("p_partkey").alias("k1"), F.split("p_name", " ").alias("w1")
    )
    p2 = t.part.select(
        F.col("p_partkey").alias("k2"), F.split("p_name", " ").alias("w2")
    )
    pairs = p1.join(p2, F.col("k2") == F.col("k1") + 1)
    return pairs.select(
        "k1",
        "k2",
        F.array_join(F.array_sort(F.array_intersect("w1", "w2")), ",").alias(
            "common_words"
        ),
        F.array_join(F.array_sort(F.array_union("w1", "w2")), ",").alias(
            "all_words"
        ),
        F.array_join(F.array_sort(F.array_except("w1", "w2")), ",").alias(
            "only_in_first"
        ),
    )
