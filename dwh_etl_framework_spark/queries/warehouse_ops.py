"""Warehouse maintenance queries: SCD2 history intervals (f23) and the

data-quality report (x23) — both oracle-checked."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dwh_etl_framework_spark.operators.merge import scd2_intervals
from dwh_etl_framework_spark.operators import quality
from dwh_etl_framework_spark.queries.merge_protocol import _JOURNAL_SQL, _SPEC, _journal
from dwh_etl_framework_spark.queries.registry import fixtures, query


@query(
    "f23_scd2_intervals",
    oracle=f"""
    WITH journal AS ({_JOURNAL_SQL})
    SELECT account_id, balance,
           __transform_dt AS valid_from,
           lead(__transform_dt) OVER (
               PARTITION BY account_id
               ORDER BY __transform_dt ASC, __load_dt ASC, __seqno DESC
           ) AS valid_to,
           lead(__transform_dt) OVER (
               PARTITION BY account_id
               ORDER BY __transform_dt ASC, __load_dt ASC, __seqno DESC
           ) IS NULL AS is_current
    FROM journal
    """,
)
def f23_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history: every journal version becomes a validity interval

    [valid_from, valid_to) with is_current on the open one
    (operators/merge.scd2_intervals) — the history table the reference's
    journal implies but never derives."""
    fixtures(spark, sf_dir)
    return scd2_intervals(_journal(spark), _SPEC).select(
        "account_id", "balance", "valid_from", "valid_to", "is_current"
    )


@query(
    "x23_quality_report",
    oracle="""
    SELECT 'not_null' AS check, 'o_custkey' AS column,
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations,
           COUNT(*) AS total
    FROM orders
    UNION ALL
    SELECT 'not_null', 'o_orderdate',
           CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT), COUNT(*)
    FROM orders
    UNION ALL
    SELECT 'unique_key', 'o_orderkey',
           CAST(COALESCE((SELECT SUM(n) FROM (
               SELECT COUNT(*) AS n FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1
           )), 0) AS BIGINT),
           (SELECT COUNT(*) FROM orders)
    UNION ALL
    SELECT 'referential', 'o_custkey->c_custkey',
           (SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey)),
           (SELECT COUNT(*) FROM orders)
    UNION ALL
    SELECT 'range', 'o_totalprice',
           CAST(SUM(CASE WHEN o_totalprice < 0 OR o_totalprice > 1000000
               THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(*)
    FROM orders
    """,
)
def x23_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality gate (operators/quality.py): not-null, unique-key,

    referential-integrity and range checks over orders, one report row per
    check — the pre-merge guardrail a production DWH runs every load."""
    t = fixtures(spark, sf_dir)
    # fused pass (round-6 audit: the per-check composition scanned orders
    # 6× — map-only checks now share one scan, and the shared total feeds
    # the two structural checks instead of two more count(*) scans)
    scalar, total = quality.scalar_checks(
        t.orders,
        ["o_custkey", "o_orderdate"],
        [("o_totalprice", 0, 1_000_000)],
    )
    return quality.quality_report(
        scalar,
        quality.unique_key_check(t.orders, ["o_orderkey"], total=total),
        quality.referential_check(
            t.orders, t.customer, "o_custkey", "c_custkey", total=total
        ),
    )


@query(
    "f33_pit_join",
    oracle=f"""
    WITH journal AS ({_JOURNAL_SQL}),
    dim AS (
        SELECT account_id, balance,
               __transform_dt AS valid_from,
               lead(__transform_dt) OVER (
                   PARTITION BY account_id
                   ORDER BY __transform_dt ASC, __load_dt ASC, __seqno DESC
               ) AS valid_to
        FROM journal
    )
    SELECT f.l_orderkey AS account_id,
           CAST(f.l_linenumber AS INTEGER) AS line_no,
           CAST(f.l_shipdate AS DATE) + 15 AS receipt_dt,
           d.balance, d.valid_from
    FROM lineitem f
    JOIN dim d
      ON d.account_id = f.l_orderkey
     AND d.valid_from <= CAST(f.l_shipdate AS DATE) + 15
     AND (d.valid_to IS NULL OR CAST(f.l_shipdate AS DATE) + 15 < d.valid_to)
    """,
)
def f33_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimensional join (operators/merge.pit_join): every

    receipt event (receipt = ship + 15 days, the TPC-H receipt rule —
    the synthetic lineitem carries no receiptdate column) paired with
    the account version (SCD2 interval from the journal, f23) valid AT
    the receipt date — the correct-as-of
    join every fact-to-SCD2 load needs; joining is_current instead is
    the classic silent-corruption bug. The half-open intervals
    guarantee at most one version per (key, ts). Catalyst plans the key
    equality as the join key with interval containment as a residual
    filter — one PK shuffle, no range cross-product."""
    t = fixtures(spark, sf_dir)
    from dwh_etl_framework_spark.operators.merge import pit_join

    dim = scd2_intervals(_journal(spark), _SPEC).select(
        "account_id", "balance", "valid_from", "valid_to"
    )
    facts = t.lineitem.select(
        "l_orderkey",
        F.col("l_linenumber").cast("int").alias("line_no"),
        F.date_add(F.to_date("l_shipdate"), 15).alias("receipt_dt"),
    )
    return pit_join(facts, dim, "l_orderkey", "account_id", "receipt_dt").select(
        F.col("l_orderkey").alias("account_id"),
        "line_no",
        "receipt_dt",
        "balance",
        "valid_from",
    )
