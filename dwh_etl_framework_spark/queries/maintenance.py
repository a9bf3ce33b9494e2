"""Warehouse maintenance operators (round 6): incremental aggregate

maintenance and snapshot reconciliation — the two jobs a warehouse runs
BETWEEN loads that the reference recomputes from scratch or never had.

- **f24_incremental_agg** — maintain a per-source document aggregate
  from an increment WITHOUT rescanning the base: the corpus splits into
  an 80% "already aggregated" base and a 20% increment (the x50/x30
  md5-threshold rule), the base's partial aggregate combines with the
  increment's, and the oracle proves the result is IDENTICAL to a full
  recompute over everything. The algebraic-MV maintenance contract.
- **f25_snapshot_diff** — reconcile two table snapshots by primary key:
  added / deleted / modified / unchanged row counts plus a value-drift
  total for the modified set. The audit a CDC pipeline (streaming/cdc)
  runs after apply to prove the sink matches the source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dwh_etl_framework_spark.operators.aggmaint import (
    combine_partial_aggregates,
    partial_aggregate,
)
from dwh_etl_framework_spark.queries.registry import fixtures, query

#: f24/f25 split thresholds (md5-hex prefixes, the x30/x50 convention:
#: assignment is a pure function of the key — stable under growth).
F24_BASE_LT = "cc"          # ~80% of docs form the pre-aggregated base
F25_V1_LT = "dd"            # snapshot v1 = keys below
F25_V2_GE = "22"            # snapshot v2 = keys at/above
F25_MOD_LT = "44"           # common keys below this are "modified" in v2

_MEASURES = {
    "n_docs": ("count", "doc_id"),
    "sum_chars": ("sum", "n_chars"),
    "min_chars": ("min", "n_chars"),
    "max_chars": ("max", "n_chars"),
}


@query(
    "f24_incremental_agg",
    oracle="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars,
           CAST(SUM(n_chars) // COUNT(*) AS BIGINT) AS avg_chars
    FROM documents GROUP BY source
    """,
)
def f24_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-series: incremental materialized-aggregate maintenance. The

    per-source stats table is maintained by combining the base's PARTIAL
    aggregate with the increment's (operators/aggmaint.py) — base facts
    never rescanned — and the oracle is the full recompute over the whole
    table, so the hash check IS the maintenance-correctness proof:
    combine(partial(base), partial(delta)) ≡ aggregate(base ∪ delta).
    The derived ratio (avg_chars) is computed at read time from
    (sum, count) in exact integer division, per the partial-form rule.

    Scale shape: two map-side-combined partial aggregates (the increment
    one delta-sized) + one |sources|-sized recombination. At 100 TB the
    base partial table is a few thousand rows regardless of fact volume;
    maintenance cost is delta-proportional."""
    t = fixtures(spark, sf_dir)
    h2 = F.substring(
        F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 2
    )
    docs = t.documents.withColumn("__h", h2)
    base = docs.filter(F.col("__h") < F24_BASE_LT)
    delta = docs.filter(F.col("__h") >= F24_BASE_LT)
    base_agg = partial_aggregate(base, ["source"], _MEASURES)
    delta_agg = partial_aggregate(delta, ["source"], _MEASURES)
    merged = combine_partial_aggregates(
        base_agg, delta_agg, ["source"], _MEASURES
    )
    return merged.select(
        "source",
        "n_docs",
        F.col("sum_chars").cast("bigint").alias("sum_chars"),
        "min_chars",
        "max_chars",
        F.expr("CAST(sum_chars div n_docs AS BIGINT)").alias("avg_chars"),
    )


@query(
    "f25_snapshot_diff",
    oracle=f"""
    WITH keyed AS (
        SELECT o_orderkey, o_totalprice,
               substring(md5('snap:' || CAST(o_orderkey AS VARCHAR)), 1, 2)
                   AS h
        FROM orders
    ),
    v1 AS (
        SELECT o_orderkey, o_totalprice FROM keyed WHERE h < '{F25_V1_LT}'
    ),
    v2 AS (
        SELECT o_orderkey,
               CASE WHEN h < '{F25_MOD_LT}' THEN o_totalprice + 1.0
                    ELSE o_totalprice END AS o_totalprice
        FROM keyed WHERE h >= '{F25_V2_GE}'
    ),
    joined AS (
        SELECT COALESCE(v1.o_orderkey, v2.o_orderkey) AS pk,
               v1.o_totalprice AS p1, v2.o_totalprice AS p2,
               CASE
                   WHEN v1.o_orderkey IS NULL THEN 'added'
                   WHEN v2.o_orderkey IS NULL THEN 'deleted'
                   WHEN v1.o_totalprice <> v2.o_totalprice THEN 'modified'
                   ELSE 'unchanged'
               END AS change_type
        FROM v1 FULL OUTER JOIN v2 ON v2.o_orderkey = v1.o_orderkey
    )
    SELECT change_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN change_type = 'modified'
                         THEN CAST(round((p2 - p1) * 100) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS drift_cents
    FROM joined GROUP BY change_type
    """,
)
def f25_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-series: snapshot reconciliation by primary key — the post-apply

    audit for CDC (streaming/cdc.py): two deterministic snapshots of
    orders (v1 = keys with md5 prefix < dd; v2 = keys ≥ 22, with prices
    +1.00 for the low-prefix band, so added/deleted/modified/unchanged
    classes are all non-empty at every SF) full-outer-join on the key and
    classify. ``drift_cents`` totals the modified-value delta in exact
    cents (the per-row double subtraction rounds to an integer cent
    count; no double reduction ships).

    Scale shape: one full-outer join shuffling both snapshots on the PK
    — the unavoidable reconciliation shuffle — with AQE skew-splitting
    applicable; classification and the 4-row aggregate are map-side. At
    scale, run per partition-date so only changed partitions join."""
    t = fixtures(spark, sf_dir)
    h2 = F.substring(
        F.md5(F.concat(F.lit("snap:"), F.col("o_orderkey").cast("string"))),
        1,
        2,
    )
    keyed = t.orders.select("o_orderkey", "o_totalprice", h2.alias("__h"))
    v1 = keyed.filter(F.col("__h") < F25_V1_LT).select(
        F.col("o_orderkey").alias("pk1"), F.col("o_totalprice").alias("p1")
    )
    v2 = keyed.filter(F.col("__h") >= F25_V2_GE).select(
        F.col("o_orderkey").alias("pk2"),
        F.when(
            F.col("__h") < F25_MOD_LT, F.col("o_totalprice") + F.lit(1.0)
        )
        .otherwise(F.col("o_totalprice"))
        .alias("p2"),
    )
    joined = v1.join(v2, F.col("pk1") == F.col("pk2"), "full_outer").select(
        F.when(F.col("pk1").isNull(), "added")
        .when(F.col("pk2").isNull(), "deleted")
        .when(F.col("p1") != F.col("p2"), "modified")
        .otherwise("unchanged")
        .alias("change_type"),
        "p1",
        "p2",
    )
    drift = F.when(
        F.col("change_type") == "modified",
        F.round((F.col("p2") - F.col("p1")) * 100).cast("bigint"),
    ).otherwise(F.lit(0))
    return joined.groupBy("change_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(drift).cast("bigint").alias("drift_cents"),
    )
