"""Data-quality checks (DWH guardrails): declarative constraint checks that

return a violation report instead of failing mid-pipeline — the load-gate a
production warehouse runs between transform and merge.

Each check is one aggregation plan; ``quality_report`` unions them into a
single pass-per-check report DataFrame: (check, column, violations, total).
All distributed (no collect): the report itself is a DataFrame the caller
can sink, alert on, or join into lineage tables.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def not_null_check(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """NULL counts per required column (one scan for all columns)."""
    total = F.count(F.lit(1))
    aggs = [
        F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(c) for c in columns
    ]
    wide = df.agg(*aggs, total.alias("__total"))
    return wide.selectExpr(
        "stack({n}, {pairs}) AS (column, violations)".format(
            n=len(columns),
            pairs=", ".join(f"'{c}', {c}" for c in columns),
        ),
        "__total AS total",
    ).select(F.lit("not_null").alias("check"), "column", "violations", "total")


def unique_key_check(df: DataFrame, key: Sequence[str]) -> DataFrame:
    """Rows participating in duplicate-key groups (0 = key is unique)."""
    dups = (
        df.groupBy(*key)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .agg(F.coalesce(F.sum("n"), F.lit(0)).alias("violations"))
    )
    # pin the 1-row total as the broadcast side (bucket_cap.py does the
    # same): the plan shape is then guaranteed BroadcastNestedLoopJoin with
    # the scalar broadcast, not left to AQE to discover.
    total = F.broadcast(df.agg(F.count(F.lit(1)).alias("total")))
    return dups.crossJoin(total).select(
        F.lit("unique_key").alias("check"),
        F.lit(",".join(key)).alias("column"),
        "violations",
        "total",
    )


def referential_check(
    child: DataFrame, parent: DataFrame, fk: str, pk: str
) -> DataFrame:
    """Orphaned foreign keys: child rows whose fk has no parent pk

    (anti-join — same shape as the delta-merge DELETE)."""
    orphans = child.join(
        parent.select(F.col(pk).alias(fk)).distinct(), on=fk, how="left_anti"
    ).agg(F.count(F.lit(1)).alias("violations"))
    total = F.broadcast(child.agg(F.count(F.lit(1)).alias("total")))
    return orphans.crossJoin(total).select(
        F.lit("referential").alias("check"),
        F.lit(f"{fk}->{pk}").alias("column"),
        "violations",
        "total",
    )


def range_check(df: DataFrame, column: str, min_value, max_value) -> DataFrame:
    """Values outside [min_value, max_value] (NULLs not counted here)."""
    viol = df.agg(
        F.sum(
            F.when(
                (F.col(column) < min_value) | (F.col(column) > max_value), 1
            ).otherwise(0)
        ).alias("violations"),
        F.count(F.lit(1)).alias("total"),
    )
    return viol.select(
        F.lit("range").alias("check"),
        F.lit(column).alias("column"),
        "violations",
        "total",
    )


def quality_report(*checks: DataFrame) -> DataFrame:
    """Union the individual check reports into one DataFrame."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out
