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


def unique_key_check(
    df: DataFrame, key: Sequence[str], total: DataFrame | None = None
) -> DataFrame:
    """Rows participating in duplicate-key groups (0 = key is unique).

    Pass ``total`` (a 1-row ``(total)`` DataFrame, e.g. from
    :func:`scalar_checks`) to reuse an already-computed row count instead
    of re-scanning ``df`` for it."""
    dups = (
        df.groupBy(*key)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .agg(F.coalesce(F.sum("n"), F.lit(0)).alias("violations"))
    )
    # pin the 1-row total as the broadcast side (bucket_cap.py does the
    # same): the plan shape is then guaranteed BroadcastNestedLoopJoin with
    # the scalar broadcast, not left to AQE to discover.
    if total is None:
        total = df.agg(F.count(F.lit(1)).alias("total"))
    total = F.broadcast(total)
    return dups.crossJoin(total).select(
        F.lit("unique_key").alias("check"),
        F.lit(",".join(key)).alias("column"),
        "violations",
        "total",
    )


def referential_check(
    child: DataFrame,
    parent: DataFrame,
    fk: str,
    pk: str,
    total: DataFrame | None = None,
) -> DataFrame:
    """Orphaned foreign keys: child rows whose fk has no parent pk

    (anti-join — same shape as the delta-merge DELETE). ``total`` as in
    :func:`unique_key_check`."""
    orphans = child.join(
        parent.select(F.col(pk).alias(fk)).distinct(), on=fk, how="left_anti"
    ).agg(F.count(F.lit(1)).alias("violations"))
    if total is None:
        total = child.agg(F.count(F.lit(1)).alias("total"))
    total = F.broadcast(total)
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


def scalar_checks(
    df: DataFrame,
    not_null_cols: Sequence[str],
    range_specs: Sequence[tuple[str, float, float]],
) -> tuple[DataFrame, DataFrame]:
    """All map-only checks (not-null + range) fused into ONE scan.

    Returns ``(report, total)``: the per-check report rows and a 1-row
    ``(total)`` DataFrame for :func:`unique_key_check` /
    :func:`referential_check` to reuse. Separate ``not_null_check`` +
    ``range_check`` calls each scan the table; at 100 TB the scan is the
    dominant cost, so every expression-only check belongs in one
    aggregate pass. The 1-row aggregate is lineage-cut (the x65 rule)
    because both the stacked report and the total extraction consume it."""
    aggs = [
        F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nn_{c}")
        for c in not_null_cols
    ] + [
        F.sum(
            F.when((F.col(c) < lo) | (F.col(c) > hi), 1).otherwise(0)
        ).alias(f"__rg_{c}")
        for c, lo, hi in range_specs
    ]
    wide = df.agg(*aggs, F.count(F.lit(1)).alias("__total")).localCheckpoint(
        eager=False
    )
    nn = wide.selectExpr(
        "stack({n}, {pairs}) AS (column, violations)".format(
            n=len(not_null_cols),
            pairs=", ".join(f"'{c}', __nn_{c}" for c in not_null_cols),
        ),
        "__total AS total",
    ).select(F.lit("not_null").alias("check"), "column", "violations", "total")
    rg = wide.selectExpr(
        "stack({n}, {pairs}) AS (column, violations)".format(
            n=len(range_specs),
            pairs=", ".join(f"'{c}', __rg_{c}" for c, _, _ in range_specs),
        ),
        "__total AS total",
    ).select(F.lit("range").alias("check"), "column", "violations", "total")
    return nn.unionByName(rg), wide.select(F.col("__total").alias("total"))


def quality_report(*checks: DataFrame) -> DataFrame:
    """Union the individual check reports into one DataFrame."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out
