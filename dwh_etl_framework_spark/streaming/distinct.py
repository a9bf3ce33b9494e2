"""Streaming distinct-count via mergeable HLL registers (foreachBatch).

The batch shape is x84_hll_distinct (``queries/wave10.py``): per-group
HyperLogLog registers from ``operators/sketch.hll_registers``. This module
maintains that register table continuously — each micro-batch's registers
MAX-merge into the persisted state — so a dashboard reads an
always-current approximate distinct count without the stream ever
shuffling raw values or holding per-key state.

Why a sketch and not streaming ``dropDuplicates``+count: exact streaming
distinct state grows with the key domain (every id ever seen), which is
unbounded on a 100 TB feed; the HLL state is a FIXED ≤ m rows per group
forever, and — because merge is MAX — re-delivered micro-batches are
idempotent for free, making at-least-once delivery safe with no dedup
bookkeeping. The same register table also merges ACROSS streams/tables
(e.g. per-datacenter feeds) by another MAX — the classic mergeable-
summaries property (Agarwal et al., "Mergeable Summaries", PODS 2012).

State durability follows ``streaming/merge.StreamMasterState``: the
register table is a parquet path, so a restarted stream resumes from the
stored registers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from dwh_etl_framework_spark.operators.sketch import (
    hll_estimate,
    hll_merge,
    hll_registers,
)
from dwh_etl_framework_spark.streaming.merge import StreamMasterState


def update_registers(
    state_regs: DataFrame | None,
    batch: DataFrame,
    group_cols: list[str],
    value_expr: str,
) -> DataFrame:
    """Fold one batch into the register table. Pure function over
    DataFrames (no I/O) so the batch path and the foreachBatch path share
    one implementation — the twin-testing rule every streaming operator
    in this repo follows."""
    batch_regs = hll_registers(batch, group_cols, value_expr)
    if state_regs is None:
        return batch_regs
    return hll_merge(state_regs, batch_regs)


def stream_distinct_count(
    stream: DataFrame,
    state: StreamMasterState,
    checkpoint_dir: str,
    group_cols: list[str],
    value_expr: str,
):
    """Start a foreachBatch query maintaining the per-group HLL register

    table at ``state``. Readers call :func:`current_estimate` at any time
    for the live approximate distinct counts. Returns the StreamingQuery;
    caller awaits/stops it."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        merged = update_registers(
            state.read(), batch_df, group_cols, value_expr
        )
        # register tables are tiny (≤ m rows/group): coalesce the write
        state.write(merged.coalesce(1))

    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def current_estimate(
    state: StreamMasterState, group_cols: list[str]
) -> DataFrame | None:
    """The live estimate from the persisted registers (None before the
    first batch lands)."""
    regs = state.read()
    if regs is None:
        return None
    return hll_estimate(regs, group_cols)


# ---- streaming mergeable histogram (the x88 counter table) -------------
# Same state discipline as the HLL registers above, but the merge is SUM:
# each micro-batch's (group, bucket, cnt) histogram adds into the persisted
# table. Bounded state (≤ buckets rows per group), idempotence does NOT
# come free here (SUM is not idempotent the way MAX is) — re-delivery
# safety relies on the stream checkpoint, which is exactly why the twin
# test replays WITH the checkpoint intact rather than a fresh one.


def histogram_of(
    df: DataFrame, group_cols: list[str], bucket_expr: str
) -> DataFrame:
    """One partial+final (group, bucket) aggregate — the batch building
    block shared by the batch path (x88) and the stream fold."""
    from pyspark.sql import functions as F

    return df.selectExpr(*group_cols, f"{bucket_expr} AS bucket").groupBy(
        *group_cols, "bucket"
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))


def update_histogram(
    state_hist: DataFrame | None,
    batch: DataFrame,
    group_cols: list[str],
    bucket_expr: str,
) -> DataFrame:
    """Fold one batch into the histogram state (pure function, twin rule)."""
    from pyspark.sql import functions as F

    batch_hist = histogram_of(batch, group_cols, bucket_expr)
    if state_hist is None:
        return batch_hist
    return (
        state_hist.unionByName(batch_hist)
        .groupBy(*group_cols, "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def stream_histogram(
    stream: DataFrame,
    state: StreamMasterState,
    checkpoint_dir: str,
    group_cols: list[str],
    bucket_expr: str,
):
    """Maintain the per-group histogram continuously; quantile reads
    against the state table use the x88 integer rank arithmetic at any
    time without touching raw history."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        merged = update_histogram(
            state.read(), batch_df, group_cols, bucket_expr
        )
        state.write(merged.coalesce(1))

    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
