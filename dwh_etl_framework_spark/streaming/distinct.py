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
from dwh_etl_framework_spark.streaming.guard import check_batch_guard, stamp_guard


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
# come free here (SUM is not idempotent the way MAX is). The stream
# checkpoint covers clean resume only — foreachBatch is at-least-once, so
# a crash AFTER state.write but BEFORE the checkpoint offset commit
# re-executes that batch on restart (ADVICE r6). The standard guard: the
# last applied batch_id is persisted IN the state table (same parquet
# overwrite, so guard and counters can never diverge) and a fold whose
# batch_id ≤ stored is a no-op. The MAX-merged HLL path above needs none
# of this — re-applying a MAX is a fixed point.


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


def fold_histogram_batch(
    state: StreamMasterState,
    batch_df: DataFrame,
    batch_id: int,
    group_cols: list[str],
    bucket_expr: str,
    run_id: str = "",
) -> bool:
    """Apply one micro-batch to the persisted histogram, exactly once.

    Returns True if the batch was folded, False if it was skipped as a
    re-execution (its batch_id was already recorded in the state). The
    guard columns ride in the same state version as the counters, and
    ``StreamMasterState.write`` publishes each version atomically
    (pointer-file commit protocol — a crash mid-write leaves the previous
    version live), so guard and counters stay consistent through any
    crash: either both reflect the batch or neither does.

    ``run_id`` scopes the batch_id (the Delta-style (appId, version)
    transaction pattern): foreachBatch batch_ids restart at 0 whenever
    the stream gets a FRESH checkpoint, so comparing ids across
    checkpoint generations is meaningless — a new run_id accepts the
    incoming batch regardless of the stored id and re-stamps the state.
    ``stream_histogram`` passes its checkpoint dir as the run identity.
    """
    from pyspark.sql import functions as F

    if not batch_df.head(1):
        return False
    skip, hist_state = check_batch_guard(state.read(), batch_id, run_id)
    if skip:
        return False  # at-least-once re-execution — already applied
    merged = update_histogram(hist_state, batch_df, group_cols, bucket_expr)
    state.write(stamp_guard(merged, batch_id, run_id).coalesce(1))
    return True


def current_histogram(state: StreamMasterState) -> DataFrame | None:
    """The live counter table without the batch-id guard column (None
    before the first batch lands)."""
    stored = state.read()
    if stored is None:
        return None
    drop = [c for c in ("__last_batch_id", "__run_id") if c in stored.columns]
    return stored.drop(*drop) if drop else stored


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
        fold_histogram_batch(
            state, batch_df, batch_id, group_cols, bucket_expr,
            run_id=checkpoint_dir,
        )

    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ---- streamed count-min sketch (x86/x103 fold) --------------------------
# CMS counters SUM-merge exactly like the histogram buckets above, so the
# fold is the same guarded pattern; the state is ≤ d·w counter rows
# forever. A sketch maintained this way serves BOTH consumers at read
# time: point frequency estimates (x86) and the join-size inner product
# against any other sketch of the same width (x103) — the streaming
# realization of "sketches merge across days/streams".


def update_cms(
    state_counters: DataFrame | None,
    batch: DataFrame,
    value_expr: str,
    w: int | None = None,
) -> DataFrame:
    """Fold one batch's CMS counters into the state (pure function).

    The state persists its width as a constant ``__cms_w`` column
    (ADVICE r10): two counter tables only merge — and two sketches only
    inner-product (``cms_join_size``) — when they hash into the SAME
    width, so the width must travel with the state rather than live in
    the caller's head. Folding a contribution at a different explicit
    ``w`` than the state was built with raises instead of silently
    producing counters that never align."""
    from pyspark.sql import functions as F

    from dwh_etl_framework_spark.operators.sketch import CMS_W, cms_sketch

    stored_w = None
    if state_counters is not None and "__cms_w" in state_counters.columns:
        stored_w = state_counters.select(
            F.any_value("__cms_w").alias("w")
        ).first()["w"]
        state_counters = state_counters.drop("__cms_w")
    if stored_w is not None and w is not None and int(w) != int(stored_w):
        raise ValueError(
            f"CMS fold state was built at w={int(stored_w)}; refusing to "
            f"fold a w={int(w)} contribution — counters at different "
            "widths do not merge"
        )
    eff = int(w or stored_w or CMS_W)
    contrib = cms_sketch(batch, value_expr, eff)
    if state_counters is None:
        merged = contrib
    else:
        merged = (
            state_counters.unionByName(contrib)
            .groupBy("r", "col")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
        )
    # Only certify a width we actually KNOW covers the whole state: a
    # legacy width-less state merged with a new contribution could have
    # been built at any width, and stamping the contribution's width
    # onto it would falsely certify the merged counters (review r11) —
    # leave such state width-less so the plans/steps guard keeps using
    # its conservative max-col probe.
    if stored_w is not None or state_counters is None:
        return merged.withColumn("__cms_w", F.lit(eff))
    return merged


def fold_cms_batch(
    state: StreamMasterState,
    batch_df: DataFrame,
    batch_id: int,
    value_expr: str,
    w: int | None = None,
    run_id: str = "",
) -> bool:
    """Apply one micro-batch to the persisted sketch, exactly once
    (the fold_histogram_batch guard verbatim — SUM counters need it).
    Returns False on a skipped re-execution."""
    from pyspark.sql import functions as F

    if not batch_df.head(1):
        return False
    skip, counters = check_batch_guard(state.read(), batch_id, run_id)
    if skip:
        return False
    merged = update_cms(counters, batch_df, value_expr, w)
    state.write(stamp_guard(merged, batch_id, run_id).coalesce(1))
    return True


def current_cms(state: StreamMasterState) -> DataFrame | None:
    """The live (r, col, cnt) counter table without guard/width columns."""
    sk = current_histogram(state)
    if sk is None:
        return None
    return sk.drop("__cms_w") if "__cms_w" in sk.columns else sk


def cms_state_width(state: StreamMasterState) -> int | None:
    """The width the persisted sketch was built at (``None`` for state
    written before widths were persisted, or before the first batch)."""
    from pyspark.sql import functions as F

    stored = state.read()
    if stored is None or "__cms_w" not in stored.columns:
        return None
    return int(stored.select(F.any_value("__cms_w").alias("w")).first()["w"])


def stream_cms(
    stream: DataFrame,
    state: StreamMasterState,
    checkpoint_dir: str,
    value_expr: str,
    w: int | None = None,
):
    """Maintain the count-min sketch continuously; point estimates
    (operators/sketch.cms_estimate) and join-size inner products (x103)
    read the state table at any time without touching raw history."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        fold_cms_batch(
            state, batch_df, batch_id, value_expr, w, run_id=checkpoint_dir
        )

    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
