"""CDC ingestion: ordered apply of I/U/D change events into a master table.

The reference declares a delta/incremental mode but stubs it
(``airflow_etl.py:452-463``); this is that mode done properly for
change-data-capture feeds (Debezium-shaped: an op column + ordering
columns per change):

1. **within-batch dedupe** — multiple changes for one key inside a
   micro-batch collapse to the LATEST by the ordering columns (one window
   pass over the batch, not the master);
2. **ordered apply** — the net change upserts ('I'/'U') or deletes ('D')
   against the master: one anti-join on the batch's distinct keys (small →
   broadcast) + one union of surviving upserts.

Per batch the master is touched exactly once, and only with O(batch)
joined rows — the shape that stays O(new data) at a 100 TB master when
the master is a real table format (Delta MERGE would replace the
parquet-overwrite in ``StreamMasterState``; the plan is the same).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dwh_etl_framework_spark.streaming.merge import StreamMasterState

#: op-column values, Debezium-shaped
OP_INSERT, OP_UPDATE, OP_DELETE = "I", "U", "D"
_VALID_OPS = (OP_INSERT, OP_UPDATE, OP_DELETE)


def latest_change_per_key(
    changes: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
) -> DataFrame:
    """The NET change per key: latest row by ``order_cols`` (descending,

    ties broken by every remaining column for determinism is the caller's
    job — pass a total order, e.g. (ts, seqno))."""
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    return (
        changes.withColumn("__cdc_rn", F.row_number().over(w))
        .filter(F.col("__cdc_rn") == 1)
        .drop("__cdc_rn")
    )


def apply_cdc_batch(
    master: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    op_col: str = "op",
) -> DataFrame:
    """Apply one batch of changes: collapse to net-per-key, then

    delete/upsert against master in ONE pass. Master rows whose key has
    any net change are dropped (anti-join on the batch's distinct keys —
    broadcastable); net 'I'/'U' rows are appended. A net 'D' therefore
    deletes; older master rows for changed keys never survive.
    """
    net = latest_change_per_key(changes, key_cols, order_cols)
    bad = net.filter(~F.col(op_col).isin(*_VALID_OPS)).limit(1).collect()
    if bad:
        raise ValueError(
            f"unknown CDC op {bad[0][op_col]!r}; expected one of {_VALID_OPS}"
        )
    changed_keys = net.select(*key_cols).distinct()
    survivors = master.join(
        F.broadcast(changed_keys), on=list(key_cols), how="left_anti"
    )
    upserts = net.filter(F.col(op_col) != OP_DELETE).select(*master.columns)
    return survivors.unionByName(upserts)


def stream_cdc_to_master(
    change_stream: DataFrame,
    state: StreamMasterState,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    checkpoint_dir: str,
    op_col: str = "op",
):
    """Continuous CDC apply: each micro-batch of change events is collapsed

    and applied to the durable master (disk-backed ``StreamMasterState`` —
    resumes correctly after restart, like the journal stream merge).
    Returns the StreamingQuery; caller awaits/stops it."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        master = state.read()
        if master is None:
            master = batch_df.drop(op_col).limit(0)
        state.write(
            apply_cdc_batch(master, batch_df, key_cols, order_cols, op_col)
        )

    return (
        change_stream.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .start()
    )
