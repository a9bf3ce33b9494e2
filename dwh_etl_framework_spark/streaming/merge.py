"""R33: the journal→master merge as a continuous stream (foreachBatch).

The reference's delta merge (``airflow_etl.py:179-214``) runs once per
Airflow task; here the same DataFrame plan (operators/merge.merge_delta)
runs inside ``foreachBatch`` so each micro-batch of journal rows upserts
into the master — the streaming generalization the reference declared but
left unimplemented (``airflow_etl.py:771-774``).

The master lives at a parquet path (Delta/Iceberg would make the swap
atomic in production; plain parquet with overwrite keeps this repo
dependency-free). State per batch = one window dedup over the batch + one
anti-join against the current master: the batch side is small, so Catalyst
broadcasts its distinct-PK set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dwh_etl_framework_spark.operators.merge import (
    JournalSpec,
    merge_delta,
    stamp_journal_columns,
)


class StreamMasterState:
    """Parquet-backed master table state for the streaming upsert.

    Existence is determined from DISK, not an in-memory flag: the stream's
    checkpoint is durable across restarts, so the master must be too — a
    fresh StreamMasterState over an existing path resumes from the stored
    master instead of silently rebuilding from one batch.
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def read(self) -> DataFrame | None:
        from pyspark.errors import AnalysisException

        try:
            df = self.spark.read.parquet(self.path)
            df.schema  # force path resolution now
            return df
        except AnalysisException as e:
            # ONLY a missing path means "first run". Any other analysis
            # error (e.g. UNABLE_TO_INFER_SCHEMA from a half-written
            # overwrite) must propagate — treating it as first-run would
            # silently rebuild the master from one batch and destroy it.
            if "PATH_NOT_FOUND" in str(e):
                return None
            raise

    def write(self, df: DataFrame) -> None:
        # materialize BEFORE overwriting the path we may have just read
        # (parquet has no atomic swap; Delta would. localCheckpoint breaks
        # the read-your-own-input cycle.)
        df.localCheckpoint(eager=True).write.mode("overwrite").parquet(self.path)


def stream_merge_to_master(
    journal_stream: DataFrame,
    spec: JournalSpec,
    state: StreamMasterState,
    checkpoint_dir: str,
    transform_dt=None,
):
    """Start a foreachBatch query upserting each micro-batch into master.

    Returns the StreamingQuery; caller awaits/stops it."""

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        # No seqno stride: monotonically_increasing_id's partition bits
        # (≥33) would alias any stride anyway, and cross-batch ordering is
        # irrelevant here — each batch upserts sequentially into master.
        # Within a batch, duplicate-PK rows are ordered by __transform_dt;
        # supply per-row event time in the stream (as the tests do) for a
        # meaningful within-batch winner.
        stamped = stamp_journal_columns(batch_df, transform_dt)
        master = state.read()
        if master is None:
            master = stamped.limit(0).drop(
                "__transform_dt", "__load_dt", "__seqno", "__record_state"
            )
        state.write(merge_delta(master, stamped, spec))

    return (
        journal_stream.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(upsert)
        .trigger(availableNow=True)
        .start()
    )
