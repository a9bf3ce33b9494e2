"""Structured Streaming surface R30-R33 (SURVEY.md §2b).

The reference *declares* incremental "delta" modes but never implements
them (``airflow_etl.py:452-463``, ``:771-774``); this module is those modes
done right on Structured Streaming. Every builder takes a DataFrame that
may be batch OR streaming — stream/batch unification is the test strategy
(SURVEY.md §5.5): the same plan must produce identical results replayed
from a file stream and run over the batch fixture.

Scale notes: windowed aggs keep state per (window, keys); the watermark
bounds that state (late rows beyond it are dropped and their state
evicted). At 100 TB/day the knobs that matter are watermark delay (state
size) and shuffle partitions (state store parallelism) — both surfaced as
arguments here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: events fixture schema with ts already converted to µs TimestampType
#: (file streams require an explicit schema — no inference at stream start).
EVENTS_STREAM_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def events_file_stream(
    spark: SparkSession, dir_path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """R30 streaming source: replay an events directory as a file stream

    (parquet micro-batches). Used by tests to replay the fixture."""
    return (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(dir_path)
    )


def tumbling_window_agg(
    events: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """R30+R32: watermarked tumbling-window count/sum. Works on batch input

    too (watermark is a no-op there) — the batch twin is the r30 oracle
    query."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, duration), *group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("decimal(18,2)")
            .alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *group_cols,
            "n_events",
            "sum_value",
        )
    )


def sliding_window_agg(
    events: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """R31 sliding windows (each event lands in duration/slide windows)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, duration, slide))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("decimal(18,2)")
            .alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n_events",
            "sum_value",
        )
    )


def session_window_agg(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    key_col: str = "user_id",
) -> DataFrame:
    """R31 session windows: dynamic-length sessions closed after ``gap`` of

    inactivity per key; state is merged as sessions coalesce."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap), key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("decimal(18,2)")
            .alias("sum_value"),
        )
        .select(
            key_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def stream_dedup(
    events: DataFrame,
    ts_col: str = "ts",
    watermark: str = "1 hour",
    keys: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """R33 streaming dedup: exactly-once per key within the watermark

    horizon — state for a key is dropped once the watermark passes it, so
    memory is bounded (``dropDuplicatesWithinWatermark``)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )
