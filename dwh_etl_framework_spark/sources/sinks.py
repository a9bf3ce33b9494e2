"""Sinks F15-F17 of the reference, Spark-first.

Reference parity (SURVEY.md §2a):
- F15 jdbc-sink append — ``connector.py:51-61``.
- F16 truncate-overwrite sink — ``airflow_etl.py:70-108`` (TRUNCATE then
  append). In Spark this is ``mode("overwrite")``; for JDBC we keep the
  reference's truncate-in-place behavior via the ``truncate`` option so the
  target table's DDL survives.
- F17 datalake landing sink — ``airflow_etl.py:441-450`` (Hudi bulk_insert).
  Re-expressed as a parquet/delta write with explicit file-count control:
  at 100 TB the thing that matters is emitting sanely-sized files, so the
  writer repartitions by the partition columns (or to a target partition
  count) before writing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "append",
    partition_by: list[str] | None = None,
    target_file_partitions: int | None = None,
) -> None:
    """Land a DataFrame at a datalake path (F17).

    ``partition_by`` produces a hive-layout table so downstream scans get
    partition pruning (the reference wrote unpartitioned dirs,
    ``airflow_etl.py:433-439`` — its main pruning defect at scale).
    """
    writer = df
    if partition_by:
        # co-locate rows of each output partition to avoid small files
        writer = df.repartition(*partition_by)
    elif target_file_partitions:
        writer = df.repartition(target_file_partitions)
    w = writer.write.format(fmt).mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def overwrite_table(df: DataFrame, path: str, fmt: str = "parquet", **kwargs) -> None:
    """Truncate-and-reload semantics (F16 / R12)."""
    write_table(df, path, fmt=fmt, mode="overwrite", **kwargs)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batchsize: int = 10_000,
    truncate: bool = False,
    options: dict[str, str] | None = None,
) -> None:
    """JDBC sink (F15/F16). ``truncate=True`` + mode overwrite reproduces the

    reference's TRUNCATE-then-append protocol (``airflow_etl.py:95-108``)
    without dropping the target's DDL.
    """
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
    )
    if truncate:
        writer = writer.option("truncate", "true")
    for key, value in (options or {}).items():
        writer = writer.option(key, value)
    writer.mode(mode).save()
