"""Sinks (F15-F17): partitioned datalake writes and the partition pruning

they unlock downstream — the reference wrote flat dirs and could never
prune (airflow_etl.py:433-439)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dwh_etl_framework_spark.sources.sinks import overwrite_table, write_table

from conftest import SF_DIR


def test_partitioned_write_and_pruning(spark, tmp_path):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").withColumn(
        "order_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_by_year")
    write_table(orders, path, partition_by=["order_year"], mode="overwrite")

    back = spark.read.parquet(path)
    assert back.count() == orders.count()

    pruned = back.filter(F.col("order_year") == 1997)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # partition filter must reach the scan, not a post-scan Filter
    assert "PartitionFilters" in plan and "order_year" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]
    expected = orders.filter(F.col("order_year") == 1997).count()
    assert pruned.count() == expected


def test_overwrite_table_truncate_semantics(spark, tmp_path):
    path = str(tmp_path / "t")
    df1 = spark.range(100).withColumn("v", F.lit("a"))
    df2 = spark.range(10).withColumn("v", F.lit("b"))
    overwrite_table(df1, path)
    overwrite_table(df2, path)  # truncate + reload (R12/F16)
    back = spark.read.parquet(path)
    assert back.count() == 10
    assert {r.v for r in back.select("v").distinct().collect()} == {"b"}


def test_append_mode(spark, tmp_path):
    path = str(tmp_path / "t2")
    write_table(spark.range(5), path, mode="append", target_file_partitions=2)
    write_table(spark.range(5), path, mode="append", target_file_partitions=2)
    assert spark.read.parquet(path).count() == 10
