"""Dynamic partition pruning: joining a partitioned fact table against a

filtered dimension must prune fact partitions at runtime — the scan-side
win that makes star joins feasible at 100 TB (SURVEY §4 partition-pruning
row; the reference's flat dirs could never prune)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dwh_etl_framework_spark.sources.sinks import write_table

from conftest import SF_DIR


@pytest.fixture(scope="module")
def partitioned_orders(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("dpp") / "orders_by_year")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").withColumn(
        "order_year", F.year("o_orderdate")
    )
    write_table(orders, path, partition_by=["order_year"], mode="overwrite")
    return path


def test_dynamic_partition_pruning_in_plan(spark, partitioned_orders):
    fact = spark.read.parquet(partitioned_orders)
    # dimension whose filter implies the partition restriction only at runtime
    years = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select(F.year("o_orderdate").alias("order_year"))
        .distinct()
        .filter(F.col("order_year") == 1996)
    )
    joined = fact.join(years, on="order_year")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower() or "PartitionFilters: [" in plan
    expected = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .filter(F.year("o_orderdate") == 1996)
        .count()
    )
    assert joined.count() == expected
