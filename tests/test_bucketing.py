"""Bucketed-table co-located joins: writing both join sides bucketed on the

join key lets the sort-merge join run with NO shuffle exchange — the
pre-partitioning strategy for repeated big-big joins at 100 TB
(SURVEY.md §2b R14 scale note; the reference had no layout control at all).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    return spark  # session warehouse dir is set at session build; use default


def test_bucketed_join_has_no_shuffle(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")

    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
     .mode("overwrite").saveAsTable("orders_b"))
    (lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
     .mode("overwrite").saveAsTable("lineitem_b"))

    ob, lb = spark.table("orders_b"), spark.table("lineitem_b")
    joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey).select(
        "l_orderkey", "l_extendedprice", "o_totalprice"
    )
    # disable broadcast so the join strategy is the bucketing-sensitive one
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, (
            "bucketed join must not shuffle either side"
        )
        # correctness unchanged
        expected = lineitem.join(
            orders, lineitem.l_orderkey == orders.o_orderkey
        ).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_unbucketed_join_does_shuffle(spark):
    """Control: the same join over plain parquet has shuffle exchanges."""
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
