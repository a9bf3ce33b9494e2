"""F8 pushdown step engine (vs embedded Derby) and the multi-table pipeline

loop (later tables consume earlier masters)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from dwh_etl_framework_spark.plans.config import TransformStep, parse_pipeline_config
from dwh_etl_framework_spark.plans.pipeline import run_pipeline_config
from dwh_etl_framework_spark.plans.steps import StepContext, run_select_step
from dwh_etl_framework_spark.sources.sinks import write_jdbc

URL = "jdbc:derby:memory:pushdowndb;create=true"
OPTS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


# -- F8: pushdown select step ------------------------------------------------
@pytest.fixture(scope="module")
def derby_balances(spark):
    df = spark.range(50).select(
        F.col("id").alias("acct"), (F.col("id") * 100).cast("double").alias("bal")
    )
    write_jdbc(df, URL, "balances", mode="overwrite", options=OPTS)
    return df


def test_pushdown_select_step(spark, derby_balances):
    """The reference's engine='greenplum' step (airflow_etl.py:252-260):

    SQL executes in the external engine; Spark only fetches the result."""
    ctx = StepContext(
        spark=spark,
        parameters={"min_bal": 2000},
        connections={"dwh": {"url": URL, "options": OPTS}},
    )
    step = TransformStep(
        type="select",
        engine="pushdown",
        connection="dwh",
        sql='SELECT "acct", "bal" FROM balances WHERE "bal" >= {min_bal}',
        alias="rich",
    )
    df = run_select_step(ctx, step)
    assert df.count() == 30  # bal 2000..4900
    # aliased view visible to later spark-engine steps (cross-engine chain)
    n = spark.sql("SELECT COUNT(*) AS n FROM rich WHERE bal >= 4000").collect()[0].n
    assert n == 10


def test_pushdown_unknown_connection_raises(spark):
    ctx = StepContext(spark=spark, connections={})
    step = TransformStep(
        type="select", engine="pushdown", connection="nope", sql="SELECT 1"
    )
    with pytest.raises(KeyError, match="unknown connection"):
        run_select_step(ctx, step)


def test_pushdown_config_validation():
    with pytest.raises(ValueError, match="invalid step engine"):
        TransformStep(type="select", sql="SELECT 1", engine="greenplum")
    with pytest.raises(ValueError, match="connection"):
        TransformStep(type="select", sql="SELECT 1", engine="pushdown")


# -- multi-table pipeline loop ------------------------------------------------
MULTI_CONFIG = {
    "tables": [
        {
            "target": "stg.order_totals",
            "primary_key": ["o_custkey"],
            "dependencies": [
                {"alias": "orders_src", "format": "parquet",
                 "path": "/root/testdata/sf0.001/orders.parquet"},
            ],
            "transform": {
                "full": [
                    {"type": "select", "sql": (
                        "SELECT o_custkey, COUNT(*) AS n_orders "
                        "FROM orders_src GROUP BY o_custkey")},
                ]
            },
        },
        {
            # depends on the FIRST table's merged master via its view name
            "target": "dm.big_customers",
            "primary_key": ["o_custkey"],
            "dependencies": [],
            "transform": {
                "full": [
                    {"type": "select", "sql": (
                        "SELECT o_custkey, n_orders FROM stg_order_totals "
                        "WHERE n_orders >= 10")},
                ]
            },
        },
    ]
}


def test_multi_table_pipeline_layering(spark):
    config = parse_pipeline_config(MULTI_CONFIG)
    pipes = run_pipeline_config(
        spark, config, merge_mode="full", transform_dt=datetime(2024, 1, 1)
    )
    assert set(pipes) == {"stg.order_totals", "dm.big_customers"}
    stg = pipes["stg.order_totals"].master
    dm = pipes["dm.big_customers"].master
    expected_big = stg.filter(F.col("n_orders") >= 10).count()
    assert dm.count() == expected_big > 0
    # the downstream table really read the upstream MASTER (post-merge)
    upstream = {r.o_custkey for r in stg.collect()}
    assert {r.o_custkey for r in dm.collect()} <= upstream
