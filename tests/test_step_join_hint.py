"""Step-level sketch-driven join planning (NOTES r10 → r11 candidate):
``TransformStep.join_strategy`` derives a JoinDecision from CMS sketches
of the step's input views and re-registers them under the decided
physical shape — broadcast hint or co-partitioned exchange — without
touching the step's SQL."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dwh_etl_framework_spark.plans.config import TransformStep, _parse_step
from dwh_etl_framework_spark.plans.steps import StepContext, run_select_step
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _ctx(spark) -> StepContext:
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    part = spark.read.parquet(f"{SF_DIR}/part.parquet")
    ctx = StepContext(spark=spark)
    for name, df in (("li_hint", lineitem), ("part_hint", part)):
        df.createOrReplaceTempView(name)
        ctx.dataframes[name] = df
    return ctx


JOIN_SQL = (
    "SELECT p.p_brand, COUNT(*) AS n, SUM(l.l_quantity) AS qty "
    "FROM li_hint l JOIN part_hint p ON l.l_partkey = p.p_partkey "
    "GROUP BY p.p_brand"
)


# -- config surface ----------------------------------------------------------
def test_config_parses_join_strategy():
    step = _parse_step(
        {
            "sql": JOIN_SQL,
            "alias": "j",
            "join_strategy": {
                "left": "li_hint",
                "right": "part_hint",
                "left_key": "l_partkey",
                "right_key": "p_partkey",
            },
        }
    )
    assert step.join_strategy["left"] == "li_hint"


def test_config_rejects_bad_join_strategy():
    with pytest.raises(ValueError, match="missing required keys"):
        TransformStep(sql=JOIN_SQL, join_strategy={"left": "a", "right": "b"})
    with pytest.raises(ValueError, match="engine='spark' select"):
        TransformStep(
            sql=JOIN_SQL,
            engine="pushdown",
            connection="c",
            join_strategy={
                "left": "a", "right": "b", "left_key": "k", "right_key": "k",
            },
        )


# -- execution: broadcast branch ---------------------------------------------
def test_broadcast_decision_shapes_the_sql_join(spark):
    ctx = _ctx(spark)
    baseline = spark.sql(JOIN_SQL).collect()
    step = TransformStep(
        sql=JOIN_SQL,
        alias="joined",
        join_strategy={
            "left": "li_hint",
            "right": "part_hint",
            "left_key": "l_partkey",
            "right_key": "p_partkey",
            "broadcast_threshold_rows": 10**9,
        },
    )
    df = run_select_step(ctx, step)
    d = ctx.join_decisions["joined"]
    assert d.strategy == "broadcast_right"  # part is the small side
    assert "BroadcastHashJoin" in _plan(df)
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, baseline))


# -- execution: shuffle branch -----------------------------------------------
def test_shuffle_decision_copartitions_both_views(spark):
    ctx = _ctx(spark)
    baseline = spark.sql(JOIN_SQL).collect()
    step = TransformStep(
        sql=JOIN_SQL,
        alias="joined",
        join_strategy={
            "left": "li_hint",
            "right": "part_hint",
            "left_key": "l_partkey",
            "right_key": "p_partkey",
            "broadcast_threshold_rows": 0,
            "rows_per_task": 100,
            "parallelism": 4,
        },
    )
    df = run_select_step(ctx, step)
    d = ctx.join_decisions["joined"]
    assert d.strategy == "shuffle" and d.shuffle_partitions > 4
    # both input views were re-registered pre-repartitioned on their keys
    # at the decision's exchange width
    for name, key in (("li_hint", "l_partkey"), ("part_hint", "p_partkey")):
        view_plan = _plan(ctx.dataframes[name])
        assert f"hashpartitioning({key}" in view_plan, name
        assert f", {d.shuffle_partitions})" in view_plan, name
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, baseline))


def test_decision_key_defaults_to_pair_when_no_alias(spark):
    ctx = _ctx(spark)
    step = TransformStep(
        sql=JOIN_SQL,
        join_strategy={
            "left": "li_hint",
            "right": "part_hint",
            "left_key": "l_partkey",
            "right_key": "p_partkey",
            "broadcast_threshold_rows": 10**9,
        },
    )
    run_select_step(ctx, step)
    assert "li_hint⋈part_hint" in ctx.join_decisions
