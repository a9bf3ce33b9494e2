"""Unit tests: param templating (F10), checkpoint modes (F9), step dispatch

(F11-F14), source spec validation (F1-F5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dwh_etl_framework_spark.plans.config import TransformStep
from dwh_etl_framework_spark.plans.params import fill_sql_parameters, resolve_parameters
from dwh_etl_framework_spark.plans.steps import (
    StepContext,
    run_select_step,
    run_python_step,
    run_transform_steps,
)
from dwh_etl_framework_spark.sources.registry import SourceSpec


# -- F10 templating ---------------------------------------------------------
def test_fill_parameters():
    sql = "SELECT * FROM t WHERE d <= '{report_date}' AND x > {min_x}"
    out = fill_sql_parameters(sql, {"report_date": "2024-01-01", "min_x": 5})
    assert out == "SELECT * FROM t WHERE d <= '2024-01-01' AND x > 5"


def test_fill_parameters_missing_raises():
    with pytest.raises(KeyError, match="report_date"):
        fill_sql_parameters("SELECT '{report_date}'", {})


def test_resolve_parameters_reference_style():
    out = resolve_parameters(
        [{"name": "a", "value": 1}, {"name": "b", "variable": "VAR_B"}],
        variable_resolver={"VAR_B": "x"}.__getitem__,
    )
    assert out == {"a": 1, "b": "x"}


def test_resolve_parameters_variable_without_resolver():
    with pytest.raises(ValueError, match="no variable_resolver"):
        resolve_parameters([{"name": "a", "variable": "V"}])


# -- config validation ------------------------------------------------------
def test_step_validation():
    with pytest.raises(ValueError, match="invalid step type"):
        TransformStep(type="bogus", sql="SELECT 1")
    with pytest.raises(ValueError, match="needs sql"):
        TransformStep(type="select")
    with pytest.raises(ValueError, match="registry key"):
        TransformStep(type="python")


def test_source_spec_validation():
    with pytest.raises(ValueError, match="unsupported source format"):
        SourceSpec(alias="x", format="avro2", path="/p")
    with pytest.raises(ValueError, match="needs a path"):
        SourceSpec(alias="x", format="parquet")
    with pytest.raises(ValueError, match="jdbc source needs url"):
        SourceSpec(alias="x", format="jdbc")
    with pytest.raises(ValueError, match="not both"):
        SourceSpec(alias="x", format="jdbc", url="jdbc:x", query="q", dbtable="t")


# -- steps ------------------------------------------------------------------
@pytest.mark.parametrize("mode", ["persist", "local", "parquet"])
def test_select_step_checkpoint_modes(spark, tmp_path, mode):
    ctx = StepContext(
        spark=spark,
        parameters={"n": 5},
        checkpoint_mode=mode,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    step = TransformStep(
        type="select", sql="SELECT id, id * {n} AS x FROM range(10)",
        cache=True, alias="stepped",
    )
    df = run_select_step(ctx, step)
    assert df.count() == 10
    assert {r.x for r in df.collect()} == {i * 5 for i in range(10)}
    # aliased view is queryable by later steps
    assert spark.sql("SELECT SUM(x) AS s FROM stepped").collect()[0].s == 225


def test_python_step_unregistered_raises(spark):
    ctx = StepContext(spark=spark)
    with pytest.raises(KeyError, match="not registered"):
        run_python_step(ctx, TransformStep(type="python", python="nope"))


def test_sequencer_last_result_wins(spark):
    ctx = StepContext(spark=spark)
    steps = [
        TransformStep(type="select", sql="SELECT 1 AS a", alias="s1"),
        TransformStep(type="select", sql="SELECT a + 1 AS b FROM s1"),
    ]
    result = run_transform_steps(ctx, steps)
    assert result.collect()[0].b == 2


def test_sql_file_step(spark, tmp_path):
    p = tmp_path / "q.sql"
    p.write_text("SELECT {v} AS v")
    ctx = StepContext(spark=spark, parameters={"v": 7}, sql_base_dir=str(tmp_path))
    df = run_select_step(ctx, TransformStep(type="select", sql_file="q.sql"))
    assert df.collect()[0].v == 7
