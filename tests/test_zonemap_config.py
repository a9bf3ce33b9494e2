"""Zone-map tier at the pipeline-config surface: `landing: layout:` lands a
fragmented, zone-mapped master; a select step's `pruned_scans` serves its
SQL from the pruned read with step-scoped views and an audit trail."""

from __future__ import annotations

from datetime import datetime

import pytest
import yaml

from dwh_etl_framework_spark.plans.config import parse_pipeline_config
from dwh_etl_framework_spark.plans.pipeline import Pipeline
from dwh_etl_framework_spark.plans.steps import StepContext, run_select_step
from dwh_etl_framework_spark.sources.zonemaps import read_table_pruned


def _land_layout_config(spark, tmp_path, kind="zorder"):
    land = tmp_path / "landed_layout"
    columns = "[o_custkey, cents]" if kind == "zorder" else "[cents]"
    bounds = (
        "{o_custkey: [0, 200], cents: [100000, 50000000]}"
        if kind == "zorder"
        else "{cents: [100000, 50000000]}"
    )
    cfg = parse_pipeline_config(yaml.safe_load(f"""
tables:
  - target: dwh.layout_demo
    primary_key: [o_orderkey]
    dependencies:
      - alias: orders_src
        format: parquet
        path: "/root/testdata/sf0.001/orders.parquet"
    transform:
      full:
        - type: select
          sql: >
            SELECT o_orderkey, o_custkey,
                   CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders_src
    landing:
      path: "{land}"
      layout:
        kind: {kind}
        columns: {columns}
        bounds: {bounds}
        fragments: 16
      zonemap_cols: [o_custkey, cents]
"""))
    pipe = Pipeline(spark=spark, table=cfg.tables[0])
    master = pipe.run(transform_dt=datetime(2024, 1, 1))
    return str(land), master


def test_layout_landing_lands_fragments_and_zonemap(spark, tmp_path):
    """`landing: layout:` fragments the master by the declared layout and
    lands per-fragment min/max — plain reads see exactly the master rows,
    pruned reads serve supersets from metadata."""
    land, master = _land_layout_config(spark, tmp_path)
    back = spark.read.parquet(land)
    assert back.count() == master.count()
    pruned, info = read_table_pruned(
        spark, land, {"o_custkey": (10, 40), "cents": (100_000, 20_000_000)}
    )
    assert 0 < info["fragments_kept"] <= info["fragments_total"]
    got = sorted(
        r["o_orderkey"]
        for r in pruned.where(
            "o_custkey BETWEEN 10 AND 40 AND cents BETWEEN 100000 AND 20000000"
        ).collect()
    )
    want = sorted(
        r["o_orderkey"]
        for r in master.where(
            "o_custkey BETWEEN 10 AND 40 AND cents BETWEEN 100000 AND 20000000"
        ).collect()
    )
    assert got == want


def test_pruned_scans_step_scoped_and_audited(spark, tmp_path):
    """A select step's `pruned_scans`: the SQL reads the pruned view, the
    result equals the full-scan answer, the prune decision lands in the
    audit trail, and the view does not outlive the step."""
    land, master = _land_layout_config(spark, tmp_path)
    cfg = parse_pipeline_config(yaml.safe_load(f"""
tables:
  - target: dwh.layout_consumer
    primary_key: [o_custkey]
    transform:
      full:
        - type: select
          alias: pruned_report
          pruned_scans:
            - table: "{land}"
              as: orders_pruned
              intervals: {{o_custkey: [10, 40], cents: [100000, 20000000]}}
          sql: >
            SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n
            FROM orders_pruned
            WHERE o_custkey BETWEEN 10 AND 40
              AND cents BETWEEN 100000 AND 20000000
            GROUP BY o_custkey
"""))
    step = cfg.tables[0].transform["full"][0]
    ctx = StepContext(spark=spark)
    result = run_select_step(ctx, step)
    want = (
        master.where(
            "o_custkey BETWEEN 10 AND 40 AND cents BETWEEN 100000 AND 20000000"
        )
        .groupBy("o_custkey")
        .count()
    )
    got = {(r["o_custkey"], r["n"]) for r in result.collect()}
    assert got == {(r["o_custkey"], r["count"]) for r in want.collect()}
    info = ctx.join_decisions["prune:orders_pruned"]
    assert 0 < info["fragments_kept"] <= info["fragments_total"]
    # step-scoped: the pruned view must not leak into later steps
    assert not spark.catalog.tableExists("orders_pruned")


def test_pruned_scans_restores_shadowed_view(spark, tmp_path):
    """A pruned view that shadows an existing temp view restores the
    original after the step (the join-shaping discipline)."""
    land, _ = _land_layout_config(spark, tmp_path)
    spark.range(3).createOrReplaceTempView("orders_pruned")
    cfg = parse_pipeline_config(yaml.safe_load(f"""
tables:
  - target: dwh.shadow_demo
    primary_key: [n]
    transform:
      full:
        - type: select
          pruned_scans:
            - table: "{land}"
              as: orders_pruned
              intervals: {{o_custkey: [10, 40]}}
          sql: SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders_pruned
"""))
    ctx = StepContext(spark=spark)
    run_select_step(ctx, cfg.tables[0].transform["full"][0])
    assert spark.table("orders_pruned").count() == 3
    spark.catalog.dropTempView("orders_pruned")


@pytest.mark.parametrize(
    "snippet, match",
    [
        ("layout: {kind: hilbert, columns: [a], bounds: {a: [0, 1]}}",
         "kind"),
        ("layout: {kind: zorder, columns: [a], bounds: {a: [0, 1]}}",
         "exactly 2"),
        ("layout: {kind: range, columns: [a], bounds: {b: [0, 1]}}",
         "bounds"),
        ("layout: {kind: range, columns: [a], bounds: {a: [5, 5]}}",
         "lo < hi"),
        ("layout: {kind: range, columns: [a], bounds: {a: [0, 9]}, fragments: 48}",
         "power of two"),
        ("layout: {kind: range, columns: [a], bounds: {a: [0, 9]}, fragments: 512}",
         "provides only"),
        ("""layout: {kind: range, columns: [a], bounds: {a: [0, 9]}}
      partition_by: [day]""", "mutually exclusive"),
        ("""layout: {kind: range, columns: [a], bounds: {a: [0, 9]}}
      sketch_keys: [a]""", "mutually exclusive"),
        ("""layout: {kind: range, columns: [a], bounds: {a: [0, 9]}}
      mode: append""", "overwrite-only"),
        ("zonemap_cols: [a]", "requires a 'layout'"),
    ],
)
def test_layout_landing_validation(snippet, match):
    with pytest.raises(ValueError, match=match):
        parse_pipeline_config(yaml.safe_load(f"""
tables:
  - target: dwh.bad
    primary_key: [a]
    transform: {{full: [{{type: select, sql: SELECT 1 AS a}}]}}
    landing:
      path: /tmp/x
      {snippet}
"""))


@pytest.mark.parametrize(
    "step, match",
    [
        ({"type": "select", "sql": "SELECT 1",
          "pruned_scans": [{"table": "/x", "as": "v"}]}, "missing keys"),
        ({"type": "select", "sql": "SELECT 1",
          "pruned_scans": [{"table": "/x", "as": "v",
                            "intervals": {"a": [1]}}]}, "lo, hi"),
        ({"type": "select", "sql": "SELECT 1", "engine": "pushdown",
          "connection": "c",
          "pruned_scans": [{"table": "/x", "as": "v",
                            "intervals": {"a": [1, 2]}}]},
         "engine='spark'"),
    ],
)
def test_pruned_scans_validation(step, match):
    with pytest.raises(ValueError, match=match):
        parse_pipeline_config(
            {"tables": [{"target": "dwh.bad", "primary_key": ["a"],
                         "transform": {"full": [step]}}]}
        )
