"""Round-10 wave entries: r15c Q21-shaped correlated subqueries and the
x105 planner decision table (plan shape + semantics probes; hash parity
runs in test_oracle_parity like every registry entry)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dwh_etl_framework_spark.queries.registry import fixtures
from dwh_etl_framework_spark.queries.wave17 import (
    r15c_sole_blame_supplier,
    x105_join_strategy_decision,
)
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_r15c_decorrelates_both_subqueries(spark):
    """Catalyst must rewrite the EXISTS to a left-semi and the NOT
    EXISTS to a left-anti join — no cartesian, no window, every fact
    leg keyed on l_orderkey."""
    df = r15c_sole_blame_supplier(spark, SF_DIR)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan


def test_r15c_rows_are_sole_returning_suppliers(spark):
    """Row-level semantics against a direct recomputation: every
    reported supplier must, for at least numwait (order,line) pairs, be
    the only 'R' supplier on a multi-supplier finished order."""
    t = fixtures(spark, SF_DIR)
    rows = r15c_sole_blame_supplier(spark, SF_DIR).collect()
    assert rows, "fixture should produce waits"
    # recompute the per-order facts once
    per_order = (
        t.lineitem.groupBy("l_orderkey")
        .agg(
            F.count_distinct("l_suppkey").alias("n_supp"),
            F.count_distinct(
                F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
            ).alias("n_r_supp"),
        )
    )
    blame = (
        t.lineitem.filter(F.col("l_returnflag") == "R")
        .join(
            t.orders.filter(F.col("o_orderstatus") == "F"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("n_r_supp") == 1))
        .groupBy("l_suppkey")
        .count()
        .collect()
    )
    want = {r["l_suppkey"]: r["count"] for r in blame}
    for r in rows:
        assert want.get(r["s_suppkey"]) == r["numwait"], r


def test_r15c_limit_is_deterministic(spark):
    a = [tuple(r) for r in r15c_sole_blame_supplier(spark, SF_DIR).collect()]
    b = [tuple(r) for r in r15c_sole_blame_supplier(spark, SF_DIR).collect()]
    assert a == b and len(a) <= 100


def test_x105_exercises_both_branches(spark):
    rows = {r["join_name"]: r for r in
            x105_join_strategy_decision(spark, SF_DIR).collect()}
    assert rows["lineitem_part"]["strategy"] == "broadcast_right"
    assert rows["lineitem_orders"]["strategy"] == "shuffle"
    assert rows["lineitem_orders"]["shuffle_partitions"] >= 8
    plan = _plan(x105_join_strategy_decision(spark, SF_DIR))
    assert "CartesianProduct" not in plan  # 1-row cross joins broadcast
    assert "Window" not in plan


def test_r16b_decorrelates_scalar_aggregates(spark):
    from dwh_etl_framework_spark.queries.wave17 import (
        r16b_small_quantity_revenue,
    )

    df = r16b_small_quantity_revenue(spark, SF_DIR)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    # row-level semantics against a direct recomputation
    t = fixtures(spark, SF_DIR)
    per_part = t.lineitem.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("l_quantity").alias("s")
    )
    want = {
        (r["p_brand"]): (r["n"], r["cents"])
        for r in t.lineitem.join(
            t.part, F.col("p_partkey") == F.col("l_partkey")
        )
        .join(per_part, "l_partkey")
        .filter(5 * F.col("l_quantity") * F.col("cnt") < F.col("s"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
        )
        .collect()
    }
    got = {
        r["p_brand"]: (r["n_small_lines"], r["revenue_cents"])
        for r in df.collect()
    }
    assert got == want and got
