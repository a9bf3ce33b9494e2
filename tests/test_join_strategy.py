"""choose_join_strategy (VERDICT r9 #2): the x103 CMS statistics wired
into an actual broadcast-vs-shuffle decision, pinned against the exact
audit and against the oracled x105 decision table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dwh_etl_framework_spark.operators.sketch import (
    apply_join_strategy,
    choose_join_strategy,
    cms_cardinality,
    cms_join_size,
    cms_sketch,
)
from dwh_etl_framework_spark.queries.registry import fixtures
from dwh_etl_framework_spark.queries.wave16 import JOINSIZE_W
from dwh_etl_framework_spark.queries.wave17 import (
    _JOINS,
    BCAST_RATIO,
    DECISION_PARALLELISM,
    ROWS_PER_TASK,
    x105_join_strategy_decision,
)
from tests.conftest import SF_DIR


def _sketches(spark, join_spec):
    t = fixtures(spark, SF_DIR)
    tables = {"lineitem": t.lineitem, "orders": t.orders, "part": t.part}
    _, lt, lk, rt, rk = join_spec
    lsk = cms_sketch(tables[lt].select(lk), lk, JOINSIZE_W).localCheckpoint()
    rsk = cms_sketch(tables[rt].select(rk), rk, JOINSIZE_W).localCheckpoint()
    return tables[lt], lk, tables[rt], rk, lsk, rsk


def test_operator_decision_matches_oracled_decision_table(spark):
    """The imperative planner entry returns exactly the rows the
    hash-oracled x105 query certifies — one broadcastable join, one
    shuffle join, same fixture."""
    rows = {
        r["join_name"]: r
        for r in x105_join_strategy_decision(spark, SF_DIR).collect()
    }
    assert {r["strategy"] for r in rows.values()} == {
        "broadcast_right",
        "shuffle",
    }, "fixture must exercise both branches"
    for spec in _JOINS:
        name = spec[0]
        _, _, _, _, lsk, rsk = _sketches(spark, spec)
        n_left = rows[name]["n_left"]
        d = choose_join_strategy(
            lsk,
            rsk,
            broadcast_threshold_rows=n_left // BCAST_RATIO,
            rows_per_task=ROWS_PER_TASK,
            parallelism=DECISION_PARALLELISM,
        )
        assert d.strategy == rows[name]["strategy"], name
        assert d.n_left == rows[name]["n_left"]
        assert d.n_right == rows[name]["n_right"]
        assert d.est_join_rows == rows[name]["est_join_rows"]
        assert d.shuffle_partitions == rows[name]["shuffle_partitions"]


def test_estimate_never_undercounts_and_cardinality_exact(spark):
    for spec in _JOINS:
        left, lk, right, rk, lsk, rsk = _sketches(spark, spec)
        exact = left.join(right, F.col(lk) == F.col(rk)).count()
        est = cms_join_size(lsk, rsk).first()["est_join_size"]
        assert est >= exact, spec[0]
        assert cms_cardinality(lsk).first()["n_rows"] == left.count()
        assert cms_cardinality(rsk).first()["n_rows"] == right.count()


def test_apply_broadcast_decision_hints_and_matches_exact(spark):
    spec = next(s for s in _JOINS if s[0] == "lineitem_part")
    left, lk, right, rk, lsk, rsk = _sketches(spark, spec)
    d = choose_join_strategy(
        lsk, rsk, broadcast_threshold_rows=10**9
    )
    assert d.strategy == "broadcast_right"
    joined = apply_join_strategy(left, right, F.col(lk) == F.col(rk), d)
    plan = joined._sc._jvm.PythonSQLUtils.explainString(
        joined._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan
    assert joined.count() == left.join(right, F.col(lk) == F.col(rk)).count()


def test_apply_shuffle_decision_presizes_exchange_and_matches_exact(spark):
    spec = next(s for s in _JOINS if s[0] == "lineitem_orders")
    left, lk, right, rk, lsk, rsk = _sketches(spark, spec)
    d = choose_join_strategy(
        lsk,
        rsk,
        broadcast_threshold_rows=0,
        rows_per_task=100,
        parallelism=DECISION_PARALLELISM,
    )
    assert d.strategy == "shuffle"
    # est/100 rows-per-task forces a width above the parallelism floor
    assert d.shuffle_partitions > DECISION_PARALLELISM
    joined = apply_join_strategy(
        left, right, (F.col(lk) == F.col(rk), [lk], [rk]), d
    )
    assert joined.count() == left.join(right, F.col(lk) == F.col(rk)).count()


def test_decision_table_broadcast_left_reachable(spark):
    """ADVICE r10: the old rule compared the small side against n_left
    alone, so a SMALL left side could never broadcast (least == n_left
    made the condition `n_left*R <= n_left` always false for R>1). The
    symmetric rule broadcasts whichever side is ≤ 1/BCAST_RATIO of the
    LARGER side."""
    from dwh_etl_framework_spark.queries.wave17 import decision_table

    big = spark.range(5000).select(F.col("id").alias("k"))
    small = spark.range(50).select(F.col("id").alias("k"))
    bsk = cms_sketch(big, "k").localCheckpoint()
    ssk = cms_sketch(small, "k").localCheckpoint()
    row = decision_table(ssk, bsk, "small_left").first()
    assert row["strategy"] == "broadcast_left"
    assert row["n_left"] == 50 and row["n_right"] == 5000
    # and the mirror still broadcasts right
    assert decision_table(bsk, ssk, "small_right").first()["strategy"] == (
        "broadcast_right"
    )


def test_broadcast_side_follows_the_smaller_input(spark):
    big = spark.range(5000).select(F.col("id").alias("k"))
    small = spark.range(50).select(F.col("id").alias("k"))
    bsk = cms_sketch(big, "k").localCheckpoint()
    ssk = cms_sketch(small, "k").localCheckpoint()
    assert (
        choose_join_strategy(ssk, bsk, broadcast_threshold_rows=100).strategy
        == "broadcast_left"
    )
    assert (
        choose_join_strategy(bsk, ssk, broadcast_threshold_rows=100).strategy
        == "broadcast_right"
    )
    d = choose_join_strategy(
        bsk, ssk, broadcast_threshold_rows=10, rows_per_task=10**6,
        parallelism=4,
    )
    assert d.strategy == "shuffle" and d.shuffle_partitions == 4


def test_decision_from_streamed_sketch_state_matches_batch(spark, tmp_path):
    """The planner decision served from CONTINUOUSLY maintained sketch
    state (streaming/distinct.py CMS folds) equals the one computed
    from one-shot batch sketches — the metadata-only planning story at
    scale: per-day sketch folds, decisions without touching data."""
    from dwh_etl_framework_spark.queries.wave17 import _JOINS
    from dwh_etl_framework_spark.streaming.distinct import (
        current_cms,
        fold_cms_batch,
    )
    from dwh_etl_framework_spark.streaming.merge import StreamMasterState

    spec = next(s for s in _JOINS if s[0] == "lineitem_orders")
    left, lk, right, rk, lsk, rsk = _sketches(spark, spec)
    # fold each side in 3 ordered slices, as a daily feed would
    states = {}
    for label, df, col in (("l", left, lk), ("r", right, rk)):
        st = StreamMasterState(spark, str(tmp_path / label))
        for i in range(3):
            fold_cms_batch(
                st,
                df.filter(F.col(col) % 3 == i).select(col),
                i,
                col,
                w=JOINSIZE_W,
                run_id="t",
            )
        states[label] = st
    batch_d = choose_join_strategy(
        lsk, rsk, broadcast_threshold_rows=0,
        rows_per_task=ROWS_PER_TASK, parallelism=DECISION_PARALLELISM,
    )
    stream_d = choose_join_strategy(
        current_cms(states["l"]),
        current_cms(states["r"]),
        broadcast_threshold_rows=0,
        rows_per_task=ROWS_PER_TASK,
        parallelism=DECISION_PARALLELISM,
    )
    assert stream_d == batch_d
