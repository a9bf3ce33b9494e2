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
    # the step's OWN plan carries both sides pre-repartitioned on their
    # keys at the decision's exchange width (the views themselves are
    # restored afterwards — see test_shaping_is_scoped_to_the_step)
    plan = _plan(df)
    for key in ("l_partkey", "p_partkey"):
        assert f"hashpartitioning({key}" in plan, key
    assert f", {d.shuffle_partitions})" in plan
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, baseline))


def test_shaping_is_scoped_to_the_step(spark):
    """The shaped views must NOT leak: after the step runs, the original
    (hint-free) views are restored, so a later step joining the same
    view sees no forced broadcast / stray repartition (code-review r10
    finding: a leaked broadcast hint forces broadcasting in joins the
    planner would never pick it for)."""
    ctx = _ctx(spark)
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
    assert "hashpartitioning(l_partkey" in _plan(df)  # step keeps the shape
    # ...but the restored views are shape-free
    for name in ("li_hint", "part_hint"):
        view_plan = _plan(ctx.dataframes[name])
        assert "Exchange" not in view_plan, name
        assert "ResolvedHint" not in view_plan, name
    later = spark.sql("SELECT COUNT(*) AS n FROM li_hint")
    assert "Exchange hashpartitioning(l_partkey" not in _plan(later)


def test_two_steps_same_alias_keep_both_audit_entries(spark):
    ctx = _ctx(spark)
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
    run_select_step(ctx, step)
    run_select_step(ctx, step)
    assert set(ctx.join_decisions) == {"joined", "joined#2"}


def test_sketch_served_from_fold_state_matches_inline(spark, tmp_path):
    """left_state/right_state serve the planner from continuously
    maintained CMS folds — the decision must equal the inline-sketch
    one (the incremental-run path that avoids rescanning the inputs)."""
    from dwh_etl_framework_spark.operators.sketch import CMS_W
    from dwh_etl_framework_spark.streaming.distinct import fold_cms_batch
    from dwh_etl_framework_spark.streaming.merge import StreamMasterState

    ctx = _ctx(spark)
    states = {}
    for label, view, key in (
        ("l", "li_hint", "l_partkey"),
        ("r", "part_hint", "p_partkey"),
    ):
        st = StreamMasterState(spark, str(tmp_path / label))
        fold_cms_batch(
            st, ctx.dataframes[view].select(key), 0, key, w=CMS_W, run_id="t"
        )
        states[label] = st
    base = {
        "left": "li_hint",
        "right": "part_hint",
        "left_key": "l_partkey",
        "right_key": "p_partkey",
        "broadcast_threshold_rows": 10**9,
    }
    inline = TransformStep(sql=JOIN_SQL, alias="a", join_strategy=base)
    stateful = TransformStep(
        sql=JOIN_SQL,
        alias="b",
        join_strategy={
            **base,
            "left_state": str(tmp_path / "l"),
            "right_state": str(tmp_path / "r"),
        },
    )
    run_select_step(ctx, inline)
    run_select_step(ctx, stateful)
    assert ctx.join_decisions["a"] == ctx.join_decisions["b"]


def test_sketch_served_from_landed_table_metadata_matches_inline(spark, tmp_path):
    """left_table/right_table serve the planner from a landed table's
    _sketches/ metadata (the F17 sink tier) — decision equality with
    the inline scan sketch, zero input scans at plan time."""
    from dwh_etl_framework_spark.sources.sinks import write_table_with_sketches

    ctx = _ctx(spark)
    lp, pp = str(tmp_path / "li"), str(tmp_path / "pt")
    write_table_with_sketches(
        ctx.dataframes["li_hint"], lp, ["l_partkey"], mode="overwrite"
    )
    write_table_with_sketches(
        ctx.dataframes["part_hint"], pp, ["p_partkey"], mode="overwrite"
    )
    base = {
        "left": "li_hint",
        "right": "part_hint",
        "left_key": "l_partkey",
        "right_key": "p_partkey",
        "broadcast_threshold_rows": 10**9,
    }
    run_select_step(ctx, TransformStep(sql=JOIN_SQL, alias="inline", join_strategy=base))
    run_select_step(
        ctx,
        TransformStep(
            sql=JOIN_SQL,
            alias="meta",
            join_strategy={**base, "left_table": lp, "right_table": pp},
        ),
    )
    assert ctx.join_decisions["inline"] == ctx.join_decisions["meta"]
    # conflicting 'w' against the landed width raises, not silently ignored
    with pytest.raises(ValueError, match="w=9999"):
        run_select_step(
            ctx,
            TransformStep(
                sql=JOIN_SQL,
                alias="bad",
                join_strategy={**base, "left_table": lp, "w": 9999},
            ),
        )


def test_inline_side_adopts_persisted_width(spark, tmp_path):
    """Review r11: a landed non-default-width table plus a plain inline
    view is a satisfiable config — the inline sketch adopts the
    persisted width instead of hard-failing on a width mismatch."""
    from dwh_etl_framework_spark.sources.sinks import write_table_with_sketches

    ctx = _ctx(spark)
    lp = str(tmp_path / "li64")
    write_table_with_sketches(
        ctx.dataframes["li_hint"], lp, ["l_partkey"], mode="overwrite", w=64
    )
    step = TransformStep(
        sql=JOIN_SQL,
        alias="adopt",
        join_strategy={
            "left": "li_hint",
            "right": "part_hint",
            "left_key": "l_partkey",
            "right_key": "p_partkey",
            "left_table": lp,  # persisted at w=64; right side scans inline
            "broadcast_threshold_rows": 10**9,
        },
    )
    run_select_step(ctx, step)
    d = ctx.join_decisions["adopt"]
    # exact cardinalities are width-independent — both recovered
    assert d.n_left == ctx.dataframes["li_hint"].count()
    assert d.n_right == ctx.dataframes["part_hint"].count()


def test_state_width_mismatch_raises_not_underestimates(spark, tmp_path):
    """ADVICE r10: cms_join_size inner-joins counter tables on (r, col);
    sketches at different widths silently drop cells and UNDER-estimate
    the join size. The fold state now persists its width, and the step
    planner refuses mismatched sides instead of planning from a broken
    estimate."""
    from dwh_etl_framework_spark.streaming.distinct import (
        cms_state_width,
        fold_cms_batch,
    )
    from dwh_etl_framework_spark.streaming.merge import StreamMasterState

    ctx = _ctx(spark)
    st_l = StreamMasterState(spark, str(tmp_path / "l64"))
    fold_cms_batch(
        st_l, ctx.dataframes["li_hint"].select("l_partkey"), 0,
        "l_partkey", w=64, run_id="t",
    )
    assert cms_state_width(st_l) == 64
    step = TransformStep(
        sql=JOIN_SQL,
        alias="mismatch",
        join_strategy={
            "left": "li_hint",
            "right": "part_hint",
            "left_key": "l_partkey",
            "right_key": "p_partkey",
            "left_state": str(tmp_path / "l64"),
            "w": 512,  # inline right side sketches at 512 ≠ state's 64
        },
    )
    with pytest.raises(ValueError, match="width"):
        run_select_step(ctx, step)


def test_state_explicit_w_conflict_raises(spark, tmp_path):
    """The 'w' option used to be silently ignored for state-served
    sides; asking for a different width than the fold was built with
    now raises (within update_cms too)."""
    from dwh_etl_framework_spark.streaming.distinct import fold_cms_batch
    from dwh_etl_framework_spark.streaming.merge import StreamMasterState

    ctx = _ctx(spark)
    st = StreamMasterState(spark, str(tmp_path / "w128"))
    fold_cms_batch(
        st, ctx.dataframes["part_hint"].select("p_partkey"), 0,
        "p_partkey", w=128, run_id="t",
    )
    # folding a conflicting width into the same state also raises
    with pytest.raises(ValueError, match="w=128"):
        fold_cms_batch(
            st, ctx.dataframes["part_hint"].select("p_partkey"), 1,
            "p_partkey", w=64, run_id="t",
        )


def test_views_restored_when_step_sql_raises(spark):
    """ADVICE r10: restore_views ran only on the success path, so a
    failing step leaked its broadcast-hinted/repartitioned views into
    the catalog and ctx.dataframes, silently reshaping later steps for
    callers that catch the error and continue."""
    ctx = _ctx(spark)
    before = ctx.dataframes["part_hint"]
    step = TransformStep(
        sql="SELECT no_such_column FROM part_hint",
        alias="boom",
        join_strategy={
            "left": "li_hint",
            "right": "part_hint",
            "left_key": "l_partkey",
            "right_key": "p_partkey",
            "broadcast_threshold_rows": 10**9,
        },
    )
    with pytest.raises(Exception):
        run_select_step(ctx, step)
    assert ctx.dataframes["part_hint"] is before
    # the catalog view resolves back to the UNSHAPED plan (no hint)
    plan = _plan(
        spark.sql(
            "SELECT * FROM li_hint l JOIN part_hint p "
            "ON l.l_partkey = p.p_partkey"
        )
    )
    assert "ResolvedHint" not in plan


def test_config_empty_join_strategy_is_rejected_not_ignored(spark):
    with pytest.raises(ValueError, match="missing required keys"):
        _parse_step({"sql": JOIN_SQL, "join_strategy": {}})


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
