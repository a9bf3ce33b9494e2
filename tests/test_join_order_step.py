"""The ``join_order`` step surface: x109's metadata-served System-R
decision executed as the step's real join tree (f39), its view scoping,
and the config validation."""

from __future__ import annotations

import pytest

from dwh_etl_framework_spark.plans.config import TransformStep
from dwh_etl_framework_spark.plans.steps import (
    StepContext,
    plan_step_join_order,
    run_select_step,
)
from dwh_etl_framework_spark.queries.registry import fixtures
from dwh_etl_framework_spark.sources.sinks import (
    choose_join_order_from_metadata,
    write_table_with_sketches,
)

from conftest import SF_DIR


@pytest.fixture(scope="module")
def landed(spark, tmp_path_factory):
    """customer/orders/lineitem landed once with sketch metadata."""
    base = tmp_path_factory.mktemp("f39_landed")
    t = fixtures(spark, SF_DIR)
    paths = {}
    for name, df, keys in [
        ("customer", t.customer, ["c_custkey"]),
        ("orders", t.orders, ["o_custkey", "o_orderkey"]),
        ("lineitem", t.lineitem, ["l_orderkey"]),
    ]:
        paths[name] = str(base / name)
        write_table_with_sketches(df, paths[name], keys, mode="overwrite")
    return paths


def _spec(paths, as_name="chain_t"):
    return {
        "left": "customer", "mid": "orders", "right": "lineitem",
        "left_table": paths["customer"],
        "mid_table": paths["orders"],
        "right_table": paths["lineitem"],
        "left_key": "c_custkey",
        "mid_left_key": "o_custkey",
        "mid_right_key": "o_orderkey",
        "right_key": "l_orderkey",
        "as": as_name,
    }


def _scan_positions(plan: str) -> dict[str, int]:
    """LAST occurrence of each fixture scan in the physical-plan tree
    text; a left-deep tree prints the nested join's subtree (both its
    scans) before the outer join's probe-side scan."""
    return {
        name: plan.rfind(f"{name}.parquet")
        for name in ("customer", "orders", "lineitem")
    }


def test_decision_served_from_metadata_and_executed_order(spark, landed):
    """The step's decision equals the direct metadata call, and the
    EXECUTED join tree follows it: lm_first ⇒ (customer ⋈ orders) joins
    first, lineitem's scan sits above the nested join (so its plan-text
    position is past both chain scans)."""
    ctx = StepContext(spark=spark)
    fixtures(spark, SF_DIR)
    order, restore = plan_step_join_order(ctx, _spec(landed))
    try:
        direct = choose_join_order_from_metadata(
            spark,
            (landed["customer"], "c_custkey"),
            (landed["orders"], "o_custkey", "o_orderkey"),
            (landed["lineitem"], "l_orderkey"),
        )
        assert order == direct
        # on this schema customer⋈orders (≈|orders|) must beat
        # orders⋈lineitem (≈|lineitem|)
        assert order["chosen"] == "lm_first"
        chain = ctx.dataframes["chain_t"]
        plan = chain._jdf.queryExecution().executedPlan().toString()
        pos = _scan_positions(plan)
        assert min(pos.values()) >= 0, plan
        assert pos["lineitem"] > pos["customer"], plan
        assert pos["lineitem"] > pos["orders"], plan
    finally:
        restore()


def test_flipped_chain_executes_mr_first(spark, landed):
    """Present the same chain REVERSED (lineitem as 'left'): the DP must
    flip to mr_first — joining the true small pair (orders ⋈ customer)
    first — and the executed tree must put lineitem's scan above the
    nested join on that side too. Pins that the order comes from the
    statistics, not from the spec's authoring order."""
    ctx = StepContext(spark=spark)
    fixtures(spark, SF_DIR)
    spec = {
        "left": "lineitem", "mid": "orders", "right": "customer",
        "left_table": landed["lineitem"],
        "mid_table": landed["orders"],
        "right_table": landed["customer"],
        "left_key": "l_orderkey",
        "mid_left_key": "o_orderkey",
        "mid_right_key": "o_custkey",
        "right_key": "c_custkey",
        "as": "chain_rev",
    }
    order, restore = plan_step_join_order(ctx, spec)
    try:
        assert order["chosen"] == "mr_first"
        chain = ctx.dataframes["chain_rev"]
        plan = chain._jdf.queryExecution().executedPlan().toString()
        pos = _scan_positions(plan)
        assert pos["lineitem"] > pos["customer"], plan
        assert pos["lineitem"] > pos["orders"], plan
    finally:
        restore()


def test_both_orders_same_rows(spark, landed):
    """Inner-join chains are order-independent: the planner's chain must
    produce exactly the canonical-order rows (count + a checksum agg)."""
    fixtures(spark, SF_DIR)
    ctx = StepContext(spark=spark)
    _, restore = plan_step_join_order(ctx, _spec(landed, "chain_eq"))
    try:
        got = (
            ctx.dataframes["chain_eq"]
            .selectExpr(
                "CAST(COUNT(*) AS BIGINT) AS n",
                "CAST(SUM(CAST(c_custkey AS BIGINT) + l_linenumber) AS BIGINT)"
                " AS checksum",
            )
            .first()
        )
        want = spark.sql(
            "SELECT CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(CAST(c_custkey AS BIGINT) + l_linenumber) AS BIGINT)"
            " AS checksum "
            "FROM customer JOIN orders ON c_custkey = o_custkey "
            "JOIN lineitem ON o_orderkey = l_orderkey"
        ).first()
        assert tuple(got) == tuple(want)
    finally:
        restore()


def test_step_scoping_restores_views(spark, landed):
    """The chain view exists only for the step: run_select_step drops a
    fresh view after analysis and restores a pre-existing binding."""
    fixtures(spark, SF_DIR)
    ctx = StepContext(spark=spark)
    step = TransformStep(
        type="select",
        sql="SELECT CAST(COUNT(*) AS BIGINT) AS n FROM scoped_chain",
        join_order=_spec(landed, "scoped_chain"),
    )
    df = run_select_step(ctx, step)
    assert df.first()["n"] > 0
    # fresh view: dropped after the step
    assert "scoped_chain" not in ctx.dataframes
    assert not spark.catalog.tableExists("scoped_chain")
    # decision recorded in the audit trail
    assert "order:scoped_chain" in ctx.join_decisions
    assert ctx.join_decisions["order:scoped_chain"]["chosen"] == "lm_first"
    # pre-existing binding: restored, not dropped
    sentinel = spark.range(3).toDF("sentinel_id")
    sentinel.createOrReplaceTempView("scoped_chain")
    ctx2 = StepContext(spark=spark, dataframes={"scoped_chain": sentinel})
    run_select_step(ctx2, step)
    assert ctx2.dataframes["scoped_chain"] is sentinel
    assert spark.table("scoped_chain").columns == ["sentinel_id"]
    spark.catalog.dropTempView("scoped_chain")


def test_chain_form_executes_dp_order(spark, landed, tmp_path):
    """The ``chain`` spec form (k=4): the DP must put the dimension pair
    (nation ⋈ customer) first and the executed tree must scan lineitem
    LAST — and the chain's rows must equal the canonical 4-way join."""
    from dwh_etl_framework_spark.queries.registry import fixtures as fx

    t = fx(spark, SF_DIR)
    npath = str(tmp_path / "nation")
    cpath = str(tmp_path / "customer2")
    write_table_with_sketches(
        t.nation, npath, ["n_nationkey"], mode="overwrite"
    )
    write_table_with_sketches(
        t.customer, cpath, ["c_nationkey", "c_custkey"], mode="overwrite"
    )
    ctx = StepContext(spark=spark)
    spec = {
        "chain": [
            {"view": "nation", "table": npath, "right_key": "n_nationkey"},
            {"view": "customer", "table": cpath,
             "left_key": "c_nationkey", "right_key": "c_custkey"},
            {"view": "orders", "table": landed["orders"],
             "left_key": "o_custkey", "right_key": "o_orderkey"},
            {"view": "lineitem", "table": landed["lineitem"],
             "left_key": "l_orderkey"},
        ],
        "as": "chain4",
    }
    order, restore = plan_step_join_order(ctx, spec)
    try:
        assert order["order"] == [0, 1, 2, 3]  # dimension-first build
        chain = ctx.dataframes["chain4"]
        plan = chain._jdf.queryExecution().executedPlan().toString()
        pos = {
            name: plan.rfind(f"{name}.parquet")
            for name in ("nation", "customer", "orders", "lineitem")
        }
        assert min(pos.values()) >= 0, plan
        assert pos["lineitem"] == max(pos.values()), plan  # joined last
        assert pos["orders"] > pos["nation"], plan
        assert pos["orders"] > pos["customer"], plan
        got = chain.selectExpr(
            "CAST(COUNT(*) AS BIGINT) AS n",
            "CAST(SUM(CAST(n_nationkey AS BIGINT) + l_linenumber) AS BIGINT)"
            " AS checksum",
        ).first()
        want = spark.sql(
            "SELECT CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(CAST(n_nationkey AS BIGINT) + l_linenumber) AS BIGINT)"
            " AS checksum "
            "FROM nation JOIN customer ON n_nationkey = c_nationkey "
            "JOIN orders ON c_custkey = o_custkey "
            "JOIN lineitem ON o_orderkey = l_orderkey"
        ).first()
        assert tuple(got) == tuple(want)
    finally:
        restore()


def test_config_validation():
    with pytest.raises(ValueError, match="join_order missing required"):
        TransformStep(type="select", sql="SELECT 1", join_order={"left": "a"})
    with pytest.raises(ValueError, match="engine='spark' select steps"):
        TransformStep(
            type="sql script",
            sql="SELECT 1",
            join_order={
                "left": "a", "mid": "b", "right": "c",
                "left_table": "/t/a", "mid_table": "/t/b",
                "right_table": "/t/c",
                "left_key": "k", "mid_left_key": "k",
                "mid_right_key": "j", "right_key": "j", "as": "v",
            },
        )


def test_chain_config_validation():
    good = {
        "chain": [
            {"view": "a", "table": "/t/a", "right_key": "k"},
            {"view": "b", "table": "/t/b", "left_key": "k",
             "right_key": "j"},
            {"view": "c", "table": "/t/c", "left_key": "j"},
        ],
        "as": "v",
    }
    TransformStep(type="select", sql="SELECT 1", join_order=good)
    with pytest.raises(ValueError, match="needs 'as'"):
        TransformStep(
            type="select", sql="SELECT 1",
            join_order={"chain": good["chain"]},
        )
    with pytest.raises(ValueError, match="at least 2 tables"):
        TransformStep(
            type="select", sql="SELECT 1",
            join_order={"chain": good["chain"][:1], "as": "v"},
        )
    with pytest.raises(ValueError, match="element 1 missing keys"):
        TransformStep(
            type="select", sql="SELECT 1",
            join_order={
                "chain": [
                    good["chain"][0],
                    {"view": "b", "table": "/t/b"},  # middle needs both keys
                    good["chain"][2],
                ],
                "as": "v",
            },
        )


def test_config_parse_roundtrip():
    """The join_order block survives config parsing (both spellings)."""
    from dwh_etl_framework_spark.plans.config import parse_pipeline_config

    spec = {
        "left": "a", "mid": "b", "right": "c",
        "left_table": "/t/a", "mid_table": "/t/b", "right_table": "/t/c",
        "left_key": "k", "mid_left_key": "k",
        "mid_right_key": "j", "right_key": "j", "as": "v",
    }
    cfg = parse_pipeline_config(
        {
            "tables": [
                {
                    "target": "t",
                    "transform": {
                        "full": [
                            {"type": "select", "sql": "SELECT 1",
                             "join-order": spec},
                        ]
                    },
                }
            ]
        }
    )
    assert cfg.tables[0].transform["full"][0].join_order == spec
