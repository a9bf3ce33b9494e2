"""Round-10 closing wave: r35 Q2-shaped correlated MIN over a join
tree, r36 Q15-shaped max-of-grouped-aggregate (plan probes + direct
semantics recomputation; hash parity runs in test_oracle_parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dwh_etl_framework_spark.queries.registry import fixtures
from dwh_etl_framework_spark.queries.wave18 import (
    r35_min_cost_supplier,
    r36_top_revenue_supplier,
)
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _supply(t):
    return (
        t.lineitem.groupBy(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .agg(
            F.min(F.floor(F.col("l_extendedprice") * 100).cast("long"))
            .alias("cost_cents")
        )
    )


def test_r35_plan_decorrelates_without_cartesian(spark):
    plan = _plan(r35_min_cost_supplier(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan  # the dim chain broadcasts


def test_r35_rows_are_region_minimum_suppliers(spark):
    """Direct recomputation: every reported (part, supplier) must carry
    the minimum EUROPE supply cost for that part, and every reported
    supplier must actually sit in EUROPE."""
    t = fixtures(spark, SF_DIR)
    rows = r35_min_cost_supplier(spark, SF_DIR).collect()
    assert rows, "fixture should produce minimum-cost suppliers"
    europe = (
        t.supplier.join(
            t.nation, t.supplier.s_nationkey == t.nation.n_nationkey
        )
        .join(t.region, t.nation.n_regionkey == t.region.r_regionkey)
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "n_name")
    )
    min_cost = {
        r["partkey"]: r["mn"]
        for r in _supply(t)
        .join(europe, F.col("suppkey") == F.col("s_suppkey"))
        .groupBy("partkey")
        .agg(F.min("cost_cents").alias("mn"))
        .collect()
    }
    euro_names = {r["s_name"] for r in europe.collect()}
    for r in rows:
        assert r["cost_cents"] == min_cost[r["p_partkey"]], r
        assert r["s_name"] in euro_names, r


def test_r35_limit_is_deterministic(spark):
    a = [tuple(r) for r in r35_min_cost_supplier(spark, SF_DIR).collect()]
    b = [tuple(r) for r in r35_min_cost_supplier(spark, SF_DIR).collect()]
    assert a == b and len(a) <= 100


def test_r36_plan_shape(spark):
    plan = _plan(r36_top_revenue_supplier(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    # the revenue groupBy must combine map-side before its exchange
    assert "partial_sum" in plan


def test_r36_returns_exactly_the_max_revenue_suppliers(spark):
    t = fixtures(spark, SF_DIR)
    rev = (
        t.lineitem.groupBy("l_suppkey")
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("long")
            ).alias("rev_cents")
        )
    )
    mx = rev.agg(F.max("rev_cents")).first()[0]
    want = sorted(
        r["l_suppkey"] for r in rev.filter(F.col("rev_cents") == mx).collect()
    )
    rows = r36_top_revenue_supplier(spark, SF_DIR).collect()
    assert sorted(r["s_suppkey"] for r in rows) == want
    assert all(r["rev_cents"] == mx for r in rows)


def test_x106_redaction_is_pii_free_and_control_survives(spark):
    import re

    from dwh_etl_framework_spark.queries.wave18 import (
        PII_EMAIL,
        PII_PHONE,
        x106_pii_redaction,
    )

    rows = x106_pii_redaction(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_emails"] == 1 and r["n_phones"] == 1, r
        assert not re.search(PII_EMAIL, r["redacted"]), r
        assert not re.search(PII_PHONE, r["redacted"]), r
        assert "<EMAIL>" in r["redacted"] and "<PHONE>" in r["redacted"]
        # negative control: the trailing account number is untouched
        assert r["redacted"].endswith(f"re account {r['id']}"), r


def test_x106_plan_is_map_only(spark):
    from dwh_etl_framework_spark.queries.wave18 import x106_pii_redaction

    plan = _plan(x106_pii_redaction(spark, SF_DIR))
    assert "Exchange" not in plan  # pure scan-rewrite: zero shuffles
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_r37_zero_order_customers_survive_and_plan_clean(spark):
    from dwh_etl_framework_spark.queries.wave18 import (
        r37_customer_order_distribution,
    )

    df = r37_customer_order_distribution(spark, SF_DIR)
    plan = _plan(df)
    assert "CartesianProduct" not in plan and "Window" not in plan
    rows = {r["n_orders"]: r["n_customers"] for r in df.collect()}
    # direct recomputation of the zero bucket: customers with NO
    # qualifying order must land in n_orders=0, not vanish
    t = fixtures(spark, SF_DIR)
    with_orders = (
        t.orders.filter(
            (F.col("o_orderstatus") == "P") & (F.col("o_totalprice") > 150000)
        )
        .select("o_custkey")
        .distinct()
        .count()
    )
    zero = t.customer.count() - with_orders
    assert rows.get(0, 0) == zero and zero > 0
    assert sum(rows.values()) == t.customer.count()  # a partition of customers


def test_r38_share_arithmetic_and_plan(spark):
    from dwh_etl_framework_spark.queries.wave18 import (
        r38_nation_market_share,
    )

    df = r38_nation_market_share(spark, SF_DIR)
    plan = _plan(df)
    assert "CartesianProduct" not in plan and "Window" not in plan
    rows = df.collect()
    assert rows
    for r in rows:
        assert 0 <= r["germany_cents"] <= r["total_cents"], r
        # the share is exactly the one division of the two exact sums
        assert r["germany_share"] == r["germany_cents"] / r["total_cents"], r


def test_r39_dominance_recomputed_and_plan_clean(spark):
    from dwh_etl_framework_spark.queries.wave18 import (
        r39_dominant_promo_supplier,
    )

    df = r39_dominant_promo_supplier(spark, SF_DIR)
    plan = _plan(df)
    assert "CartesianProduct" not in plan and "Window" not in plan
    assert "LeftSemi" in plan  # the IN decorrelates to a semi-join
    got = sorted(r["s_suppkey"] for r in df.collect())
    assert got, "fixture should produce top-share suppliers"
    # direct recomputation: per (supplier, promo part) volume vs the
    # part's maximum per-supplier volume
    t = fixtures(spark, SF_DIR)
    promo = t.part.filter(F.col("p_type") == "PROMO").select("p_partkey")
    li = t.lineitem.join(
        promo, t.lineitem["l_partkey"] == promo["p_partkey"]
    ).select("l_suppkey", "l_partkey", "l_quantity")
    grp = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("q")
    )
    mx = grp.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.max("q").alias("qmax")
    )
    want = sorted(
        {
            r["l_suppkey"]
            for r in grp.join(mx, F.col("l_partkey") == F.col("pk"))
            .filter(F.col("q") == F.col("qmax"))
            .collect()
        }
    )
    assert got == want
