"""x109 join-order DP: the Selinger arithmetic, its invariants, and the
metadata-served entry point's equality with the oracled inline spec."""

from __future__ import annotations

from pyspark.sql import functions as F

from dwh_etl_framework_spark.queries.wave22 import x109_join_order_dp
from dwh_etl_framework_spark.sources.sinks import (
    choose_join_order_from_metadata,
    write_table_with_sketches,
)

from conftest import SF_DIR


def test_x109_invariants(spark):
    """Exactly one plan chosen; the chosen plan's intermediate is the
    minimum; the final estimate is order-independent (same value on
    both rows); and on this schema the dimension-first order must win
    (customer⋈orders ≈ |orders| beats orders⋈lineitem ≈ |lineitem|)."""
    rows = {r["plan"]: r for r in x109_join_order_dp(spark, SF_DIR).collect()}
    assert set(rows) == {"co_first", "ol_first"}
    assert sum(1 for r in rows.values() if r["chosen"]) == 1
    winner = next(r for r in rows.values() if r["chosen"])
    assert winner["est_intermediate_rows"] == min(
        r["est_intermediate_rows"] for r in rows.values()
    )
    finals = {r["est_final_rows"] for r in rows.values()}
    assert len(finals) == 1
    assert winner["plan"] == "co_first"


def test_x109_estimates_track_true_sizes(spark):
    """The costing statistic is only useful if it ranks like reality:
    each candidate's estimated intermediate must sit within the HLL
    error envelope of the TRUE join size (keys are near-unique on one
    side, so truth ≈ the fact side's row count)."""
    from dwh_etl_framework_spark.queries.registry import fixtures

    t = fixtures(spark, SF_DIR)
    rows = {r["plan"]: r for r in x109_join_order_dp(spark, SF_DIR).collect()}
    true_co = t.customer.join(
        t.orders, t.customer.c_custkey == t.orders.o_custkey
    ).count()
    true_ol = t.orders.join(
        t.lineitem, t.orders.o_orderkey == t.lineitem.l_orderkey
    ).count()
    for plan, truth in [("co_first", true_co), ("ol_first", true_ol)]:
        est = rows[plan]["est_intermediate_rows"]
        # HLL at m=64 is ±13% sigma; 3-sigma envelope on the ratio
        assert 0.6 * truth <= est <= 1.6 * truth, (plan, est, truth)
    # and the DP ranked the orders the way the true sizes rank
    winner = next(r["plan"] for r in rows.values() if r["chosen"])
    assert winner == ("co_first" if true_co <= true_ol else "ol_first")


def test_join_order_from_landed_metadata_equals_inline_spec(spark, tmp_path):
    """The production entry point reads counts and NDVs from the landed
    _sketches/ tiers (zero input scans) and must reproduce the oracled
    inline arithmetic exactly — same estimates, same chosen order."""
    from dwh_etl_framework_spark.queries.registry import fixtures

    t = fixtures(spark, SF_DIR)
    paths = {}
    for name, df, keys in [
        ("customer", t.customer, ["c_custkey"]),
        ("orders", t.orders, ["o_custkey", "o_orderkey"]),
        ("lineitem", t.lineitem, ["l_orderkey"]),
    ]:
        paths[name] = str(tmp_path / name)
        write_table_with_sketches(df, paths[name], keys, mode="overwrite")
    got = choose_join_order_from_metadata(
        spark,
        (paths["customer"], "c_custkey"),
        (paths["orders"], "o_custkey", "o_orderkey"),
        (paths["lineitem"], "l_orderkey"),
    )
    inline = {
        r["plan"]: r for r in x109_join_order_dp(spark, SF_DIR).collect()
    }
    assert got["est_lm_first"] == inline["co_first"]["est_intermediate_rows"]
    assert got["est_mr_first"] == inline["ol_first"]["est_intermediate_rows"]
    assert got["est_final_rows"] == inline["co_first"]["est_final_rows"]
    assert (got["chosen"] == "lm_first") == inline["co_first"]["chosen"]
    assert got["n_left"] == t.customer.count()
    assert got["n_mid"] == t.orders.count()
    assert got["n_right"] == t.lineitem.count()
