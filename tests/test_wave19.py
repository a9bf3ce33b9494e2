"""Round-11 TPC-H shape suite (r40-r48): plan probes pinning the scale
claims each docstring makes (cartesian-free, broadcasts where claimed,
TakeOrdered for top-k) plus direct semantics recomputation for the
shapes with a non-obvious rewrite. Hash parity runs in
test_oracle_parity / tools/run_parity.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from dwh_etl_framework_spark.queries.registry import fixtures
from dwh_etl_framework_spark.queries.wave19 import (
    r40_shipping_priority,
    r41_volume_shipping,
    r42_product_profit,
    r43_returned_items,
    r44_priority_by_class,
    r45_promo_share,
    r46_large_volume_orders,
    r47_disjunctive_bands,
    r48_inactive_big_balance,
    x107_pii_luhn_redaction,
)
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_r40_plan_topk_never_full_sorts(spark):
    plan = _plan(r40_shipping_priority(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan  # LIMIT 10 rides the sort
    assert "BroadcastHashJoin" in plan  # segment-pruned customer


def test_r40_respects_both_date_cutoffs(spark):
    rows = r40_shipping_priority(spark, SF_DIR).collect()
    assert rows and len(rows) <= 10
    cutoff = "1998-03-15"
    for r in rows:
        assert str(r["o_orderdate"]) < f"{cutoff} 23:59:59"


def test_r41_plan_and_direction_symmetry(spark):
    plan = _plan(r41_volume_shipping(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    rows = r41_volume_shipping(spark, SF_DIR).collect()
    assert rows
    g1 = {"NATION_1", "NATION_2", "NATION_3"}
    g2 = {"NATION_4", "NATION_5", "NATION_6"}
    for r in rows:
        # every row is a cross-group route, never intra-group
        assert (r["supp_nation"] in g1) != (r["supp_nation"] in g2)
        assert (r["cust_nation"] in g1) != (r["cust_nation"] in g2)
        assert (r["supp_nation"] in g1) == (r["cust_nation"] in g2)


def test_r42_plan_filters_part_before_fact_join(spark):
    plan = _plan(r42_product_profit(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    # the LIKE filter reaches the part scan side, not post-join
    assert "red" in plan


def test_r43_top20_deterministic(spark):
    a = [tuple(r) for r in r43_returned_items(spark, SF_DIR).collect()]
    b = [tuple(r) for r in r43_returned_items(spark, SF_DIR).collect()]
    assert a == b and 0 < len(a) <= 20
    plan = _plan(r43_returned_items(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan


def test_r44_counts_partition_the_join(spark):
    rows = {r["ship_class"]: r for r in r44_priority_by_class(spark, SF_DIR).collect()}
    t = fixtures(spark, SF_DIR)
    joined = t.orders.join(
        t.lineitem, t.orders.o_orderkey == t.lineitem.l_orderkey
    ).filter(
        (F.col("l_linestatus") == "F")
        & (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    total = joined.count()
    assert total == sum(
        r["high_line_count"] + r["low_line_count"] for r in rows.values()
    )


def test_r45_ratio_is_exact_quotient_of_the_integer_columns(spark):
    row = r45_promo_share(spark, SF_DIR).first()
    assert row["total_cents"] > 0
    assert row["promo_share_pct"] == (
        float(row["promo_cents"]) * 100.0 / float(row["total_cents"])
    )


def test_r46_every_row_clears_the_having_threshold(spark):
    rows = r46_large_volume_orders(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["sum_qty"] > 180


def test_r47_disjunction_keeps_the_hash_join(spark):
    """The exact failure mode Q19 exists to catch: the OR inside the
    join condition must not degrade the equi-join to a nested loop."""
    plan = _plan(r47_disjunctive_bands(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan
    row = r47_disjunctive_bands(spark, SF_DIR).first()
    assert row["n_lines"] > 0


def test_r48_gate_and_antijoin_semantics(spark):
    """Direct recomputation of the integer-gate + anti-join: every
    reported group only counts inactive customers above the pooled
    positive average."""
    t = fixtures(spark, SF_DIR)
    got = {
        r["cntrycode"]: (r["numcust"], r["totacctbal_cents"])
        for r in r48_inactive_big_balance(spark, SF_DIR).collect()
    }
    codes = ["05", "10", "17", "23", "25", "31", "36",
             "41", "48", "59", "62", "74", "88", "93"]
    pool = t.customer.select(
        "c_custkey",
        F.substring("c_name", 17, 2).alias("cc"),
        F.floor(F.col("c_acctbal") * 100).cast("long").alias("bal"),
    ).filter(F.col("cc").isin(codes))
    pos = pool.filter(F.col("bal") > 0).agg(
        F.sum("bal").alias("s"), F.count(F.lit(1)).alias("n")
    ).first()
    active = t.orders.filter(F.col("o_orderdate") >= "2000-01-01").select(
        F.col("o_custkey").alias("c_custkey")
    ).distinct()
    want_rows = (
        pool.join(active, "c_custkey", "left_anti")
        .filter(F.col("bal") * F.lit(pos["n"]) > F.lit(pos["s"]))
        .groupBy("cc")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("bal").alias("tot"))
        .collect()
    )
    want = {r["cc"]: (r["n"], r["tot"]) for r in want_rows}
    assert got == want
    plan = _plan(r48_inactive_big_balance(spark, SF_DIR))
    assert "CartesianProduct" not in plan


def _luhn_ok(s: str) -> bool:
    total = 0
    for i, ch in enumerate(s, start=1):  # left position; odd → doubled
        d = int(ch)
        total += (2 * d - 9 if d >= 5 else 2 * d) if i % 2 == 1 else d
    return total % 10 == 0


def test_x107_plan_is_map_only(spark):
    plan = _plan(x107_pii_luhn_redaction(spark, SF_DIR))
    assert "Exchange" not in plan  # zero shuffles — pure scan-rewrite
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_x107_luhn_guard_survives_rows_without_candidates(spark, ddb):
    """Review r11: the Luhn fold must sit inside a CASE branch, not a
    bare AND conjunct — DuckDB evaluates conjuncts vectorized, so
    CAST(substring('', i, 1) AS INT) on candidate-less rows would error.
    Probe both engines over a corpus where half the rows carry no
    16-digit candidate."""
    from dwh_etl_framework_spark.queries.wave19 import luhn_sum_sql

    sql = f"""
    WITH rows_t AS (
        SELECT 'card 4111111111111111 x' AS text
        UNION ALL SELECT 'no digits here'
    ),
    scored AS (
        SELECT text, regexp_extract(text, '[0-9]{{16}}', 0) AS candidate
        FROM rows_t
    )
    SELECT CAST(CASE WHEN candidate = '' THEN 0
                WHEN {luhn_sum_sql("candidate", 16)} % 10 = 0 THEN 1
                ELSE 0 END AS BIGINT) AS luhn_valid
    FROM scored ORDER BY luhn_valid
    """
    got_spark = [r["luhn_valid"] for r in spark.sql(sql).collect()]
    got_duck = [r[0] for r in ddb.sql(sql).fetchall()]
    assert got_spark == got_duck == [0, 1]  # 4111... is the classic valid test PAN


def test_x107_luhn_sql_matches_reference_python_on_random_pans(spark):
    """Property check: the generated arithmetic Luhn SQL agrees with an
    independent Python implementation on 200 seeded random 16-digit
    strings (one vectorized Spark job, both verdict classes present)."""
    import random

    from dwh_etl_framework_spark.queries.wave19 import luhn_sum_sql

    rng = random.Random(421)
    pans = [
        "".join(str(rng.randint(0, 9)) for _ in range(16)) for _ in range(200)
    ]
    df = spark.createDataFrame([(p,) for p in pans], "candidate string")
    df.createOrReplaceTempView("pans_t")
    got = {
        r["candidate"]: r["ok"]
        for r in spark.sql(
            f"SELECT candidate, {luhn_sum_sql('candidate', 16)} % 10 = 0 AS ok "
            "FROM pans_t"
        ).collect()
    }
    want = {p: _luhn_ok(p) for p in pans}
    assert got == want
    assert any(want.values()) and not all(want.values())


def test_x107_three_outcomes(spark):
    """Checksum-valid + not allowlisted → redacted; checksum-invalid →
    verbatim; valid-but-allowlisted → verbatim. Validated against an
    independent Python Luhn implementation."""
    rows = x107_pii_luhn_redaction(spark, SF_DIR).collect()
    assert rows
    n_redacted = n_invalid = n_allowed = 0
    for r in rows:
        assert r["n_candidates"] == 1
        # recover the candidate from the unredacted shape of the text
        if "<CARD>" in r["redacted"]:
            n_redacted += 1
            assert r["luhn_valid"] == 1 and not r["allowlisted"]
        else:
            card = r["redacted"].split()[1]
            assert len(card) == 16 and card.isdigit()
            assert _luhn_ok(card) == bool(r["luhn_valid"])
            if r["luhn_valid"]:
                assert r["allowlisted"], "valid un-allowlisted must redact"
                n_allowed += 1
            else:
                n_invalid += 1
    # every outcome class is populated at every SF
    assert n_redacted and n_invalid and n_allowed
