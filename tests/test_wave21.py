"""Round-12 engine surfaces: SQL UDFs (scalar + table-valued) and SQL
scripting — the plan-shape claims behind the r53/r54 docstrings."""

from __future__ import annotations

from dwh_etl_framework_spark.queries.registry import fixtures
from dwh_etl_framework_spark.queries.wave21 import (
    r53_sql_udf,
    r54_scripted_threshold,
)

from conftest import SF_DIR


def test_r53_sql_udfs_inline_into_the_scan(spark):
    """SQL UDFs are plan-time macros: the table function's
    l_returnflag predicate must reach the parquet scan as a pushed
    filter, and no Python evaluation node may appear — the plan is the
    hand-inlined query's plan."""
    df = r53_sql_udf(spark, SF_DIR)
    df.collect()  # finalize the adaptive plan so codegen spans show
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters: [")[1].split("]")[0]
    assert "l_returnflag" in pushed
    assert "Python" not in plan  # no runtime function boundary
    assert "*(" in plan  # whole-stage-codegen span markers survive


def test_r53_table_udf_is_reusable_with_other_arguments(spark):
    """One registration serves every call site — the slice argument is
    an ordinary parameter, not a baked-in literal."""
    fixtures(spark, SF_DIR)
    r53_sql_udf(spark, SF_DIR)  # registers the functions
    n_r = spark.sql("SELECT * FROM flagged_lines('R')").count()
    n_a = spark.sql("SELECT * FROM flagged_lines('A')").count()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    assert n_r == li.filter("l_returnflag = 'R'").count()
    assert n_a == li.filter("l_returnflag = 'A'").count()


def test_r54_script_equals_inline_two_phase(spark):
    """The scripted DECLARE/SET threshold must equal the hand-rolled
    two-phase plan: collect the scalar, then filter by the literal."""
    fixtures(spark, SF_DIR)
    got = {
        r["o_orderpriority"]: (r["n_above"], r["cents_above"])
        for r in r54_scripted_threshold(spark, SF_DIR).collect()
    }
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    thr = orders.selectExpr(
        "CAST(avg(o_totalprice) AS DECIMAL(18,6)) AS t"
    ).first()["t"]
    want = {
        r["o_orderpriority"]: (r["n_above"], r["cents_above"])
        for r in orders.filter(f"o_totalprice > {thr}")
        .groupBy("o_orderpriority")
        .agg(
            {"*": "count", "o_totalprice": "sum"}
        )
        .selectExpr(
            "o_orderpriority",
            "CAST(`count(1)` AS BIGINT) AS n_above",
            "CAST(NULL AS BIGINT) AS cents_above",  # counts checked below
        )
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], k
    # cents re-derived independently row-side for one bucket
    one = sorted(got)[0]
    rows = orders.filter(
        f"o_totalprice > {thr} AND o_orderpriority = '{one}'"
    ).collect()
    import math

    assert got[one][1] == sum(
        int(math.floor(r["o_totalprice"] * 100)) for r in rows
    )


def test_r54_script_runs_repeatedly_in_one_session(spark):
    """Session variables must not leak state between executions — the
    script re-declares and re-derives its threshold each run."""
    a = r54_scripted_threshold(spark, SF_DIR).collect()
    b = r54_scripted_threshold(spark, SF_DIR).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_r49b_stored_variant_equals_cold_parse_and_skips_the_parse(spark):
    """The stored-variant path must produce exactly the cold-parse r49
    result, and its executed plan must carry NO parse_json — the parse
    was paid once at the ingest landing, not per query."""
    from dwh_etl_framework_spark.queries.wave20 import r49_variant_json
    from dwh_etl_framework_spark.queries.wave21 import r49b_variant_stored

    cold = sorted(map(tuple, r49_variant_json(spark, SF_DIR).collect()))
    stored_df = r49b_variant_stored(spark, SF_DIR)
    assert sorted(map(tuple, stored_df.collect())) == cold
    plan = stored_df._jdf.queryExecution().executedPlan().toString()
    assert "parse_json" not in plan
    assert "variant_get" in plan  # typed access against the stored column
    # idempotent store: a second call reuses the landing (same rows)
    again = sorted(map(tuple, r49b_variant_stored(spark, SF_DIR).collect()))
    assert again == cold
