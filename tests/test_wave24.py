"""Round-12 closing wave: pipe syntax, native SQL parameters, the
statestore reader, and the repeated-span rewrite — the plan-shape and
semantics claims behind the r55/r56/f42/x112 docstrings."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from dwh_etl_framework_spark.queries.registry import fixtures
from dwh_etl_framework_spark.queries.wave24 import (
    _R55_PIPE,
    R56_MIN_PRICE,
    _R56_SQL,
    f42_statestore_read,
    r55_pipe_priority_report,
    r56_param_sql_report,
    span_dedup_rewrite,
    x112_span_dedup_rewrite,
)

from conftest import SF_DIR

_R55_CLASSIC = """
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem
WHERE l_shipdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
GROUP BY l_returnflag, l_linestatus
HAVING COUNT(*) > 10
ORDER BY l_returnflag, l_linestatus
"""


def test_r55_pipe_lowers_to_the_classic_plan(spark):
    """Pipe syntax is parser surface: same pushed-down scan, same
    grouping — and the post-AGGREGATE ``|> WHERE`` filters the alias
    directly, so unlike classic ``HAVING COUNT(*)`` the optimized plan
    carries no duplicate count(1) column (measured here, recorded in
    the r55 docstring)."""
    fixtures(spark, SF_DIR)
    pipe = spark.sql(_R55_PIPE)
    classic = spark.sql(_R55_CLASSIC)
    p1 = pipe._jdf.queryExecution().optimizedPlan().toString()
    p2 = classic._jdf.queryExecution().optimizedPlan().toString()
    # same single aggregate over the same grouping keys
    assert p1.count("Aggregate [l_returnflag") == 1
    assert p2.count("Aggregate [l_returnflag") == 1
    # classic HAVING duplicates the count into a throwaway column the
    # pipe form does not need
    assert "AS count(1)#" in p2 and "AS count(1)#" not in p1
    executed = pipe._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in executed
    assert "l_shipdate" in executed.split("PushedFilters: [")[1].split("]")[0]


def test_r55_matches_classic_rows(spark):
    got = r55_pipe_priority_report(spark, SF_DIR).collect()
    want = spark.sql(_R55_CLASSIC).collect()
    assert got == want and len(got) > 0


def test_r56_binds_values_as_data_not_sql(spark):
    """The injection probe: a quote-laden parameter value must bind as a
    literal (zero matching rows), never splice into the query text —
    the failure mode of string templating this surface replaces."""
    fixtures(spark, SF_DIR)
    hostile = "O' OR '1'='1"
    rows = spark.sql(
        _R56_SQL, args={"min_price": -1.0, "status": hostile}
    ).collect()
    assert rows == []


def test_r56_group_by_all_infers_the_explicit_grouping(spark):
    got = r56_param_sql_report(spark, SF_DIR)
    explicit = spark.sql(
        f"""
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents_sum
        FROM orders
        WHERE o_totalprice >= {R56_MIN_PRICE} AND o_orderstatus = 'O'
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """
    )
    assert got.collect() == explicit.collect()


def test_f42_state_equals_batch_aggregate(spark):
    """The checkpointed state read back through the statestore source
    must equal the batch aggregate of the same input — and a second call
    (memoized checkpoint) must serve the identical answer."""
    got = f42_statestore_read(spark, SF_DIR)
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    want = (
        events.selectExpr(
            "event_type", "CAST(floor(value * 100) AS BIGINT) AS cents"
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("cents_sum"),
        )
        .orderBy("event_type")
    )
    first = got.collect()
    assert first == want.collect()
    assert f42_statestore_read(spark, SF_DIR).collect() == first


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_x112_cuts_duplicate_keeps_canonical(spark):
    """Two 8-token documents sharing their only span: the lower doc_id
    (canonical owner) survives byte-identical, the other is fully cut."""
    span = "a b c d e f g h"
    out = {
        r["doc_id"]: r
        for r in span_dedup_rewrite(
            _docs(spark, [(1, span), (2, span)])
        ).collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert out[1]["n_cut"] == 0 and out[1]["clean_md5"] == md5(span)
    assert out[2]["n_cut"] == 8 and out[2]["clean_md5"] == md5("")


def test_x112_overlapping_windows_coalesce(spark):
    """A 12-token duplicated document has two overlapping duplicated
    windows (pos 1 and 5); the cut set must union to 12 positions, not
    16 — and untouched short documents pass through unchanged."""
    text12 = " ".join(f"t{i}" for i in range(12))
    short = "only three tokens"
    out = {
        r["doc_id"]: r
        for r in span_dedup_rewrite(
            _docs(spark, [(1, text12), (2, text12), (3, short)])
        ).collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert out[2]["n_cut"] == 12 and out[2]["clean_md5"] == md5("")
    assert out[1]["n_cut"] == 0
    assert out[3]["n_cut"] == 0 and out[3]["clean_md5"] == md5(short)


def test_x112_partial_cut_reconstructs_exactly(spark):
    """A doc sharing only its stride-aligned prefix span loses exactly
    those 8 tokens; its unique tail survives in original order."""
    span = "a b c d e f g h"
    tail = "x1 x2 x3 x4"
    out = {
        r["doc_id"]: r
        for r in span_dedup_rewrite(
            _docs(spark, [(1, span), (2, f"{span} {tail}")])
        ).collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    # doc 1 is the canonical owner of the shared span (lower doc_id);
    # doc 2's pos-1 window is cut, its pos-5 window straddles span+tail
    # and is unique, so only positions 1..8 go.
    assert out[1]["n_cut"] == 0
    assert out[2]["n_cut"] == 8 and out[2]["clean_md5"] == md5(tail)


def test_x112_no_python_no_cartesian(spark):
    """The rewrite stays JVM-side (no Python evaluation node) and joins
    on keys only — no nested-loop/cartesian product anywhere."""
    df = x112_span_dedup_rewrite(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_r57_identifier_rejects_compound_names(spark):
    """IDENTIFIER binds object NAMES, not SQL fragments: a value that is
    not a single identifier fails to parse instead of executing."""
    from dwh_etl_framework_spark.queries.wave24 import _R57_SQL

    fixtures(spark, SF_DIR)
    with pytest.raises(Exception) as exc:
        spark.sql(
            _R57_SQL, args={"tbl": "orders WHERE 1=1", "dim": "o_orderpriority"}
        ).collect()
    assert "PARSE" in str(exc.value).upper() or "IDENTIFIER" in str(exc.value).upper()


def test_r57_plan_matches_literal_query(spark):
    """Identifier parameters resolve at plan time — same optimized plan
    as the literal-spelled query."""
    import re

    from dwh_etl_framework_spark.queries.wave24 import (
        r57_identifier_report,
    )

    fixtures(spark, SF_DIR)
    got = r57_identifier_report(spark, SF_DIR)
    lit = spark.sql(
        """
        SELECT o_orderpriority AS dim_value,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents_sum
        FROM orders GROUP BY o_orderpriority ORDER BY dim_value
        """
    )
    norm = lambda s: re.sub(r"#\d+L?", "#", s)
    assert norm(got._jdf.queryExecution().optimizedPlan().toString()) == norm(
        lit._jdf.queryExecution().optimizedPlan().toString()
    )
