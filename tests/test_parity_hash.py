"""Parity-hash recipe equivalence (r8 vectorized canonicalizer).

tools/run_parity.py r8 swapped row-at-a-time collect() + Python sort for
Arrow column extraction + an order-insensitive digest-sum. The artifact
is correctness EVIDENCE, so the fast path must canonicalize every value
exactly like the row path on BOTH engines — float repr (incl. NaN, -0.0),
decimals, naive/tz timestamps, dates, bytes, arrays, nulls, booleans.

Pins:
1. synthetic kitchen-sink frame: Spark arrow-hash == Spark row-hash,
   and the DuckDB twin of the same literals matches both ways too;
2. representative registry queries at sf0.001: per engine,
   arrow-hash == row-hash (and Spark == DuckDB where oracled);
3. order insensitivity: permuted rows and permuted columns hash equal.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from run_parity import _hash_arrow, _hash_rows  # noqa: E402

from conftest import SF_DIR  # noqa: E402


def _spark_both(sdf):
    return _hash_arrow(sdf.toArrow()), _hash_rows(
        sdf.columns, [tuple(r) for r in sdf.collect()]
    )


def _duck_both(con, sql):
    cols = con.sql(sql).columns
    a = _hash_arrow(con.sql(sql).fetch_arrow_table())
    r = _hash_rows(cols, con.sql(sql).fetchall())
    return a, r


KITCHEN_SINK_SQL = """
    SELECT * FROM (VALUES
      (1::BIGINT, 'a', 1.5::DOUBLE, 0.25::FLOAT, DATE '2024-02-29',
       TIMESTAMP '2024-02-29 23:59:59.123456', TRUE,
       CAST('1234567890.12' AS DECIMAL(18,2)), CAST('\\xDE\\xAD' AS BLOB),
       [1.5::DOUBLE, 2.5::DOUBLE], ['x', NULL]),
      (2::BIGINT, NULL, 'NaN'::DOUBLE, -0.0::FLOAT, NULL,
       NULL, FALSE, NULL, NULL, NULL, []),
      (3::BIGINT, '', -0.0::DOUBLE, 'NaN'::FLOAT, DATE '1970-01-01',
       TIMESTAMP '1970-01-01 00:00:00', NULL,
       CAST('-0.01' AS DECIMAL(18,2)), CAST('' AS BLOB),
       ['-Infinity'::DOUBLE, 'Infinity'::DOUBLE], [''])
    ) AS t(k, s, d, f, dt, ts, b, dec, bin, arr_d, arr_s)
"""


def _kitchen_sink_spark(spark):
    import datetime
    from decimal import Decimal

    rows = [
        (1, "a", 1.5, 0.25, datetime.date(2024, 2, 29),
         datetime.datetime(2024, 2, 29, 23, 59, 59, 123456), True,
         Decimal("1234567890.12"), b"\xde\xad", [1.5, 2.5], ["x", None]),
        (2, None, float("nan"), -0.0, None, None, False, None, None, None,
         []),
        (3, "", -0.0, float("nan"), datetime.date(1970, 1, 1),
         datetime.datetime(1970, 1, 1), None, Decimal("-0.01"), b"",
         [float("-inf"), float("inf")], [""]),
    ]
    schema = (
        "k long, s string, d double, f float, dt date, ts timestamp, "
        "b boolean, dec decimal(18,2), bin binary, "
        "arr_d array<double>, arr_s array<string>"
    )
    return spark.createDataFrame(rows, schema)


def test_kitchen_sink_fast_equals_slow_and_cross_engine(spark):
    sdf = _kitchen_sink_spark(spark)
    sa, sr = _spark_both(sdf)
    assert sa == sr
    con = duckdb.connect()
    da, dr = _duck_both(con, KITCHEN_SINK_SQL)
    assert da == dr
    # and the two engines agree on the same logical values
    assert sa == da
    con.close()


def test_order_and_column_order_insensitive(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", float("nan")), (3, None, -0.0)],
        "k long, s string, d double",
    )
    base = _hash_arrow(df.toArrow())
    assert _hash_arrow(df.orderBy("d").toArrow()) == base
    assert _hash_arrow(df.select("d", "k", "s").toArrow()) == base
    # but a changed VALUE changes the hash
    other = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", float("nan")), (4, None, -0.0)],
        "k long, s string, d double",
    )
    assert _hash_arrow(other.toArrow()) != base
    # and two extra copies of one row ≠ one copy (count rides the digest)
    dup = df.unionAll(df.limit(1))
    assert _hash_arrow(dup.toArrow()) != base


REPRESENTATIVE = [
    # name -> covers
    "r16_agg_pricing_summary",      # decimals
    "r23_date_fns",                 # dates + epoch arithmetic
    "r30_tumbling_window",          # timestamps
    "x05_cosine_topk",              # doubles
    "x11_binary_columns",           # binary + metadata structspace
    "r24d_null_fns",                # nulls through functions
]


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_registry_queries_fast_equals_slow(spark, ddb, name):
    from dwh_etl_framework_spark.queries import QUERIES

    qd = QUERIES[name]
    sdf = qd.fn(spark, SF_DIR)
    sa, sr = _spark_both(sdf)
    assert sa == sr, f"{name}: spark arrow-path != row-path"
    if qd.oracle is not None:
        da, dr = _duck_both(ddb, qd.oracle)
        assert da == dr, f"{name}: duckdb arrow-path != row-path"
        assert sa == da, f"{name}: spark != duckdb under new recipe"


def test_timestamptz_fast_equals_slow_and_cross_engine(spark):
    """ADVICE r8: tz-aware timestamps must canonicalize identically on
    the Arrow fast path (column-level UTC normalization) and the row
    fallback (_canon's astimezone(utc)), per engine AND across engines —
    DuckDB's row path yields tz-AWARE datetimes where str() would keep
    the UTC offset and spuriously mismatch."""
    con = duckdb.connect()
    sql = """
        SELECT * FROM (VALUES
          (1::BIGINT, TIMESTAMPTZ '2024-06-01 12:00:00+02:00'),
          (2::BIGINT, TIMESTAMPTZ '1969-12-31 23:59:59.5-00:30'),
          (3::BIGINT, NULL)
        ) AS t(k, ts)
    """
    da, dr = _duck_both(con, sql)
    assert da == dr, "duckdb arrow-path != row-path on TIMESTAMPTZ"
    # Spark twin: same instants as session-TZ (UTC) timestamps
    sdf = spark.sql(
        "SELECT * FROM VALUES "
        "(1L, timestamp'2024-06-01 10:00:00'), "
        "(2L, timestamp'1970-01-01 00:29:59.5'), "
        "(3L, CAST(NULL AS timestamp)) AS t(k, ts)"
    )
    sa, sr = _spark_both(sdf)
    assert sa == sr, "spark arrow-path != row-path on timestamps"
    assert sa == da, "spark != duckdb on the same instants"
    con.close()
