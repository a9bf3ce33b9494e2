"""Timestamp-flavor robustness (round-5 regression).

The driver's fixture generator has shipped ``events.ts`` in two parquet
flavors across rounds:

- TIMESTAMP(NANOS): Spark 4 refuses it unless
  ``spark.sql.legacy.parquet.nanosAsLong`` is on, in which case it arrives
  as a ns-since-epoch ``bigint``;
- naive TIMESTAMP(MICROS): Spark 4 reads it as ``TIMESTAMP_NTZ``.

Round 4 lost its bench artifact and six tests to the second flavor. These
tests pin the contract: ``normalize_ts_flavor`` (and therefore
``register_fixture_tables`` and every query built on ``fixtures()``) must
yield identical session-TZ ``timestamp`` values from BOTH flavors, and the
one query that crashed (x21_funnel) must run against a naive-µs fixture.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dwh_etl_framework_spark.sources.registry import (
    normalize_ts_flavor,
    register_fixture_tables,
)

WALL_CLOCK = [
    dt.datetime(2024, 1, 1, 0, 0, 0),
    dt.datetime(2024, 1, 1, 12, 30, 45),
    dt.datetime(2024, 3, 15, 23, 59, 59),
]


def _write_events(path: str, ts_type: pa.DataType) -> None:
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "user_id": pa.array([10, 10, 20], pa.int64()),
            "event_type": pa.array(["signup", "purchase", "signup"]),
            "value": pa.array([0.0, 9.99, 0.0], pa.float64()),
            "ts": pa.array(WALL_CLOCK, pa.timestamp("us")).cast(ts_type),
        }
    )
    # version="2.6" keeps ns as TIMESTAMP(NANOS) instead of coercing to µs
    pq.write_table(table, path, version="2.6")


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_normalize_ts_flavor_both_parquet_flavors(spark, tmp_path, unit):
    path = str(tmp_path / f"events_{unit}.parquet")
    _write_events(path, pa.timestamp(unit))
    raw = spark.read.parquet(path)
    raw_dtype = dict(raw.dtypes)["ts"]
    # precondition: the two flavors really do arrive differently
    assert raw_dtype == {"us": "timestamp_ntz", "ns": "bigint"}[unit]
    df = normalize_ts_flavor(raw)
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = sorted(r.ts.replace(tzinfo=None) for r in df.select("ts").collect())
    assert got == WALL_CLOCK  # wall-clock preserved (session TZ is UTC)


def test_register_fixture_tables_normalizes_naive_us(spark, tmp_path):
    _write_events(str(tmp_path / "events.parquet"), pa.timestamp("us"))
    out = register_fixture_tables(spark, str(tmp_path), tables=("events",))
    assert dict(out["events"].dtypes)["ts"] == "timestamp"


def test_x21_funnel_runs_on_naive_us_fixture(spark, tmp_path):
    """The round-4 crash: TIMESTAMP_NTZ.cast('long') in x21. The rewritten
    query must run against a naive-µs events fixture end-to-end.

    ``fixtures()`` registers all 10 tables, so the synthetic sf_dir links
    every non-events table from the real fixture dir."""
    import os

    from conftest import SF_DIR
    from dwh_etl_framework_spark.queries import QUERIES
    from dwh_etl_framework_spark.sources.registry import FIXTURE_TABLES

    for t in FIXTURE_TABLES:
        if t != "events":
            os.symlink(f"{SF_DIR}/{t}.parquet", tmp_path / f"{t}.parquet")
    _write_events(str(tmp_path / "events.parquet"), pa.timestamp("us"))
    rows = {
        r.user_id: r
        for r in QUERIES["x21_funnel"].fn(spark, str(tmp_path)).collect()
    }
    assert rows[10].converted and rows[10].seconds_to_convert == 45045
    assert not rows[20].converted and rows[20].seconds_to_convert is None
