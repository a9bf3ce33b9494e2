from __future__ import annotations

import duckdb
import pytest

from dwh_etl_framework_spark.session import SessionFactory
from dwh_etl_framework_spark.sources.registry import (
    FIXTURE_TABLES,
    normalize_ts_flavor,
)

import os

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def load_events(spark, sf_dir: str = SF_DIR):
    """Events fixture with ``ts`` normalized to session-TZ TimestampType,

    whatever timestamp flavor the driver's parquet writer used (ns-long or
    naive µs/TIMESTAMP_NTZ). Streaming tests share this instead of each
    hand-rolling a conversion that assumes one flavor."""
    return normalize_ts_flavor(spark.read.parquet(f"{sf_dir}/events.parquet"))


@pytest.fixture(scope="session")
def spark():
    spark = SessionFactory(
        app_name="dwh-etl-framework-spark-tests", shuffle_partitions=8
    ).build()
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()
