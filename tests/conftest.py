from __future__ import annotations

import duckdb
import pytest

from dwh_etl_framework_spark.session import SessionFactory
from dwh_etl_framework_spark.sources.registry import FIXTURE_TABLES

import os

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


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
