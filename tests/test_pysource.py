"""Python DataSource tier (sources/pysource.py): partitioned embedded-
engine reads, Arrow transfer, engine-side predicate, schema mapping."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dwh_etl_framework_spark.sources.pysource import DuckDBSource, _spark_ddl

from conftest import SF_DIR


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(DuckDBSource)


def _read(spark, **opts):
    r = spark.read.format("duckdb")
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def test_roundtrip_matches_native_parquet_read(spark):
    df = _read(
        spark,
        query=f"SELECT * FROM '{SF_DIR}/part.parquet'",
        partition_col="p_partkey",
        partitions=4,
    )
    native = spark.read.parquet(f"{SF_DIR}/part.parquet")
    assert sorted(df.columns) == sorted(native.columns)
    a = sorted((tuple(r) for r in df.collect()), key=repr)
    b = sorted(
        (tuple(r) for r in native.select(df.columns).collect()), key=repr
    )
    assert a == b


def test_partitions_cover_disjointly_and_in_parallel(spark):
    df = _read(
        spark,
        query=f"SELECT p_partkey FROM '{SF_DIR}/part.parquet'",
        partition_col="p_partkey",
        partitions=6,
    )
    assert df.rdd.getNumPartitions() == 6
    native_n = spark.read.parquet(f"{SF_DIR}/part.parquet").count()
    # disjoint + complete: total equals source, per-key exactly once
    assert df.count() == native_n
    assert df.distinct().count() == native_n
    # no empty-partition collapse: at least 2 partitions carry rows
    sizes = df.rdd.glom().map(len).collect()
    assert sum(sizes) == native_n and sum(1 for s in sizes if s) >= 2


def test_engine_side_query_pushdown(spark):
    """Aggregation runs INSIDE the engine: the source emits one row."""
    df = _read(
        spark,
        query=(
            f"SELECT l_returnflag AS flag, COUNT(*) AS n, "
            f"CAST(SUM(l_quantity) AS BIGINT) AS qty "
            f"FROM '{SF_DIR}/lineitem.parquet' GROUP BY 1"
        ),
    )
    native = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_quantity").cast("long").alias("qty"),
        )
    )
    got = {r["flag"]: (r["n"], r["qty"]) for r in df.collect()}
    want = {r["flag"]: (r["n"], r["qty"]) for r in native.collect()}
    assert got == want


def test_schema_maps_dates_and_decimals(spark):
    df = _read(
        spark,
        query=(
            "SELECT DATE '2024-01-31' AS d, "
            "CAST(1.50 AS DECIMAL(12,2)) AS m, "
            "CAST(7 AS BIGINT) AS i, 'x' AS s, TRUE AS b"
        ),
    )
    kinds = dict(df.dtypes)
    assert kinds == {
        "d": "date",
        "m": "decimal(12,2)",
        "i": "bigint",
        "s": "string",
        "b": "boolean",
    }
    row = df.first()
    assert str(row["d"]) == "2024-01-31" and float(row["m"]) == 1.5


def test_unknown_type_fails_loudly():
    with pytest.raises(ValueError, match="no Spark mapping"):
        _spark_ddl("UUID")


def test_missing_query_option_fails(spark):
    with pytest.raises(Exception, match="query"):
        spark.read.format("duckdb").load().collect()
