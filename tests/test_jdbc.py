"""JDBC scan/sink integration (F1/F2/F15/F16) against embedded Derby —

the reference's core extract path (connector.py:27-61), including the
partitioned-read options the reference never set (its single-task-scan
defect, SURVEY.md §0)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dwh_etl_framework_spark.sources.registry import SourceSpec, load_source
from dwh_etl_framework_spark.sources.sinks import write_jdbc

URL = "jdbc:derby:memory:enginetest;create=true"
DRIVER_OPTS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


@pytest.fixture(scope="module")
def seeded(spark):
    """F15: land a DataFrame in the RDBMS via the engine's jdbc sink."""
    df = spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("grp"),
        (F.col("id") * 10).cast("double").alias("amount"),
    )
    write_jdbc(df, URL, "accounts", mode="overwrite", options=DRIVER_OPTS)
    return df


def test_jdbc_scan_table(spark, seeded):
    """F2: whole-table scan over JDBC via SourceSpec."""
    spec = SourceSpec(
        alias="accounts", format="jdbc", url=URL, dbtable="accounts",
        options=DRIVER_OPTS,
    )
    back = load_source(spark, spec)
    assert back.count() == 100
    assert {r.k for r in back.collect()} == set(range(100))


def test_jdbc_scan_query(spark, seeded):
    """F1: push a SQL query to the source RDBMS (the reference's extract

    shape: read a query's result, connector.py:27-46)."""
    # Spark writes Derby tables with quoted (case-sensitive) identifiers, so
    # the pushed-down query must quote them too
    spec = SourceSpec(
        alias="slice", format="jdbc", url=URL,
        query='SELECT "k", "amount" FROM accounts WHERE "grp" = 3',
        options=DRIVER_OPTS,
    )
    back = load_source(spark, spec)
    rows = back.collect()
    assert all(r.k % 7 == 3 for r in rows)
    assert len(rows) == len([i for i in range(100) if i % 7 == 3])


def test_jdbc_partitioned_scan(spark, seeded):
    """F1 fixed: partitioned parallel read (partitionColumn/bounds/

    numPartitions — the knob whose absence made every reference extract a
    single-task scan)."""
    spec = SourceSpec(
        alias="par", format="jdbc", url=URL, dbtable="accounts",
        partition_column="k", lower_bound=0, upper_bound=100, num_partitions=4,
        options=DRIVER_OPTS,
    )
    back = load_source(spark, spec)
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 100


def test_jdbc_partitioned_query_rejected():
    """Spark restriction surfaced as a clear error: partitioned reads need

    dbtable, not query."""
    spec = SourceSpec(
        alias="bad", format="jdbc", url=URL, query="SELECT 1",
        partition_column="k", lower_bound=0, upper_bound=10, num_partitions=2,
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="dbtable"):
        load_source(None, spec)


def test_jdbc_truncate_overwrite(spark, seeded):
    """F16: truncate-then-append keeps serving reads (reference protocol,

    airflow_etl.py:95-108)."""
    df2 = spark.range(5).select(
        F.col("id").alias("k"), F.lit(0).alias("grp"),
        F.lit(1.0).alias("amount"),
    )
    write_jdbc(df2, URL, "accounts", mode="overwrite", truncate=True,
               options=DRIVER_OPTS)
    spec = SourceSpec(alias="after", format="jdbc", url=URL,
                      dbtable="accounts", options=DRIVER_OPTS)
    assert load_source(spark, spec).count() == 5
    # restore for other tests (module fixture ordering safety)
    write_jdbc(
        spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("grp"),
            (F.col("id") * 10).cast("double").alias("amount"),
        ),
        URL, "accounts", mode="overwrite", truncate=True, options=DRIVER_OPTS,
    )


def test_vendor_jdbc_options():
    """Vendor presets mirror the reference's per-type branches
    (connector.py:43-44) plus its fetch/batch knobs; user options win."""
    from dwh_etl_framework_spark.sources.registry import SourceSpec, jdbc_options

    opts = jdbc_options("oracle", fetch_size=5000, batch_size=10000)
    assert opts["oracle.jdbc.mapDateToTimestamp"] == "false"
    assert opts["fetchsize"] == "5000" and opts["batchsize"] == "10000"
    # user override beats the preset
    assert jdbc_options("oracle", extra={
        "oracle.jdbc.mapDateToTimestamp": "true"
    })["oracle.jdbc.mapDateToTimestamp"] == "true"
    with pytest.raises(ValueError, match="unknown jdbc vendor"):
        jdbc_options("sybase")
    with pytest.raises(ValueError, match="unknown jdbc vendor"):
        SourceSpec(alias="x", format="jdbc", url="jdbc:derby:memory:v",
                   dbtable="t", vendor="sybase")


def test_vendor_spec_reads_through_derby(spark, seeded):
    """A vendor-tagged spec still round-trips (derby preset is empty —
    the option-merge path itself is exercised)."""
    from dwh_etl_framework_spark.sources.registry import SourceSpec, load_source

    spec = SourceSpec(
        alias="v_derby", format="jdbc", url=URL, dbtable="accounts",
        vendor="derby", options=DRIVER_OPTS,
    )
    assert load_source(spark, spec).count() == seeded.count()
