"""Error-tolerant CSV ingest: malformed rows must not kill a 100 TB load.

PERMISSIVE mode + columnNameOfCorruptRecord quarantines bad rows for later
triage (the operational posture a production extract needs; the reference's
header-CSV scan, airflow_etl.py:351-353, would just fail)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType, StringType, StructField, StructType,
)


def test_permissive_csv_quarantines_bad_rows(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text(
        "id,name,qty\n"
        "1,alpha,10\n"
        "2,beta,notanumber\n"      # type error
        "3,gamma,30\n"
    )
    schema = StructType([
        StructField("id", IntegerType()),
        StructField("name", StringType()),
        StructField("qty", IntegerType()),
        StructField("_corrupt", StringType()),
    ])
    df = (
        spark.read.schema(schema)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(str(p))
    ).cache()  # corrupt-record column requires caching before filtering on it
    good = df.filter(F.col("_corrupt").isNull())
    bad = df.filter(F.col("_corrupt").isNotNull())
    assert {r.id for r in good.collect()} == {1, 3}
    bad_rows = bad.collect()
    assert len(bad_rows) == 1 and "notanumber" in bad_rows[0]._corrupt


def test_dropmalformed_mode(spark, tmp_path):
    p = tmp_path / "in2.csv"
    p.write_text("id,qty\n1,10\nbroken_line_only_one_field\n3,30\n")
    schema = StructType([
        StructField("id", IntegerType()), StructField("qty", IntegerType()),
    ])
    df = (
        spark.read.schema(schema).option("header", True)
        .option("mode", "DROPMALFORMED").csv(str(p))
    )
    assert {r.id for r in df.collect()} == {1, 3}
