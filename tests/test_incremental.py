"""Delta extract (the reference's unimplemented mode): watermark slices are

disjoint, exhaustive, and idempotent-on-empty."""

from __future__ import annotations

from pyspark.sql import functions as F

from dwh_etl_framework_spark.plans.incremental import WatermarkStore, extract_delta

from conftest import SF_DIR


def test_delta_extract_slices_are_disjoint_and_exhaustive(spark, tmp_path):
    store = WatermarkStore(str(tmp_path / "wm.json"))
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    cutoff = "1998-01-01"

    early = orders.filter(F.col("o_orderdate") <= cutoff)
    late = orders.filter(F.col("o_orderdate") > cutoff)

    # cycle 1: only early data "exists"
    s1 = extract_delta(early, "o_orderdate", store, "orders")
    n1 = s1.count()
    assert n1 == early.count()  # bootstrap = full extract

    # cycle 2: full table visible; slice must be exactly the late rows
    s2 = extract_delta(orders, "o_orderdate", store, "orders")
    keys2 = {r.o_orderkey for r in s2.select("o_orderkey").collect()}
    assert keys2 == {r.o_orderkey for r in late.select("o_orderkey").collect()}
    assert n1 + len(keys2) == orders.count()  # disjoint + exhaustive

    # cycle 3: nothing new → empty slice, watermark unchanged
    before = store.get("orders")
    s3 = extract_delta(orders, "o_orderdate", store, "orders")
    assert s3.count() == 0
    assert store.get("orders") == before


def test_delta_extract_without_advance_is_a_dry_run(spark, tmp_path):
    store = WatermarkStore(str(tmp_path / "wm.json"))
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    extract_delta(orders, "o_orderdate", store, "o")
    wm = store.get("o")
    again = extract_delta(orders, "o_orderdate", store, "o", advance=False)
    assert again.count() == 0
    assert store.get("o") == wm
