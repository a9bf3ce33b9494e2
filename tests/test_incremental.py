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


def test_timestamp_watermark_roundtrips_typed(spark, tmp_path):
    """A sub-second timestamp watermark must survive the JSON store TYPED:
    stored-as-string watermarks relied on Spark's implicit string→timestamp
    cast, which yields NULL (⇒ silently empty delta) for reprs the cast
    rejects (ADVICE r1)."""
    import datetime

    store = WatermarkStore(str(tmp_path / "wm.json"))
    wm = datetime.datetime(2024, 3, 1, 12, 30, 45, 123456)
    store.set("ev", wm)
    loaded = store.get("ev")
    assert loaded == wm and isinstance(loaded, datetime.datetime)

    df = spark.createDataFrame(
        [
            (1, datetime.datetime(2024, 3, 1, 12, 30, 45, 123455)),  # below
            (2, datetime.datetime(2024, 3, 1, 12, 30, 45, 123456)),  # equal
            (3, datetime.datetime(2024, 3, 1, 12, 30, 45, 123457)),  # above
        ],
        "id long, ts timestamp",
    )
    sliced = extract_delta(df, "ts", store, "ev", advance=True)
    assert [r.id for r in sliced.collect()] == [3]
    # watermark advanced to the max ts seen, still typed
    assert store.get("ev") == datetime.datetime(2024, 3, 1, 12, 30, 45, 123457)


def test_date_and_decimal_watermarks_roundtrip_typed(tmp_path):
    import datetime
    import decimal

    store = WatermarkStore(str(tmp_path / "wm.json"))
    store.set("d", datetime.date(2024, 3, 1))
    store.set("x", decimal.Decimal("1234.56"))
    assert store.get("d") == datetime.date(2024, 3, 1)
    assert store.get("x") == decimal.Decimal("1234.56")
