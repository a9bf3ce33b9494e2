"""Range join: boundary semantics (lo inclusive, hi exclusive), bucket-edge

values, left-join unmatched facts."""

from __future__ import annotations

from pyspark.sql import Row

from dwh_etl_framework_spark.operators.rangejoin import range_join


def test_boundaries_and_bucket_edges(spark):
    facts = spark.createDataFrame(
        [Row(id=i, x=float(v)) for i, v in enumerate([0.0, 999.99, 1000.0, 1500.0, 2000.0, 5000.0])]
    )
    ivals = spark.createDataFrame(
        [Row(band="a", lo=0.0, hi=1000.0), Row(band="b", lo=1000.0, hi=2000.0)]
    )
    got = {
        r.id: r.band
        for r in range_join(facts, ivals, "x", "lo", "hi", bucket_width=700.0).collect()
    }
    # 0.0→a (lo inclusive), 999.99→a, 1000.0→b (hi exclusive for a),
    # 1500→b, 2000.0→NO match (hi exclusive for b), 5000→no interval
    assert got == {0: "a", 1: "a", 2: "b", 3: "b"}


def test_left_join_keeps_unmatched(spark):
    facts = spark.createDataFrame([Row(id=1, x=50.0), Row(id=2, x=9999.0)])
    ivals = spark.createDataFrame([Row(band="a", lo=0.0, hi=100.0)])
    got = {r.id: r.band
           for r in range_join(facts, ivals, "x", "lo", "hi", 100.0, how="left").collect()}
    assert got == {1: "a", 2: None}


def test_overlapping_intervals_multiply(spark):
    """Overlapping intervals are all matched (a fact can land in several)."""
    facts = spark.createDataFrame([Row(id=1, x=10.0)])
    ivals = spark.createDataFrame(
        [Row(band="x", lo=0.0, hi=20.0), Row(band="y", lo=5.0, hi=15.0)]
    )
    rows = range_join(facts, ivals, "x", "lo", "hi", 10.0).collect()
    assert sorted(r.band for r in rows) == ["x", "y"]
