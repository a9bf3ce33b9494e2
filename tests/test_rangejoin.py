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


def test_broadcast_guard_drops_hint_for_known_big_intervals(spark, tmp_path):
    """A parquet-backed interval side whose KNOWN size exceeds the limit
    loses the broadcast hint (shuffle join instead of broadcast OOM) and
    still returns correct rows."""
    import warnings as _w

    facts = spark.createDataFrame([(50.0,), (150.0,)], "x double")
    ivals_path = str(tmp_path / "ivals")
    spark.createDataFrame(
        [(0.0, 100.0, "a"), (100.0, 200.0, "b")], "lo double, hi double, tag string"
    ).write.parquet(ivals_path)
    ivals = spark.read.parquet(ivals_path)

    # without the hint AND without Catalyst's own size-based election the
    # join must degrade to a shuffle — disable auto-broadcast to observe it
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        with _w.catch_warnings(record=True) as caught:
            _w.simplefilter("always")
            out = range_join(
                facts, ivals, "x", "lo", "hi", bucket_width=100.0,
                broadcast_size_limit=1,  # force the guard
            )
            rows = {(r.x, r.tag) for r in out.collect()}
        assert rows == {(50.0, "a"), (150.0, "b")}
        assert any(
            "dropping the broadcast hint" in str(w.message) for w in caught
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_broadcast_guard_keeps_hint_for_statsless_frames(spark):
    """createDataFrame intervals (unknown size) keep the broadcast hint —
    the round-2 fix that stops Catalyst broadcasting the fact side."""
    facts = spark.createDataFrame([(50.0,)], "x double")
    ivals = spark.createDataFrame([(0.0, 100.0, "a")], "lo double, hi double, tag string")
    out = range_join(facts, ivals, "x", "lo", "hi", bucket_width=100.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
