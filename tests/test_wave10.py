"""Property tests for the wave-10 operators (x84, x85, f29) — the
invariants the SQL oracles can't express: HLL mergeability and error
bounds, bucketing's strict padding win, backfill completeness.
"""

from __future__ import annotations

from conftest import SF_DIR

from pyspark.sql import Row
from pyspark.sql import functions as F

from dwh_etl_framework_spark.operators import sketch
from dwh_etl_framework_spark.queries import QUERIES


def test_hll_registers_are_max_mergeable(spark):
    """The core sketch contract: registers built on two disjoint halves,
    merged with MAX, must equal registers built on the whole — exactly
    what Spark's partial aggregation relies on map-side, and what makes
    per-day register tables combinable without touching raw data."""
    df = spark.range(2000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") * 7919 % 997).alias("v"),
    )
    whole = sketch.hll_registers(df, ["g"], "v")
    half1 = sketch.hll_registers(df.filter(F.col("id") % 2 == 0), ["g"], "v")
    half2 = sketch.hll_registers(df.filter(F.col("id") % 2 == 1), ["g"], "v")
    merged = sketch.hll_merge(half1, half2)
    w = {(r["g"], r["bucket"]): r["reg"] for r in whole.collect()}
    m = {(r["g"], r["bucket"]): r["reg"] for r in merged.collect()}
    assert w == m


def test_hll_estimate_error_bound(spark):
    """Raw-HLL relative error is ~1.04/√m ≈ 13% at m=64; assert a 3-sigma
    bound (40%) over several true cardinalities, and that the estimate
    GROWS with the true count (monotone enough to rank groups)."""
    rows = []
    for g, n in [("a", 50), ("b", 400), ("c", 3000)]:
        rows += [Row(g=g, v=g + ":" + str(i)) for i in range(n)]
    df = spark.createDataFrame(rows)
    est = {
        r["g"]: r["hll_estimate"]
        for r in sketch.hll_estimate(
            sketch.hll_registers(df, ["g"], "v"), ["g"]
        ).collect()
    }
    for g, n in [("a", 50), ("b", 400), ("c", 3000)]:
        assert abs(est[g] - n) / n < 0.4, (g, n, est[g])
    assert est["a"] < est["b"] < est["c"]


def test_hll_duplicates_do_not_move_registers(spark):
    """HLL is insensitive to multiplicity: replicating every value 5×
    must leave every register — and so the estimate — unchanged."""
    df = spark.range(500).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    df5 = df.crossJoin(spark.range(5).select(F.lit(1).alias("__x"))).drop("__x")
    r1 = {(r["bucket"]): r["reg"] for r in sketch.hll_registers(df, ["g"], "v").collect()}
    r5 = {(r["bucket"]): r["reg"] for r in sketch.hll_registers(df5, ["g"], "v").collect()}
    assert r1 == r5


def test_x84_no_distinct_shuffle_of_values(spark):
    """The sketch side's aggregate must run partial (map-side combine):
    the plan's first HashAggregate over the hashed values happens before
    the exchange, so raw user ids never cross the wire for the estimate
    column. (The exact COUNT(DISTINCT) audit column in x84 still does —
    by design, it's the audit.) Verified structurally: registers ≤ m per
    group, far below the row count."""
    df = QUERIES["x84_hll_distinct"].fn(spark, SF_DIR)
    rows = df.collect()
    assert all(r["n_buckets_used"] <= sketch.HLL_M for r in rows)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_max" in plan.lower() or "HashAggregate" in plan, plan


def test_x85_bucketing_strictly_wins(spark):
    """On any corpus with length variance, bucketed batching must waste
    strictly fewer pad tokens than corpus-order batching, and both must
    account the same real token total."""
    rows = {r["policy"]: r for r in QUERIES["x85_length_bucket_packing"].fn(spark, SF_DIR).collect()}
    assert rows["bucketed"]["real_tokens"] == rows["global"]["real_tokens"]
    assert rows["bucketed"]["pad_tokens"] < rows["global"]["pad_tokens"]


def test_f29_grid_is_complete(spark):
    """missing + sparse + healthy slots = |types| × |hours|, and every
    'missing' slot truly has zero events (no false gaps)."""
    from dwh_etl_framework_spark.queries.registry import fixtures

    t = fixtures(spark, SF_DIR)
    out = QUERIES["f29_backfill_plan"].fn(spark, SF_DIR)
    n_types = t.events.select("event_type").distinct().count()
    bounds = t.events.agg(
        F.min(F.date_trunc("hour", "ts")).alias("mn"),
        F.max(F.date_trunc("hour", "ts")).alias("mx"),
    ).collect()[0]
    n_hours = int((bounds["mx"] - bounds["mn"]).total_seconds() // 3600) + 1
    observed = t.events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_ts")
    ).count()
    healthy = observed.filter(F.col("count") >= 2).count()
    assert out.count() + healthy == n_types * n_hours
    # no false gaps: a 'missing' slot joined back to events finds nothing
    missing = out.filter(F.col("status") == "missing")
    back = missing.join(
        observed.withColumnRenamed("count", "n"),
        on=["event_type", "hour_ts"],
        how="inner",
    )
    assert back.count() == 0
