"""Property tests for wave 11 (x86 count-min sketch) plus the z-order
PRODUCTION write path (repartitionByRange + sorted parquet write) that
x82's ntile oracle twin stands in for.
"""

from __future__ import annotations

from conftest import SF_DIR

from pyspark.sql import functions as F

from dwh_etl_framework_spark.operators import sketch
from dwh_etl_framework_spark.queries import QUERIES
from dwh_etl_framework_spark.queries.registry import fixtures
from dwh_etl_framework_spark.queries.wave9 import _z_expr


def test_cms_never_undercounts_and_bounded(spark):
    """CMS guarantees: est ≥ exact for EVERY key (one-sided error), and
    overcount ≤ d·n/w with overwhelming probability at this load factor
    (150 keys in 512 columns)."""
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    sk = sketch.cms_sketch(events, "user_id")
    users = events.select("user_id").distinct()
    est = sketch.cms_estimate(sk, users, "user_id")
    exact = events.groupBy("user_id").count()
    joined = est.join(exact, "user_id").collect()
    n = events.count()
    for r in joined:
        assert r["est_count"] >= r["count"], r
        assert r["est_count"] - r["count"] <= sketch.CMS_D * n // sketch.CMS_W, r


def test_cms_sketches_sum_merge(spark):
    """Counters from disjoint halves summed cell-wise equal the
    whole-data sketch — the mergeable-summaries property the per-day
    composition relies on."""
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    whole = sketch.cms_sketch(events, "user_id")
    h1 = sketch.cms_sketch(events.filter(F.col("event_id") % 2 == 0), "user_id")
    h2 = sketch.cms_sketch(events.filter(F.col("event_id") % 2 == 1), "user_id")
    merged = (
        h1.unionAll(h2)
        .groupBy("r", "col")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    w = {(r["r"], r["col"]): r["cnt"] for r in whole.collect()}
    m = {(r["r"], r["col"]): r["cnt"] for r in merged.collect()}
    assert w == m


def test_cms_sketch_is_tiny(spark):
    """State bound: the counter table never exceeds d·w rows regardless
    of input size."""
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    assert (
        sketch.cms_sketch(events, "user_id").count()
        <= sketch.CMS_D * sketch.CMS_W
    )


def test_zorder_production_write_path(spark, tmp_path):
    """The REAL layout pass x82's ntile twin models: repartitionByRange on
    the Morton key + sortWithinPartitions + parquet write. Reading back
    per-file zone maps (via input_file_name) must let the 2-D probe skip
    a strict majority of files — the layout works end-to-end through an
    actual write, not just in the ntile model."""
    t = fixtures(spark, "/root/testdata/sf0.01")
    day = "CAST(datediff(o_orderdate, DATE '1995-01-01') AS BIGINT)"
    keyed = t.orders.select(
        "o_orderkey",
        "o_custkey",
        F.expr(day).alias("day_nr"),
        F.expr(f"CAST({_z_expr('o_custkey', day, 'DIV')} AS BIGINT)").alias("zval"),
    )
    dest = str(tmp_path / "zordered")
    (
        keyed.repartitionByRange(16, "zval")
        .sortWithinPartitions("zval")
        .write.mode("overwrite")
        .parquet(dest)
    )
    stats = (
        spark.read.parquet(dest)
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            F.min("o_custkey").alias("min_ck"),
            F.max("o_custkey").alias("max_ck"),
            F.min("day_nr").alias("min_day"),
            F.max("day_nr").alias("max_day"),
        )
        .collect()
    )
    assert len(stats) >= 8  # range partitioner actually spread the data
    ck_lo, ck_hi, day_lo, day_hi = 1000, 2000, 0, 365
    skipped = [
        r
        for r in stats
        if r["min_ck"] > ck_hi
        or r["max_ck"] < ck_lo
        or r["min_day"] > day_hi
        or r["max_day"] < day_lo
    ]
    assert len(skipped) > len(stats) // 2, (len(skipped), len(stats))


def test_x87_owner_is_canonical_and_positions_align(spark):
    """Every reported occurrence points at a strictly earlier (doc,pos)
    owner; exact duplicate docs (x01's planted copies exist in the
    fixture) must report span-for-span aligned positions."""
    out = QUERIES["x87_repeated_spans"].fn(spark, "/root/testdata/sf0.01")
    rows = out.collect()
    assert rows  # fixture has planted duplicate docs
    for r in rows:
        assert (r["owner_doc"], r["owner_pos"]) < (r["doc_id"], r["start_pos"])
        assert r["n_copies"] >= 2
    # a full-duplicate pair shares aligned window positions
    from collections import defaultdict
    by_pair = defaultdict(set)
    for r in rows:
        by_pair[(r["owner_doc"], r["doc_id"])].add(
            (r["owner_pos"], r["start_pos"])
        )
    aligned = [
        pair
        for pair, ps in by_pair.items()
        if len(ps) >= 3 and all(a == b for a, b in ps)
    ]
    assert aligned, "expected at least one whole-doc duplicate pair"


def test_x88_estimate_brackets_exact(spark):
    """The histogram estimate is the floor-bucket of the true quantile:
    est_bucket ≤ exact_val < est_bucket + 1 for every (type, q) — the
    equi-width histogram's accuracy contract (and the reason the bucket
    width is the knob, not the data size)."""
    rows = QUERIES["x88_histogram_quantiles"].fn(
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert len(rows) == 15  # 5 types × 3 quantiles
    from dwh_etl_framework_spark.queries.wave11 import HIST_BUCKETS
    for r in rows:
        if r["est_bucket"] < HIST_BUCKETS - 1:  # cap bucket is one-sided
            assert r["est_bucket"] <= r["exact_val"] < r["est_bucket"] + 1, r
