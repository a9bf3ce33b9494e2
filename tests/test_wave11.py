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


def test_x87_long_document_owner_keys_do_not_collide(spark):
    """Guard for the round-6 owner-key overflow (VERDICT r6 item 3 /
    ADVICE): the old composite key ``doc_id * 10^6 + pos`` collided once a
    document passed 10^6 tokens — (doc 1, pos ~2M) packed LARGER than
    (doc 7, pos 5), so the later document stole canonical ownership. The
    struct(doc_id, pos) MIN has no position bound: doc 1 must own the
    shared span even at a >10^6 position."""
    from dwh_etl_framework_spark.queries.wave11 import SPAN_S, SPAN_W, repeated_spans

    shared = " ".join(f"dup{i}" for i in range(SPAN_W))
    # doc 1: >1M filler tokens, then the shared span at pos > 10^6.
    # Filler words are all distinct so only the planted span repeats.
    long_doc = " ".join(f"w{i}" for i in range(1_000_000)) + " " + shared
    short_doc = shared + " " + " ".join(f"v{i}" for i in range(SPAN_W))
    docs = spark.createDataFrame(
        [(1, long_doc), (7, short_doc)], "doc_id long, text string"
    )
    rows = repeated_spans(docs).collect()
    # stride alignment: the planted span starts at token 1,000,001 in doc 1,
    # which is ≡ 1 (mod SPAN_S) just like pos 1 in doc 7 — both windows hash
    # the identical 8 tokens.
    assert (1_000_000 % SPAN_S) == 0  # test invariant, keeps the plant aligned
    hits = [r for r in rows if r["doc_id"] == 7]
    assert hits, f"expected doc 7 reported as the duplicate, got {rows}"
    for r in hits:
        assert r["owner_doc"] == 1, r
        assert r["owner_pos"] > 1_000_000, r


def test_cms_estimate_returns_zero_for_unseen_keys(spark):
    """ADVICE r6: a key whose addressed counters are all absent from the
    sketch must return est_count = 0 (absent cell ⇒ count 0 ⇒ MIN is 0),
    and every probed key must survive to the output — the old inner join
    silently dropped such keys."""
    data = spark.range(1, 101).selectExpr("CAST(id AS STRING) AS v")
    sk = sketch.cms_sketch(data, "v")
    probes = spark.createDataFrame(
        [("5",), ("never-seen-key-xyz",), ("77",)], "v string"
    )
    est = {
        r["v"]: r["est_count"]
        for r in sketch.cms_estimate(sk, probes, "v").collect()
    }
    assert set(est) == {"5", "never-seen-key-xyz", "77"}  # no key dropped
    assert est["5"] >= 1 and est["77"] >= 1  # CMS never undercounts
    # 100 distinct values over d=4 rows × w=512 cols: the chance every one
    # of the 4 addressed cells of an unseen key is occupied is tiny, and
    # this key was checked deterministic-zero when the test was written.
    assert est["never-seen-key-xyz"] == 0


def test_hll_merge_aligns_columns_by_name(spark):
    """ADVICE r6: register tables built with differently ordered group
    columns must merge by NAME; positional union would silently mis-merge
    (group value read as bucket)."""
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    a = sketch.hll_registers(events, ["event_type"], "user_id")
    # same registers, columns permuted
    b = a.select("reg", "bucket", "event_type")
    merged = sketch.hll_merge(a, b)
    base = {
        (r["event_type"], r["bucket"]): r["reg"] for r in a.collect()
    }
    got = {
        (r["event_type"], r["bucket"]): r["reg"] for r in merged.collect()
    }
    assert got == base  # MAX-idempotent: merging with itself changes nothing


def test_x82_audit_matches_real_parquet_footers(spark, tmp_path):
    """VERDICT r6 item 6: the zone-map audit must hold on REAL files, not
    just the arithmetic twin. Materialize exactly the audit's file
    geometry (partitionBy the ntile file_id), read each file's parquet
    FOOTER row-group statistics — the zone maps an engine actually
    consults — and assert per file: footer min/max == the audit's
    min/max, and the probe's real skip decision == the audit's
    probe_skips column."""
    import glob

    import pyarrow.parquet as pq

    from dwh_etl_framework_spark.queries.wave9 import (
        PROBE_CK_HI,
        PROBE_CK_LO,
        PROBE_DAY_HI,
        PROBE_DAY_LO,
        Z_FILES,
    )
    from pyspark.sql import Window

    audit = {
        r["file_id"]: r
        for r in QUERIES["x82_zorder_layout"].fn(
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    assert len(audit) == Z_FILES
    t = fixtures(spark, "/root/testdata/sf0.01")
    day = "CAST(datediff(o_orderdate, DATE '1995-01-01') AS BIGINT)"
    keyed = t.orders.select(
        "o_orderkey",
        "o_custkey",
        F.expr(day).alias("day_nr"),
        F.expr(f"CAST({_z_expr('o_custkey', day, 'DIV')} AS BIGINT)").alias(
            "zval"
        ),
    )
    filed = keyed.withColumn(
        "file_id", F.ntile(Z_FILES).over(Window.orderBy("zval", "o_orderkey"))
    )
    dest = str(tmp_path / "zfiles")
    (
        filed.repartition(Z_FILES, "file_id")
        .write.mode("overwrite")
        .partitionBy("file_id")
        .parquet(dest)
    )
    n_skipped_real = 0
    for fid, row in audit.items():
        paths = glob.glob(f"{dest}/file_id={fid}/*.parquet")
        assert paths, f"no parquet written for file_id={fid}"
        mins_ck, maxs_ck, mins_day, maxs_day, n_rows = [], [], [], [], 0
        for p in paths:
            meta = pq.ParquetFile(p).metadata
            n_rows += meta.num_rows
            cols = {
                meta.schema.column(i).name: i
                for i in range(meta.num_columns)
            }
            for rg in range(meta.num_row_groups):
                st_ck = meta.row_group(rg).column(cols["o_custkey"]).statistics
                st_day = meta.row_group(rg).column(cols["day_nr"]).statistics
                assert st_ck.has_min_max and st_day.has_min_max
                mins_ck.append(st_ck.min)
                maxs_ck.append(st_ck.max)
                mins_day.append(st_day.min)
                maxs_day.append(st_day.max)
        # footer zone maps must agree with the audit's arithmetic
        assert n_rows == row["n_rows"], fid
        assert min(mins_ck) == row["min_ck"], fid
        assert max(maxs_ck) == row["max_ck"], fid
        assert min(mins_day) == row["min_day"], fid
        assert max(maxs_day) == row["max_day"], fid
        # the probe's REAL skip decision (every row group outside the box)
        real_skip = all(
            lo > PROBE_CK_HI or hi < PROBE_CK_LO
            for lo, hi in zip(mins_ck, maxs_ck)
        ) or all(
            lo > PROBE_DAY_HI or hi < PROBE_DAY_LO
            for lo, hi in zip(mins_day, maxs_day)
        )
        # single-row-group files (the case here) make this exactly the
        # audit's min/max test; assert equivalence, not just implication
        assert real_skip == row["probe_skips"], fid
        n_skipped_real += real_skip
    assert n_skipped_real > Z_FILES // 2  # the layout actually prunes
