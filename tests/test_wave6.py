"""Structural invariants for the round-6 wave-2 operators — conservation

laws the per-query DuckDB oracle cannot express because they relate a
query's output to the corpus (or to a sibling query) rather than to an
equivalent SQL rewrite.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dwh_etl_framework_spark.queries import QUERIES
from dwh_etl_framework_spark.queries.wave6 import EVAL_K, EVAL_NODES

from conftest import SF_DIR


def test_x61_covers_every_sampled_node(spark):
    """Every node in the sample votes and is counted exactly once, and
    accuracy is a valid ppm."""
    rows = QUERIES["x61_knn_label_eval"].fn(spark, SF_DIR).collect()
    n_sample = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .filter(F.col("vec_id") < EVAL_NODES)
        .count()
    )
    assert sum(r.n_nodes for r in rows) == n_sample
    for r in rows:
        assert 0 <= r.n_correct <= r.n_nodes
        assert r.accuracy_ppm == r.n_correct * 1_000_000 // r.n_nodes


def test_x61_edges_match_x57_geometry(spark):
    """x61 votes over the same edge geometry x57 audits: every sampled
    node has exactly k outgoing edges (the sample is larger than k, so
    no node runs short and no vote is double-counted)."""
    from dwh_etl_framework_spark.operators import similarity

    nodes = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").filter(
        F.col("vec_id") < EVAL_NODES
    )
    deg = (
        similarity.knn_join(nodes, nodes, k=EVAL_K, exact=True)
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("out_deg"))
    )
    assert deg.count() == nodes.count()
    assert deg.filter(F.col("out_deg") != EVAL_K).count() == 0


def test_x62_confusion_conserves_vectors(spark):
    """The confusion matrix partitions the corpus: cell counts sum to the
    vector count, and each true-label row sums to that label's count."""
    conf = QUERIES["x62_centroid_confusion"].fn(spark, SF_DIR).collect()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    assert sum(r.n_vecs for r in conf) == emb.count()
    per_label = {
        r.label: r.n for r in emb.groupBy("label").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    row_sums: dict[int, int] = {}
    for r in conf:
        row_sums[r.true_label] = row_sums.get(r.true_label, 0) + r.n_vecs
    assert row_sums == per_label


def test_x63_spectrum_conserves_corpus_mass(spark):
    """Σ occurrences·n_tokens over the spectrum equals the corpus token
    count, and the ppm masses sum to 1e6 up to per-row floor loss."""
    spec = QUERIES["x63_token_spectrum"].fn(spark, SF_DIR).collect()
    total_tokens = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select(F.sum(F.size(F.split("text", " "))).alias("n"))
        .collect()[0][0]
    )
    assert sum(r.occurrences * r.n_tokens for r in spec) == total_tokens
    mass = sum(r.mass_ppm for r in spec)
    assert 1_000_000 - len(spec) <= mass <= 1_000_000


def test_x64_shares_and_ranks_are_complete(spark):
    """Per type: event counts conserve, ppm shares sum to 1e6 up to floor
    loss, and peak ranks are exactly 1..n_hours."""
    rows = QUERIES["x64_event_hourly_profile"].fn(spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    per_type = {
        r.event_type: r.n for r in ev.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    assert set(by_type) == set(per_type)
    for etype, hrs in by_type.items():
        assert sum(r.n_events for r in hrs) == per_type[etype]
        share = sum(r.share_ppm for r in hrs)
        assert 1_000_000 - len(hrs) <= share <= 1_000_000
        assert sorted(r.peak_rank for r in hrs) == list(range(1, len(hrs) + 1))
        peak = min(hrs, key=lambda r: r.peak_rank)
        assert peak.n_events == max(r.n_events for r in hrs)


def test_f06_jsonl_roundtrip_preserves_rows(spark):
    """The JSON roundtrip loses no rows and re-infers integer columns as
    BIGINT (matching the parquet originals)."""
    out = QUERIES["f06_jsonl_roundtrip"].fn(spark, SF_DIR)
    src = spark.read.parquet(f"{SF_DIR}/supplier.parquet")
    assert out.count() == src.count()
    dt = dict(out.dtypes)
    assert dt["s_suppkey"] == "bigint"
    assert dt["s_nationkey"] == "bigint"


def test_x65_tv_bounds_and_coverage(spark):
    """TV distance is a valid ppm in [0, 1e6], every source is reported,
    and token counts conserve the corpus total."""
    rows = QUERIES["x65_source_drift_tv"].fn(spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_sources = docs.select("source").distinct().count()
    assert len(rows) == n_sources
    total_tokens = docs.select(
        F.sum(F.size(F.split("text", " ")))
    ).collect()[0][0]
    assert sum(r.n_tokens for r in rows) == total_tokens
    for r in rows:
        assert 0 <= r.tv_ppm <= 1_000_000


def test_r14b_matches_unconstrained_rollup(spark):
    """The six-table join conserves: summing the (region, nation) revenue
    cells reproduces the same total as a direct two-table computation of
    the identical filtered revenue (local-supplier constraint applied)."""
    rows = QUERIES["r14b_regional_supply_chain"].fn(spark, SF_DIR).collect()
    t_rev = sum(r.revenue_fp for r in rows)
    t_cnt = sum(r.n_lineitems for r in rows)
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    s = spark.read.parquet(f"{SF_DIR}/supplier.parquet")
    flat = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            s,
            (F.col("s_suppkey") == F.col("l_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
    )
    price = F.col("l_extendedprice").cast("decimal(14,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    agg = flat.agg(
        (F.sum(price * (F.lit(1) - disc)) * 10000)
        .cast("bigint")
        .alias("rev"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert (t_rev, t_cnt) == (agg.rev, agg.n)


def test_x67_pair_counts_conserve(spark):
    """Σ n_dup_pairs over the matrix equals the direct per-chunk-digest
    Σ n·(n−1)/2 (every duplicated-chunk pair lands in exactly one source
    cell), and the matrix is non-empty at the driver SF (x55 finds
    duplicated chunks here, so a vacuous result would be a bug)."""
    from dwh_etl_framework_spark.queries.wave6 import _chunk_digests

    rows = QUERIES["x67_cross_source_dups"].fn(spark, SF_DIR).collect()
    total = sum(r.n_dup_pairs for r in rows)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    ch = _chunk_digests(type("T", (), {"documents": docs})())
    per_digest = (
        ch.groupBy("digest")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select(F.sum(F.expr("n * (n - 1) div 2")).alias("t"))
        .collect()[0][0]
    )
    assert total == (per_digest or 0)
    assert total > 0
    for r in rows:
        assert r.source_a <= r.source_b
        assert r.n_dup_pairs > 0


def test_x66_leakage_is_x02_cross_split_subset(spark):
    """Leak pair counts equal x02's near-dup pairs filtered to split
    mismatches, and doc counts are bounded by 2·pairs."""
    from dwh_etl_framework_spark.operators import dedup

    leaks = QUERIES["x66_split_leakage"].fn(spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pairs = dedup.ngram_jaccard_pairs(
        docs, "text", "doc_id", n=3, threshold=0.5
    ).select("doc_a", "doc_b")
    h2 = F.substring(
        F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 2
    )
    assigned = docs.select(
        "doc_id",
        F.when(h2 < "e6", "train").when(h2 < "f3", "val").otherwise("test")
        .alias("split"),
    )
    cross = (
        pairs.join(
            assigned.select(F.col("doc_id").alias("doc_a"),
                            F.col("split").alias("sa")), "doc_a")
        .join(assigned.select(F.col("doc_id").alias("doc_b"),
                              F.col("split").alias("sb")), "doc_b")
        .filter(F.col("sa") != F.col("sb"))
        .count()
    )
    assert sum(r.n_pairs for r in leaks) == cross
    for r in leaks:
        assert r.split_lo < r.split_hi
        assert 2 <= r.n_docs <= 2 * r.n_pairs


def test_x60b_capped_containment_is_lower_bound(spark):
    """The capped tier is sound: every pair it reports appears in the
    exact x60 result with n_common/ppm at least as large, and with the
    cap effectively infinite the two results are identical."""
    exact = {
        (r.doc_a, r.doc_b): (r.n_common, r.containment_ppm)
        for r in QUERIES["x60_shingle_containment"].fn(spark, SF_DIR).collect()
    }
    capped = QUERIES["x60b_containment_capped"].fn(spark, SF_DIR).collect()
    for r in capped:
        assert (r.doc_a, r.doc_b) in exact
        en, eppm = exact[(r.doc_a, r.doc_b)]
        assert r.n_common <= en
        assert r.containment_ppm <= eppm

    from dwh_etl_framework_spark.operators import dedup
    from dwh_etl_framework_spark.operators.bucket_cap import cap_bucket_size
    from dwh_etl_framework_spark.queries.round6_ops import (
        CONTAIN_MIN_PPM,
        CONTAIN_MIN_SHINGLES,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sh = dedup.shingle_table(docs, "text", "doc_id", n=5)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    wide = cap_bucket_size(sh, ["shingle"], max_bucket_size=10**9)
    ov = (
        wide.select(F.col("doc_id").alias("doc_a"), "shingle")
        .join(wide.select(F.col("doc_id").alias("doc_b"), "shingle"), "shingle")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    full = (
        ov.join(sizes.select(F.col("doc_id").alias("doc_a"), "n_sh"), "doc_a")
        .filter(F.col("n_sh") >= CONTAIN_MIN_SHINGLES)
        .withColumn(
            "containment_ppm",
            F.expr("CAST(n_common * 1000000 div n_sh AS BIGINT)"),
        )
        .filter(F.col("containment_ppm") >= CONTAIN_MIN_PPM)
    )
    uncapped = {
        (r.doc_a, r.doc_b): (r.n_common, r.containment_ppm)
        for r in full.collect()
    }
    assert uncapped == exact


def test_x68_groups_and_bounds(spark):
    """Both pair classes are present, the control-group size matches the
    even-id/successor construction, and all cosine stats are valid
    micro-unit values."""
    rows = {
        r.pair_class: r
        for r in QUERIES["x68_text_vector_consistency"].fn(spark, SF_DIR)
        .collect()
    }
    assert set(rows) == {"near_dup", "adjacent_control"}
    emb_ids = {
        r.vec_id
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id")
        .collect()
    }
    n_ctrl = sum(1 for v in emb_ids if v % 2 == 0 and v + 1 in emb_ids)
    assert rows["adjacent_control"].n_pairs == n_ctrl
    for r in rows.values():
        assert -1_000_000 <= r.min_cos_micro <= r.mean_cos_micro
        assert r.mean_cos_micro <= r.max_cos_micro <= 1_000_000


def test_x60b_drop_metrics_observable(spark):
    """The capped containment tier surfaces its drop metrics: with a
    tiny cap, oversized shingle keys are dropped AND reported through
    the Observation (the bucket_cap alerting contract); with the default
    cap on this fixture nothing drops and the metrics still resolve."""
    from pyspark.sql import Observation

    from dwh_etl_framework_spark.queries.wave6 import containment_capped

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    obs = Observation()
    out = containment_capped(docs, max_bucket_size=2, observation=obs)
    n_capped = out.count()
    m = obs.get
    assert m["dropped_buckets"] > 0
    assert m["dropped_rows"] > 0
    assert m["largest_bucket"] > 2

    obs2 = Observation()
    out2 = containment_capped(docs, observation=obs2)
    n_default = out2.count()
    m2 = obs2.get
    assert m2["dropped_buckets"] >= 0  # resolves even at zero drops
    assert n_capped <= n_default
