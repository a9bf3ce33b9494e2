"""Round-5 items: fraction-of-corpus bucket cap (NOTES r4 weakness #4) and
the fixed-point r16 money sums (1-ULP decimal→double divergence at sf1)."""

from __future__ import annotations

import pytest
from pyspark.sql import Observation

from dwh_etl_framework_spark.operators.bucket_cap import cap_bucket_size


def _buckets(spark, big=200, small=5):
    rows = [(i, "hot") for i in range(big)]
    rows += [(1000 + i, f"cold_{i % 3}") for i in range(small * 3)]
    return spark.createDataFrame(rows, "doc_id long, bucket string")


def test_fractional_cap_drops_relative_degenerates(spark):
    """At fraction=0.1 of a 215-row input (cap=21) the 200-row bucket is
    dropped, the 5-row buckets survive, and the drop is observable."""
    df = _buckets(spark)
    obs = Observation("frac_cap")
    kept = cap_bucket_size(
        df, ["bucket"], max_bucket_fraction=0.1, observation=obs
    ).collect()
    assert {r.bucket for r in kept} == {"cold_0", "cold_1", "cold_2"}
    assert obs.get["dropped_buckets"] == 1
    assert obs.get["dropped_rows"] == 200
    assert obs.get["largest_bucket"] == 200


def test_fractional_cap_floor_protects_small_corpora(spark):
    """min_bucket_cap floors the threshold: 0.001 of 215 rows would be cap
    0, but the floor (16) keeps every sub-16 bucket."""
    df = _buckets(spark)
    kept = cap_bucket_size(
        df, ["bucket"], max_bucket_fraction=0.001, min_bucket_cap=16
    )
    assert {r.bucket for r in kept.collect()} == {"cold_0", "cold_1", "cold_2"}


def test_fractional_cap_scales_with_corpus(spark):
    """The same fraction that drops the hot bucket in a small corpus keeps
    it once the corpus grows around it — the self-tuning property a fixed
    5000 lacks."""
    small = _buckets(spark, big=200, small=5)
    grown = small.union(
        spark.range(10_000).selectExpr(
            "id + 5000 AS doc_id", "concat('pad_', id) AS bucket"
        )
    )
    frac = 0.1  # cap: 21 rows at n=215 -> drops; 1021 rows at n=10215 -> keeps
    assert not any(
        r.bucket == "hot"
        for r in cap_bucket_size(small, ["bucket"], max_bucket_fraction=frac)
        .select("bucket").distinct().collect()
    )
    assert any(
        r.bucket == "hot"
        for r in cap_bucket_size(grown, ["bucket"], max_bucket_fraction=frac)
        .select("bucket").distinct().collect()
    )


def test_cap_param_validation(spark):
    df = _buckets(spark)
    with pytest.raises(ValueError, match="exactly one"):
        cap_bucket_size(df, ["bucket"])
    with pytest.raises(ValueError, match="exactly one"):
        cap_bucket_size(
            df, ["bucket"], max_bucket_size=10, max_bucket_fraction=0.1
        )
    with pytest.raises(ValueError, match="fraction"):
        cap_bucket_size(df, ["bucket"], max_bucket_fraction=1.5)


def test_r16_money_sums_are_fixed_point(spark):
    """The flagship pricing summary must emit BIGINT fixed-point money sums
    (decimal→double is not engine-exact past 2^53) — schema regression."""
    from dwh_etl_framework_spark.queries import QUERIES

    df = QUERIES["r16_agg_pricing_summary"].fn(spark, "/root/testdata/sf0.001")
    dt = dict(df.dtypes)
    for col in ("sum_qty_fp", "sum_base_price_fp", "sum_disc_price_fp",
                "sum_charge_fp"):
        assert dt[col] == "bigint", (col, dt[col])


def test_lsh_cross_finds_only_corpus_batch_pairs(spark):
    """Incremental LSH must surface corpus×batch near-dups and NEVER
    batch×batch ones (the increment screens against the index only)."""
    from dwh_etl_framework_spark.operators import dedup

    base = " ".join(f"w{i}" for i in range(40))
    twin = " ".join(f"w{i}" for i in range(39)) + " zz"
    corpus = spark.createDataFrame(
        [(0, base)] + [(i, f"unique text number {i} " * 10) for i in range(1, 6)],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(100, twin), (101, "dup pair body " * 15), (102, "dup pair body " * 15)],
        "doc_id long, text string",
    )
    sig_c = dedup.minhash_signatures_portable(corpus, "text", "doc_id", n=3, k=64)
    sig_b = dedup.minhash_signatures_portable(batch, "text", "doc_id", n=3, k=64)
    pairs = dedup.lsh_candidate_pairs_cross(
        sig_c, sig_b, "doc_id", est_threshold=0.5
    ).collect()
    assert (0, 100) in {(r.doc_corpus, r.doc_batch) for r in pairs}
    # 101/102 are identical to each other but alien to the corpus: the
    # cross join must not emit them on either side
    assert all(r.doc_batch not in (101, 102) or r.doc_corpus not in (101, 102)
               for r in pairs)
    assert not any(r.doc_corpus in (101, 102) for r in pairs)


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_x44_single_exchange(spark):
    """Sequence packing must plan exactly one wide exchange (the source
    key); a second exchange would mean the window and the projects are
    not sharing the partitioning."""
    from conftest import SF_DIR
    from dwh_etl_framework_spark.queries import QUERIES

    plan = _physical_plan(QUERIES["x44_sequence_pack"].fn(spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_x46_vocab_broadcasts(spark):
    """The per-language vocabulary probe must be a broadcast join — a
    shuffled join here would re-exchange every exploded token row."""
    from conftest import SF_DIR
    from dwh_etl_framework_spark.queries import QUERIES

    plan = _physical_plan(
        QUERIES["x46_lang_vocab_confidence"].fn(spark, SF_DIR)
    )
    assert "BroadcastHashJoin" in plan, plan


def test_x49_centroid_and_mean_broadcast(spark):
    """Both x49 join-backs (centroid table, per-label means) are
    dimension-sized and must broadcast."""
    from conftest import SF_DIR
    from dwh_etl_framework_spark.queries import QUERIES

    from dwh_etl_framework_spark.queries.event_features import (
        x49_embedding_outliers,
    )

    # The production plan cuts lineage at `dist` (the x65 rule), which
    # hides the upstream centroid join inside a Scan ExistingRDD — so the
    # two-broadcast assertion runs against the uncut plan, and the cut
    # itself is asserted on the production plan separately.
    full = _physical_plan(x49_embedding_outliers(spark, SF_DIR, lineage_cut=False))
    assert full.count("BroadcastHashJoin") >= 2, full
    prod = _physical_plan(QUERIES["x49_embedding_outliers"].fn(spark, SF_DIR))
    assert "Scan ExistingRDD" in prod and "BroadcastHashJoin" in prod, prod


def test_x44_packing_invariants(spark):
    """Structural invariants of concat-and-cut packing, independent of the
    oracle: offsets live inside the budget, pack ids are monotone within a
    source stream, the running sum reconstructs, and the straddle flag is
    exactly the offset+length overflow condition."""
    from conftest import SF_DIR
    from dwh_etl_framework_spark.queries import QUERIES
    from dwh_etl_framework_spark.queries.packing_vocab import PACK_TOKENS

    rows = QUERIES["x44_sequence_pack"].fn(spark, SF_DIR).collect()
    by_source: dict[str, list] = {}
    for r in rows:
        assert 0 <= r.pack_offset < PACK_TOKENS
        assert r.spans_packs == (r.pack_offset + r.n_tokens > PACK_TOKENS)
        by_source.setdefault(r.source, []).append(r)
    for docs in by_source.values():
        docs.sort(key=lambda r: r.doc_id)
        cum = 0
        last_pack = 0
        for r in docs:
            assert r.pack_id == cum // PACK_TOKENS
            assert r.pack_offset == cum % PACK_TOKENS
            assert r.pack_id >= last_pack
            last_pack = r.pack_id
            cum += r.n_tokens


def test_x47_session_invariants(spark):
    """Sessions per user are disjoint, ordered, and separated by more than
    the gap; event counts are conserved."""
    from conftest import SF_DIR, load_events
    from dwh_etl_framework_spark.queries import QUERIES
    from dwh_etl_framework_spark.queries.event_features import SESSION_GAP_S

    rows = QUERIES["x47_sessionize"].fn(spark, SF_DIR).collect()
    per_user: dict[int, list] = {}
    for r in rows:
        assert r.duration_s == r.end_s - r.start_s >= 0
        assert 1 <= r.n_events
        assert 0 <= r.n_purchases <= r.n_events
        per_user.setdefault(r.user_id, []).append(r)
    for sess in per_user.values():
        sess.sort(key=lambda r: r.session_seq)
        assert [s.session_seq for s in sess] == list(
            range(1, len(sess) + 1)
        )
        for prev, nxt in zip(sess, sess[1:]):
            assert nxt.start_s - prev.end_s > SESSION_GAP_S
    n_total = sum(r.n_events for r in rows)
    assert n_total == load_events(spark).count()


def test_x50_partition_and_flag_consistency(spark):
    """The batch slice is screened completely: every batch doc appears
    exactly once, kept == not(dup_exact or dup_near), and batch+corpus
    partition the corpus."""
    from conftest import SF_DIR
    from dwh_etl_framework_spark.queries import QUERIES

    rows = QUERIES["x50_incremental_dedup"].fn(spark, SF_DIR).collect()
    ids = [r.doc_id for r in rows]
    assert len(ids) == len(set(ids))
    for r in rows:
        assert r.kept == (not r.dup_exact and not r.dup_near)
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert 0 < len(ids) < n_docs
