"""Wave-13 operators: prefix-filter set-similarity join, exact-quota
tournament sampling, boilerplate mining.

The load-bearing claims:

1. **Losslessness** (x94): the prefix-filtered join returns EXACTLY the
   pair set of the naive Σ·df² self-join — on the fixture AND on a
   crafted corpus with a degenerate hot shingle shared by every doc
   (the case that breaks naive prefix heuristics: the hot shingle must
   sort LAST in every prefix order and still not cost a pair).
2. **Tournament exactness** (x95): two-round top-n == single-window
   top-n for any shard count, including shards > |stratum| and quota >
   |stratum|; determinism under repartitioning.
3. **Candidate-side frugality**: the prefix join's key set excludes the
   corpus-wide hottest shingle when thresholds allow, i.e. the filter
   actually prunes (not just correct but cheap).
4. Boilerplate report invariants: ≤ 5 rows per source, flag ⟺ ratio.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dwh_etl_framework_spark.operators import sampling, setjoin
from dwh_etl_framework_spark.operators.dedup import ngram_jaccard_pairs

from conftest import SF_DIR


def _pairs(df):
    return {
        (r["doc_a"], r["doc_b"], r["n_common"], r["n_a"], r["n_b"])
        for r in df.collect()
    }


def test_prefix_filter_matches_naive_on_fixture(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    fast = setjoin.prefix_filter_jaccard_pairs(
        docs, "text", "doc_id", n=3, threshold=0.5
    )
    naive = ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.5)
    assert _pairs(fast) == _pairs(naive) and fast.count() > 0


def test_prefix_filter_lossless_under_hot_shingle(spark):
    # every doc shares the 'common common common' shingle (df = N); the
    # near-dup pairs hide in otherwise-rare shingles. threshold sweep
    # catches off-by-one prefix lengths at several |d| parities.
    base = [
        "common common common alpha beta gamma delta",
        "common common common alpha beta gamma epsilon",
        "common common common zeta eta theta iota kappa",
        "common common common zeta eta theta iota lamda",
        "common common common solo tokens here only once",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(base * 3)], "doc_id long, text string"
    ).withColumn("text", F.concat("text", F.lit(" tail"), F.col("doc_id") % 3))
    for thr in (0.3, 0.5, 0.8):
        fast = setjoin.prefix_filter_jaccard_pairs(
            docs, "text", "doc_id", threshold=thr
        )
        naive = ngram_jaccard_pairs(docs, "text", "doc_id", threshold=thr)
        assert _pairs(fast) == _pairs(naive), f"threshold {thr}"


def test_prefix_filter_exact_duplicates_score_one(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "a b c d e f g"), (3, "h i j k l m n")],
        "doc_id long, text string",
    )
    out = setjoin.prefix_filter_jaccard_pairs(docs, "text", "doc_id").collect()
    assert len(out) == 1
    assert (out[0]["doc_a"], out[0]["doc_b"], out[0]["jaccard"]) == (1, 2, 1.0)


def test_prefix_cap_drops_hot_keys_but_keeps_contract_documented(spark):
    # max_prefix_df is the adversarial-corpus relief valve: with the cap
    # at 1 nothing can pair (every shared shingle has df >= 2) — the
    # documented recall trade, loud and predictable.
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e")], "doc_id long, text string"
    )
    assert (
        setjoin.prefix_filter_jaccard_pairs(
            docs, "text", "doc_id", max_prefix_df=1
        ).count()
        == 0
    )
    assert (
        setjoin.prefix_filter_jaccard_pairs(
            docs, "text", "doc_id", max_prefix_df=2
        ).count()
        == 1
    )


@pytest.mark.parametrize("n_shards", [1, 3, 16, 64])
def test_quota_tournament_equals_single_window(spark, n_shards):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = sampling.quota_sample(
        docs, ["source"], "doc_id", 7, n_shards=n_shards
    ).select("source", "doc_id", "rk")
    from pyspark.sql.window import Window

    h = F.md5(F.concat(F.lit("quota:"), F.col("doc_id").cast("string")))
    want = (
        docs.withColumn(
            "rk",
            F.row_number().over(Window.partitionBy("source").orderBy(h)),
        )
        .filter(F.col("rk") <= 7)
        .select("source", "doc_id", "rk")
    )
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in want.collect()}


def test_quota_exact_counts_and_small_strata(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = sampling.quota_sample(docs, ["source"], "doc_id", 10)
    per = {r["source"]: r["n"] for r in out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert all(n == 10 for n in per.values())
    # quota above the stratum size: keep the whole stratum, exactly once
    tiny = docs.filter(F.col("doc_id") < 7)
    kept = sampling.quota_sample(tiny, ["source"], "doc_id", 1000)
    assert kept.count() == tiny.count()
    assert kept.select("doc_id").distinct().count() == tiny.count()


def test_quota_stable_under_repartition(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = sampling.quota_sample(docs, ["source"], "doc_id", 5)
    b = sampling.quota_sample(docs.repartition(13), ["source"], "doc_id", 5)
    assert {tuple(r) for r in a.select("source", "doc_id", "rk").collect()} == {
        tuple(r) for r in b.select("source", "doc_id", "rk").collect()
    }


def test_quota_bottom_k_growth_property(spark):
    """Adding rows only displaces survivors from the top rank down —
    survivors of the grown corpus that existed before were survivors
    before (no resurrection), the bottom-k sketch property."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    half = docs.filter(F.col("doc_id") % 2 == 0)
    s_half = {
        (r["source"], r["doc_id"])
        for r in sampling.quota_sample(half, ["source"], "doc_id", 5).collect()
    }
    s_full = {
        (r["source"], r["doc_id"])
        for r in sampling.quota_sample(docs, ["source"], "doc_id", 5).collect()
    }
    # any full-corpus survivor that lives in the half corpus must have
    # been a half-corpus survivor too
    assert all(
        key in s_half for key in s_full if key[1] % 2 == 0
    )


def test_boilerplate_report_invariants(spark):
    from dwh_etl_framework_spark.queries.wave13 import x96_boilerplate_ngrams

    out = x96_boilerplate_ngrams(spark, SF_DIR).collect()
    by_source: dict = {}
    for r in out:
        by_source.setdefault(r["source"], []).append(r)
    for rows in by_source.values():
        assert len(rows) <= 5
        assert sorted(r["rk"] for r in rows) == list(range(1, len(rows) + 1))
        for r in rows:
            assert r["is_boilerplate"] == (r["df_ratio"] >= 0.1)
            assert 0 < r["df"] <= r["n_docs"]


# ---- cost-based verify exchange (round-9 NOTES item: replace the static
# 2×parallelism heuristic with pairs×set-size work sizing) ---------------


def test_verify_partitions_cost_model():
    # zero candidates → floor at 2×parallelism (never less parallel than
    # the tuned r9 shape)
    assert setjoin._verify_partitions(0.0, 0.0, 32) == 64
    # sf0.1-shaped load: 409k pairs × avg 100 shingles ≈ 82M comparisons
    # → by-cost 41 < floor 64, so the measured-good width is kept
    assert setjoin._verify_partitions(409_000, 100.0, 32) == 64
    # sf1-shaped load: 4.09M pairs → 818M work / 2M budget = 409 tasks,
    # i.e. the exchange now scales with work instead of staying at 64
    assert setjoin._verify_partitions(4_090_000, 100.0, 32) == 409
    # monotone in pairs and in set size
    a = setjoin._verify_partitions(1e6, 100.0, 32)
    assert setjoin._verify_partitions(2e6, 100.0, 32) >= a
    assert setjoin._verify_partitions(1e6, 200.0, 32) >= a
    # capped: a pathological estimate cannot demand a million tasks
    assert setjoin._verify_partitions(1e12, 1e4, 32) == 32768


def test_verify_partitions_budget_is_ceil_division():
    # exactly one budget of work → 1 task by cost (floor still wins);
    # one comparison over → 2 by cost
    assert setjoin._verify_partitions(1.0, 1_000_000.0, 1, budget=2_000_000) == 2
    p = setjoin._verify_partitions(1.5, 1_000_000.0, 1, budget=2_000_000)
    assert p == 2  # ceil(3M/2M) = 2 == floor — boundary consistent
