"""Dedup cascade (X1): MinHash-LSH recall against exact Jaccard pairs,

SimHash sanity, shingle construction."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from dwh_etl_framework_spark.operators import dedup

from conftest import SF_DIR


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_word_shingles(spark):
    df = spark.createDataFrame(
        [Row(id=1, text="a b c d"), Row(id=2, text="a b"), Row(id=3, text="x")]
    )
    got = {
        r.id: sorted(r.sh)
        for r in df.select("id", dedup.word_shingles(F.col("text"), 3).alias("sh")).collect()
    }
    assert got == {1: ["a b c", "b c d"], 2: [], 3: []}


def test_exact_dedup_survivor_is_min_id(spark):
    df = spark.createDataFrame(
        [Row(doc_id=5, text="same"), Row(doc_id=2, text="same"), Row(doc_id=9, text="other")]
    )
    got = {r.text: (r.doc_id, r.n_copies)
           for r in dedup.exact_dedup(df, "text", "doc_id").collect()}
    assert got == {"same": (2, 2), "other": (9, 1)}


def test_minhash_lsh_recall_vs_exact(spark, documents):
    """Every exact pair with J ≥ 0.8 must be discovered by LSH banding

    (16 bands × 4 rows ⇒ P(miss at 0.8) = (1-0.8^4)^16 ≈ 0.008 per pair;
    the fixture's near-dups are J ≈ 0.95+, P(miss) ≈ 1e-9)."""
    exact = {
        (r.doc_a, r.doc_b)
        for r in dedup.ngram_jaccard_pairs(documents, "text", "doc_id",
                                           threshold=0.8).collect()
    }
    assert exact, "fixture should contain near-duplicate documents"
    sigs = dedup.minhash_signatures(documents, "text", "doc_id", k=64)
    lsh = {
        (r.doc_a, r.doc_b)
        for r in dedup.lsh_candidate_pairs(sigs, "doc_id", bands=16,
                                           rows_per_band=4,
                                           est_threshold=0.5).collect()
    }
    missed = exact - lsh
    assert not missed, f"LSH missed {len(missed)}/{len(exact)} exact pairs: {sorted(missed)[:5]}"


def test_minhash_estimate_tracks_jaccard(spark, documents):
    """For discovered pairs, |est - exact| should be small (k=64 ⇒ σ≈0.06)."""
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(documents, "text", "doc_id",
                                           threshold=0.8).collect()
    }
    sigs = dedup.minhash_signatures(documents, "text", "doc_id", k=64)
    est = {
        (r.doc_a, r.doc_b): r.est_jaccard
        for r in dedup.lsh_candidate_pairs(sigs, "doc_id",
                                           est_threshold=0.5).collect()
    }
    diffs = [abs(est[p] - exact[p]) for p in exact if p in est]
    assert diffs and max(diffs) < 0.25


def test_cross_lsh_inputs_materialized_flag_is_value_neutral(spark, documents):
    """``inputs_materialized=True`` (round-15: callers that split one
    checkpointed signature table skip the operator's per-side
    re-checkpoints) must yield the exact same pair set and estimates as
    the default defensive path — the flag moves WHEN jobs run, never
    what they compute."""
    pfx = F.substring(
        F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 2
    )
    sig_all = dedup.minhash_signatures(
        documents, "text", "doc_id", k=64
    ).localCheckpoint(eager=True)
    sig_c = sig_all.filter(pfx < "cc")
    sig_b = sig_all.filter(pfx >= "cc")
    got = {}
    for flag in (False, True):
        got[flag] = sorted(
            (r.doc_corpus, r.doc_batch, r.est_jaccard)
            for r in dedup.lsh_candidate_pairs_cross(
                sig_c, sig_b, "doc_id", est_threshold=0.5,
                inputs_materialized=flag,
            ).collect()
        )
    assert got[True] == got[False]


def test_simhash_identical_and_disjoint(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha beta gamma delta epsilon zeta"),
            Row(doc_id=2, text="alpha beta gamma delta epsilon zeta"),
            Row(doc_id=3, text="one two three four five six seven"),
        ]
    )
    fp = dedup.simhash(df, "text", "doc_id")
    vals = {r.doc_id: r.simhash for r in fp.collect()}
    assert vals[1] == vals[2]
    assert vals[1] != vals[3]
    pairs = {(r.doc_a, r.doc_b): r.hamming
             for r in dedup.simhash_pairs(fp, "doc_id", max_hamming=3).collect()}
    assert pairs.get((1, 2)) == 0
    assert (1, 3) not in pairs


def test_cascade_pairs_match_exact_jaccard(spark, documents):
    """Every cascade pair must appear in the full-corpus exact result with an
    IDENTICAL jaccard value (the cascade changes the plan, never a surviving
    pair's similarity), and high-similarity pairs must not be lost to the
    LSH tier."""
    exact = {
        (r.doc_a, r.doc_b): (r.n_common, r.n_a, r.n_b, r.jaccard)
        for r in dedup.ngram_jaccard_pairs(
            documents, "text", "doc_id", threshold=0.5
        ).collect()
    }
    cascade = {
        (r.doc_a, r.doc_b): (r.n_common, r.n_a, r.n_b, r.jaccard)
        for r in dedup.lsh_jaccard_cascade(
            documents, "text", "doc_id", threshold=0.5
        ).collect()
    }
    assert cascade, "cascade should find the fixture's planted near-dups"
    for pair, vals in cascade.items():
        assert pair in exact, f"cascade invented pair {pair}"
        assert vals == exact[pair], f"{pair}: cascade {vals} != exact {exact[pair]}"
    # recall bound at J>=0.8: P(band miss) = (1-s^4)^16 ≈ 0.008 per pair
    strong = {p for p, v in exact.items() if v[3] >= 0.8}
    missed = strong - set(cascade)
    assert not missed, f"cascade lost strong pairs: {sorted(missed)[:5]}"
