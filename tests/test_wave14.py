"""Wave-14: the composed cascade recall audit (x97).

The load-bearing claims:

1. **Pair completeness**: the audit output's pair set is EXACTLY the
   lossless prefix-join pair set (the left join adds a flag, never
   drops/duplicates a true pair — a broken join key would do both).
2. **Flag soundness**: ``lsh_recalled`` is true precisely for the true
   pairs that appear in the banding tier's candidate output — a false
   negative of the cascade must surface as ``false``, not vanish.
3. **Exact duplicates always recalled**: identical texts have identical
   minhash signatures, so every band collides — the flag cannot be
   false for a jaccard-1.0 pair.
4. The sampled twin composes the SAME universes: its exact half equals
   the prefix join under the sample predicate (threading the filter
   through both tiers is what keeps the x97s oracle honest).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dwh_etl_framework_spark.operators import dedup, setjoin
from dwh_etl_framework_spark.queries.wave14 import (
    x97_cascade_recall_audit,
    x97s_cascade_audit_sampled,
)

from conftest import SF_DIR


def _pairset(df):
    return {(r["doc_a"], r["doc_b"]) for r in df.collect()}


def test_audit_pairs_equal_exact_pairs_with_flag(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    audit = x97_cascade_recall_audit(spark, SF_DIR).localCheckpoint()
    exact = setjoin.prefix_filter_jaccard_pairs(
        docs, "text", "doc_id", n=3, threshold=0.5
    )
    assert _pairset(audit) == _pairset(exact)
    assert audit.count() == exact.count()  # no fan-out duplicates
    # flag soundness vs the banding tier run standalone
    sigs = dedup.minhash_signatures_portable(docs, "text", "doc_id", n=3, k=64)
    lsh = dedup.lsh_candidate_pairs(
        sigs, "doc_id", bands=16, rows_per_band=4, est_threshold=0.5,
        max_bucket_size=None,
    )
    lsh_pairs = _pairset(lsh)
    for r in audit.collect():
        assert r["lsh_recalled"] == ((r["doc_a"], r["doc_b"]) in lsh_pairs)


def test_exact_duplicates_always_recalled(spark):
    # three exact-dup clusters + unrelated filler: identical texts give
    # identical signatures, every band collides, the flag must be true.
    rows = []
    for c in range(3):
        text = f"cluster {c} body with enough words to shingle properly"
        rows += [(c * 10 + i, text) for i in range(2)]
    rows += [(100 + i, f"unrelated filler document number {i} "
              f"totally different content {i}") for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = (
        x97_audit_over(docs).filter(F.col("jaccard") >= 0.999).collect()
    )
    assert len(out) == 3
    assert all(r["lsh_recalled"] for r in out)


def x97_audit_over(docs):
    """The x97 composition over an arbitrary documents frame."""
    exact = setjoin.prefix_filter_jaccard_pairs(
        docs, "text", "doc_id", n=3, threshold=0.5
    )
    sigs = dedup.minhash_signatures_portable(docs, "text", "doc_id", n=3, k=64)
    recalled = dedup.lsh_candidate_pairs(
        sigs, "doc_id", bands=16, rows_per_band=4, est_threshold=0.5,
        max_bucket_size=None,
    ).select("doc_a", "doc_b", F.lit(True).alias("__hit"))
    return exact.join(recalled, ["doc_a", "doc_b"], "left").select(
        "doc_a", "doc_b", "jaccard",
        F.coalesce(F.col("__hit"), F.lit(False)).alias("lsh_recalled"),
    )


def test_sampled_twin_exact_half_matches_prefix_join(spark):
    from dwh_etl_framework_spark.queries.sf1_variants import _shingle_col_pred

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    twin = x97s_cascade_audit_sampled(spark, SF_DIR)
    exact = setjoin.prefix_filter_jaccard_pairs(
        docs, "text", "doc_id", n=3, threshold=0.5,
        shingle_filter=_shingle_col_pred(),
    )
    assert _pairset(twin) == _pairset(exact)
