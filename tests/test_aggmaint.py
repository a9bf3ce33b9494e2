"""operators/aggmaint.py — algebraic-aggregate maintenance invariants.

The oracle for f24 already proves combine(partial(base), partial(delta))
≡ aggregate(full) on the fixture split; these tests pin the operator's
algebra directly: arbitrary splits, multi-increment chains, new-key
appearance, and the error contract for non-algebraic kinds.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dwh_etl_framework_spark.operators.aggmaint import (
    combine_partial_aggregates,
    partial_aggregate,
)

from conftest import SF_DIR

MEASURES = {
    "n": ("count", "doc_id"),
    "s": ("sum", "n_chars"),
    "lo": ("min", "n_chars"),
    "hi": ("max", "n_chars"),
}


def _rows(df):
    return sorted(
        tuple(r) for r in df.select("source", "n", "s", "lo", "hi").collect()
    )


def test_combine_equals_full_recompute_any_split(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    full = partial_aggregate(docs, ["source"], MEASURES)
    for cut in (1, 100, 333):
        base = docs.filter(F.col("doc_id") < cut)
        delta = docs.filter(F.col("doc_id") >= cut)
        merged = combine_partial_aggregates(
            partial_aggregate(base, ["source"], MEASURES),
            partial_aggregate(delta, ["source"], MEASURES),
            ["source"],
            MEASURES,
        )
        assert _rows(merged) == _rows(full), f"split at {cut} diverged"


def test_multi_increment_chain_and_new_keys(spark):
    """Three successive increments fold to the full aggregate, and a key
    that appears only in a later increment materializes correctly."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    full = partial_aggregate(docs, ["source"], MEASURES)
    state = partial_aggregate(
        docs.filter(F.col("doc_id") < 100), ["source"], MEASURES
    )
    for lo, hi in ((100, 250), (250, 400), (400, 10**9)):
        inc = docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        )
        state = combine_partial_aggregates(
            state,
            partial_aggregate(inc, ["source"], MEASURES),
            ["source"],
            MEASURES,
        ).localCheckpoint()
    assert _rows(state) == _rows(full)
    # a brand-new key arriving only in a delta must appear in the result
    extra = spark.createDataFrame(
        [(99999, "brand_new_source", 42)], "doc_id long, source string, n_chars long"
    )
    out = combine_partial_aggregates(
        state,
        partial_aggregate(extra, ["source"], MEASURES),
        ["source"],
        MEASURES,
    )
    row = out.filter(F.col("source") == "brand_new_source").collect()
    assert len(row) == 1 and row[0].n == 1 and row[0].s == 42


def test_non_algebraic_kind_rejected(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    with pytest.raises(ValueError, match="non-algebraic"):
        partial_aggregate(docs, ["source"], {"a": ("avg", "n_chars")})
