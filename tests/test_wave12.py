"""Round-7 wave-12 semantics tests: time-sliced drift, novelty, the
reconciliation checksum, and column profiling."""

from __future__ import annotations

from conftest import SF_DIR

from pyspark.sql import functions as F

from dwh_etl_framework_spark.queries import QUERIES
from dwh_etl_framework_spark.queries.registry import fixtures


def test_f30_fingerprint_is_partition_mergeable(spark):
    """The reconciliation contract: fingerprints computed on disjoint
    slices MERGE (XOR of XORs, sum of sums) to the whole-table
    fingerprint — what lets two systems compare without co-partitioning."""
    whole = {
        r["o_orderstatus"]: r
        for r in QUERIES["f30_table_checksum"].fn(spark, SF_DIR).collect()
    }
    t = fixtures(spark, SF_DIR)
    from dwh_etl_framework_spark.queries.wave12 import table_checksum

    # slice by orderkey parity and fingerprint each slice independently
    merged: dict = {}
    for i in range(2):
        part = t.orders.filter(F.col("o_orderkey") % 2 == i)
        for r in table_checksum(part).collect():
            m = merged.setdefault(
                r["o_orderstatus"], {"n": 0, "xor": 0, "sum": 0}
            )
            m["n"] += r["n_rows"]
            m["xor"] ^= r["xor_fp"]
            m["sum"] += int(r["sum_fp"])
    assert set(merged) == set(whole)
    for st, m in merged.items():
        assert m["n"] == whole[st]["n_rows"], st
        assert m["xor"] == whole[st]["xor_fp"], st
        assert m["sum"] == int(whole[st]["sum_fp"]), st


def test_f30_detects_single_row_mutation(spark):
    """A one-cent change in one row must flip the fingerprint (both the
    XOR and the sum) — the property that makes it a reconciliation check."""
    t = fixtures(spark, SF_DIR)
    from dwh_etl_framework_spark.queries.wave12 import table_checksum

    base = {
        r["o_orderstatus"]: (r["xor_fp"], r["sum_fp"])
        for r in table_checksum(t.orders).collect()
    }
    mutated = t.orders.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") == 1, F.col("o_totalprice") + 0.01)
        .otherwise(F.col("o_totalprice")),
    )
    mut = {
        r["o_orderstatus"]: (r["xor_fp"], r["sum_fp"])
        for r in table_checksum(mutated).collect()
    }
    changed = [st for st in base if base[st] != mut[st]]
    assert len(changed) == 1  # exactly the mutated row's status group
    st = changed[0]
    assert base[st][0] != mut[st][0]  # XOR flips
    assert base[st][1] != mut[st][1]  # sum flips


def test_x91_profile_null_handling(spark):
    """Nulls: counted in n_nulls, excluded from distinct and min/max."""
    t = fixtures(spark, SF_DIR)
    from dwh_etl_framework_spark.queries.wave12 import column_profile

    with_nulls = t.orders.withColumn(
        "o_orderpriority",
        F.when(F.col("o_orderkey") % 10 == 0, F.lit(None)).otherwise(
            F.col("o_orderpriority")
        ),
    )
    prof = {
        r["col_name"]: r for r in column_profile(with_nulls).collect()
    }
    n_total = t.orders.count()
    n_nulled = with_nulls.filter(F.col("o_orderpriority").isNull()).count()
    p = prof["o_orderpriority"]
    assert p["n_rows"] == n_total
    assert p["n_nulls"] == n_nulled > 0
    assert p["min_val"] is not None  # min/max ignore nulls
    # untouched numeric column: zero-padded min/max equals numeric min/max
    k = prof["o_orderkey"]
    assert int(k["min_val"]) == t.orders.agg(F.min("o_orderkey")).first()[0]
    assert int(k["max_val"]) == t.orders.agg(F.max("o_orderkey")).first()[0]


def test_x92_first_month_is_all_new(spark):
    """Every source's chronologically first month has novelty exactly
    1e6 ppm (every token is a first appearance), and novelty is a valid
    ppm everywhere."""
    rows = QUERIES["x92_vocab_novelty"].fn(spark, SF_DIR).collect()
    assert rows
    by_source: dict = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    for source, rs in by_source.items():
        first = min(rs, key=lambda r: r["month"])
        assert first["n_new_tokens"] == first["n_distinct_tokens"], source
        assert first["novelty_ppm"] == 1_000_000, source
        for r in rs:
            assert 0 <= r["novelty_ppm"] <= 1_000_000
            assert r["n_new_tokens"] <= r["n_distinct_tokens"]


def test_x89_tv_is_valid_ppm_and_covers_months(spark):
    """TV distance is a valid ppm in [0, 1e6]; the pseudo-date axis
    produces all 12 months for every source present in every month."""
    rows = QUERIES["x89_drift_timeline"].fn(spark, SF_DIR).collect()
    assert rows
    months = {r["month"] for r in rows}
    assert months == {f"2024-{m:02d}" for m in range(1, 13)}
    for r in rows:
        assert 0 <= r["tv_ppm"] <= 1_000_000, r
        assert r["n_tokens"] > 0


def test_x93_changepoint_semantics(spark):
    """Month-over-month TV: pairs cover indices 1..11 per source, values
    are valid ppm, and the spike flag is exactly the 1.5x-mean rule."""
    rows = QUERIES["x93_drift_changepoint"].fn(spark, SF_DIR).collect()
    assert rows
    by_source: dict = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    for source, rs in by_source.items():
        assert sorted(r["month_idx"] for r in rs) == list(range(1, 12)), source
        mean = sum(r["mom_tv_ppm"] for r in rs) / len(rs)
        for r in rs:
            assert 0 <= r["mom_tv_ppm"] <= 1_000_000
            assert r["is_spike"] == (r["mom_tv_ppm"] > 1.5 * mean), (source, r)
