"""Plan-shape and property tests for the wave-7 operators (x69–x73).

The value-level checks live in the oracle parity suite; these pin the
*scale* properties — broadcasts where a shuffle would be wrong, the
map-only bloom probe, window-partition counts — and the operator-level
invariants no SQL oracle can express (bloom false-negative freedom at
the filter itself, permutation totality of the epoch shuffle).
"""

from __future__ import annotations

from conftest import SF_DIR

from pyspark.sql import functions as F

from dwh_etl_framework_spark.queries import QUERIES


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_x69_bm25_plan_shape(spark):
    """The idf and corpus-stat tables must broadcast (shuffling the token
    table against a 3-row dimension would be absurd at 100 TB), and the
    global top-50 must lower to TakeOrderedAndProject — never a
    single-partition global sort of every scored doc."""
    plan = _physical_plan(QUERIES["x69_bm25_topk"].fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_x70_robust_scale_plan_and_medians(spark):
    """Median/MAD join-backs are |sources|-row tables and must broadcast;
    and the window-sort median must agree with Spark's own percentile
    aggregate (the memory-unsafe exact formulation we deliberately avoid
    in the operator)."""
    from dwh_etl_framework_spark.queries.wave7 import x70_robust_scale

    # production plan lineage-cuts `dev` (the x65 rule), hiding the first
    # broadcast inside a Scan ExistingRDD — assert both broadcasts on the
    # uncut plan and the cut itself on the production plan.
    full = _physical_plan(x70_robust_scale(spark, SF_DIR, lineage_cut=False))
    assert full.count("BroadcastHashJoin") >= 2, full
    df = QUERIES["x70_robust_scale"].fn(spark, SF_DIR)
    plan = _physical_plan(df)
    assert "Scan ExistingRDD" in plan and "BroadcastHashJoin" in plan, plan

    got = {
        (r["source"]): (r["med"], r["mad"])
        for r in df.select("source", "med", "mad").distinct().collect()
    }
    ref = {
        r["source"]: r["med"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .groupBy("source")
        .agg(F.expr("percentile(n_chars, 0.5)").alias("med"))
        .collect()
    }
    for src, med in ref.items():
        assert got[src][0] == med, (src, got[src], med)


def test_x71_gini_bounds_and_exchanges(spark):
    """Gini lands in [0, 1e6); the plan needs exactly two wide exchanges
    — the (type,user) count and the type-keyed window, whose partitioning
    the final agg must reuse."""
    df = QUERIES["x71_key_skew_profile"].fn(spark, SF_DIR)
    plan = _physical_plan(df)
    assert plan.count("Exchange hashpartitioning") == 2, plan
    for r in df.collect():
        assert 0 <= r["gini_ppm"] < 1_000_000, r
        assert 0 < r["top_share_ppm"] <= 1_000_000, r
        assert r["n_users"] <= r["n_events"], r


def test_x72_bloom_no_false_negatives_and_maponly_probe(spark):
    """Every order whose customer IS in the build set must survive the
    bloom prefilter (false-negative freedom at the filter itself, not
    just after the exact join), the filter must discard some
    non-matching orders (it does real work), and the probe must be a
    scan-level Filter — no join or exchange before the prefilter."""
    from dwh_etl_framework_spark.queries.wave7 import (
        x72_bloom_prefilter_join,
    )

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("k")
    )
    truth = orders.join(building, orders.o_custkey == F.col("k"), "left_semi")

    result = x72_bloom_prefilter_join(spark, SF_DIR)
    # end-to-end row conservation: the post-join agg must count exactly
    # the true matches
    assert result.agg(F.sum("n_orders")).collect()[0][0] == truth.count()

    plan = _physical_plan(result)
    # the probe is expression-only: the first join in the plan is the
    # exact broadcast join AFTER the filter; there is no shuffle join
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") == 2, plan


def test_x73_epoch_shuffle_is_permutation(spark):
    """Each epoch's (shard, pos) assignment is a total, duplicate-free
    cover of the corpus, positions are dense 1..n per shard, and the two
    epochs produce different orders (the whole point of reshuffling)."""
    df = QUERIES["x73_epoch_shuffle"].fn(spark, SF_DIR).cache()
    try:
        n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
        per_epoch = df.groupBy("epoch").count().collect()
        assert {r["count"] for r in per_epoch} == {n_docs}

        dense = (
            df.groupBy("epoch", "shard")
            .agg(F.count(F.lit(1)).alias("n"), F.max("pos").alias("mx"),
                 F.countDistinct("pos").alias("nd"))
            .filter((F.col("mx") != F.col("n")) | (F.col("nd") != F.col("n")))
        )
        assert dense.count() == 0

        # epochs disagree: same doc, different shard or pos for most docs
        e0 = df.filter(F.col("epoch") == 0).select(
            "doc_id", F.col("shard").alias("s0"), F.col("pos").alias("p0")
        )
        e1 = df.filter(F.col("epoch") == 1).select(
            "doc_id", F.col("shard").alias("s1"), F.col("pos").alias("p1")
        )
        same = (
            e0.join(e1, "doc_id")
            .filter((F.col("s0") == F.col("s1")) & (F.col("p0") == F.col("p1")))
            .count()
        )
        assert same < n_docs / 2, same
    finally:
        df.unpersist()


def test_x77_pagerank_mass_and_floor(spark):
    """Rank mass stays within integer-floor loss of the ppb scale, every
    node holds at least the teleport floor, and nodes with no in-edges
    hold exactly the floor."""
    from dwh_etl_framework_spark.queries.wave8 import PR_SCALE

    df = QUERIES["x77_knn_pagerank"].fn(spark, SF_DIR)
    rows = df.collect()
    n = len(rows)
    floor = (PR_SCALE * 3 // 20) // n
    total = sum(r["rank_ppb"] for r in rows)
    # each iteration loses < 1 ppb per node per integer division (2 divs)
    assert PR_SCALE - 12 * n <= total <= PR_SCALE, (total, n)
    assert all(r["rank_ppb"] >= floor for r in rows)

    edges = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    # plan sanity: the iterative loop is checkpoint-cut (no edge-subtree
    # growth) and rank joins broadcast
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in plan, plan


def test_x78_spike_flag_consistency(spark):
    """is_spike must equal the cross-multiplied definition row by row,
    n_prev is bounded by the lookback, and the first hour of every type
    (no trailing data) is never a spike."""
    from dwh_etl_framework_spark.queries.wave8 import ANOMALY_LOOKBACK, SPIKE_FACTOR

    rows = QUERIES["x78_event_anomaly"].fn(spark, SF_DIR).collect()
    firsts = {}
    for r in sorted(rows, key=lambda r: (r.event_type, r.hour_bucket)):
        assert 0 <= r.n_prev <= ANOMALY_LOOKBACK
        expect = r.n_prev > 0 and r.n_events * r.n_prev > SPIKE_FACTOR * r.sum_prev
        assert r.is_spike == expect, r
        if r.event_type not in firsts:
            firsts[r.event_type] = r
            assert r.n_prev == 0 and not r.is_spike


def test_group_median_even_count(spark):
    """Even-sized groups must average the two middles — the (cnt+1)/2
    double spelling silently picked only the upper middle (sf1-sweep
    catch, round 6: sources hold 2500 docs at sf1, odd 25 at sf0.01)."""
    from dwh_etl_framework_spark.queries.wave7 import group_median

    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 30.0), ("a", 4, 44.0),
         ("b", 5, 7.0), ("b", 6, 9.0), ("b", 7, 100.0)],
        "source string, doc_id long, v double",
    )
    got = {r["source"]: r["m"] for r in group_median(df, "v", "m").collect()}
    assert got == {"a": 25.0, "b": 9.0}, got


def test_x80_mg_superset_guarantee(spark):
    """The MG candidate set must contain every key with global frequency
    > n/k even at an adversarially small counter budget, and the final
    answer must be identical at tiny and default budgets (the sketch only
    bounds candidates; the verify pass decides)."""
    from dwh_etl_framework_spark.operators.sketch import (
        heavy_hitters_exact,
        mg_candidates,
    )

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n = events.count()
    k = 8
    exact = {
        r["user_id"]: r["cnt"]
        for r in events.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    must_catch = {u for u, c in exact.items() if c * k > n}
    cands = {r["user_id"] for r in mg_candidates(events, "user_id", k=k).collect()}
    assert must_catch <= cands, must_catch - cands
    # candidate volume is bounded by partitions·k
    n_parts = events.rdd.getNumPartitions()
    assert len(cands) <= n_parts * k

    small = sorted(map(tuple, heavy_hitters_exact(events, "user_id", k=64).collect()))
    big = sorted(map(tuple, heavy_hitters_exact(events, "user_id").collect()))
    assert small == big and len(big) > 0


def test_f27_bucketed_join_is_exchange_free(spark):
    """Both join sides are bucketed on the key, so the forced
    SortMergeJoin plans with NO exchange under it — the only wide
    exchange in the whole plan is the final mktsegment aggregate. (The
    in-partition Sorts are local: Spark re-sorts when a bucket spans
    multiple files; no data crosses the network for them.)"""
    df = QUERIES["f27_bucketed_join"].fn(spark, SF_DIR)
    plan = _physical_plan(df)
    assert "SortMergeJoin" in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
