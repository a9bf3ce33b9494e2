"""Skew evidence for the merge path (VERDICT r2 item 10).

Three layers of proof that a deliberately hot PK does not break or
serialize the engine:

1. **Correctness under skew**: ``merge_delta`` with a journal where one PK
   holds half of all rows still produces exactly one latest row per PK.
2. **The window stage's built-in mitigation**: Spark 4 rewrites the
   rank<=1 filter of ``latest_per_key`` into ``WindowGroupLimit``, which
   prunes each map partition to its local top-1 per PK BEFORE the
   shuffle — the hot PK ships ~one row per upstream partition, not its
   full version history. We assert the node is in the plan so a
   regression (e.g. a rewrite-blocking expression) is caught.
3. **AQE skew-join**: on the join shape, adaptive execution splits a
   skewed shuffle partition at runtime (``skew=true`` in the final plan);
   and ``salted_join`` pre-balances the same hot key across salt buckets
   for engines/stages where AQE can't help (e.g. feeding a window).
"""

from __future__ import annotations

from contextlib import contextmanager

import pytest
from pyspark.sql import functions as F

from dwh_etl_framework_spark.operators.merge import (
    JournalSpec,
    latest_per_key,
    merge_delta,
    stamp_journal_columns,
)
from dwh_etl_framework_spark.operators.skew import salted_join

SPEC = JournalSpec(primary_key=("k",))


@contextmanager
def _confs(spark, **kv):
    old = {}
    for key, value in kv.items():
        k = key.replace("__", ".")
        old[k] = spark.conf.get(k, None)
        spark.conf.set(k, value)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _skewed_journal(spark, hot_rows=5_000, cold_keys=2_000, versions=2):
    """Journal where PK 0 carries ``hot_rows`` versions and every other PK

    a handful — the 'one customer is half the feed' shape."""
    hot = spark.range(hot_rows).select(
        F.lit(0).alias("k"), F.col("id").alias("v")
    )
    cold = (
        spark.range(1, cold_keys + 1)
        .crossJoin(spark.range(versions).withColumnRenamed("id", "ver"))
        .select(F.col("id").alias("k"), (F.col("id") * 10 + F.col("ver")).alias("v"))
    )
    return stamp_journal_columns(
        hot.unionAll(cold),
        transform_dt="2024-06-01 00:00:00",
        load_dt="2024-06-01 00:00:00",
    )


def test_merge_delta_correct_under_hot_pk(spark):
    journal = _skewed_journal(spark)
    master = spark.range(1, 1_001).select(
        F.col("id").alias("k"), F.lit(-1).cast("long").alias("v")
    )
    out = merge_delta(master, journal, SPEC)
    assert out.groupBy("k").count().filter("count > 1").count() == 0
    rows = dict(out.select("k", "v").collect())
    # hot key resolved to exactly one of its versions (max __seqno ASC tie
    # order = first stamped row of the hot block)
    assert 0 in rows
    # every master key survived (all were re-upserted or kept)
    assert len(rows) == 2_001  # 2000 journal cold keys + hot key 0


def test_latest_per_key_plans_partial_aggregate(spark):
    """The shuffle-side skew mitigation, round-15 form: the latest-row
    pick is an argmax-by-struct AGGREGATE, so the map side collapses a
    hot PK's versions to ONE candidate per task before the exchange
    (partial_max below the shuffle) — strictly stronger than the former
    window plan's WindowGroupLimit top-1 pruning, which still shuffled
    one row per (task, key) AND sorted each reduce partition. No window
    operator remains in the plan."""
    journal = _skewed_journal(spark)
    plan = (
        latest_per_key(journal, SPEC)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partial_max" in plan  # map-side combine below the exchange
    assert "Window" not in plan  # no WindowExec / WindowGroupLimit path


def test_aqe_splits_skewed_join_partition(spark):
    """skew=true on the sort-merge join under a hot key, at test scale via

    lowered skew thresholds (the detection heuristic is byte-based; the
    500 MB production defaults obviously never trip on fixture data)."""
    # incompressible per-row payload: shuffle sizes are measured AFTER lz4,
    # so a constant string would compress the hot partition below any
    # threshold and hide the skew from the byte-based detector
    left = (
        spark.range(120_000)
        .select(
            F.when(F.col("id") % 4 < 3, F.lit(0))
            .otherwise(F.pmod(F.col("id"), F.lit(1_000)))
            .alias("k"),
            F.concat(
                F.sha2(F.col("id").cast("string"), 256),
                F.sha2((F.col("id") + 1).cast("string"), 256),
            ).alias("pad"),
        )
    )
    right = spark.range(1_000).select(
        F.col("id").alias("k"), F.lit(1).alias("dim")
    )
    with _confs(
        spark,
        spark__sql__autoBroadcastJoinThreshold="-1",
        spark__sql__adaptive__autoBroadcastJoinThreshold="-1",
        spark__sql__adaptive__skewJoin__skewedPartitionFactor="2.0",
        spark__sql__adaptive__skewJoin__skewedPartitionThresholdInBytes="256k",
        spark__sql__adaptive__advisoryPartitionSizeInBytes="128k",
        spark__sql__adaptive__coalescePartitions__minPartitionSize="16k",
    ):
        joined = left.join(right, "k")
        # collect() executes THIS DataFrame's query execution, so its
        # adaptive plan is final and inspectable (count() would plan a
        # separate aggregate query).
        assert len(joined.collect()) == 120_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan, plan[:2000]


def test_salted_join_balances_hot_key(spark):
    """Pre-shuffle balance: the hot key's rows spread over num_salts

    buckets, so no single (key, salt) task sees more than ~1/num_salts of
    the hot key (×2 slack for hash variance)."""
    num_salts = 8
    hot_n = 40_000
    left = spark.range(hot_n).select(
        F.lit(0).alias("k"), F.col("id").alias("v")
    )
    right = spark.range(1).select(F.lit(0).alias("k"), F.lit(1).alias("dim"))
    out = salted_join(left, right, on=["k"], num_salts=num_salts)
    assert out.count() == hot_n  # semantics: plain inner join result
    # measure the actual salt distribution the join keyed on
    salted = left.withColumn(
        "salt", F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(num_salts))
    )
    sizes = [r["count"] for r in salted.groupBy("salt").count().collect()]
    assert len(sizes) == num_salts
    assert max(sizes) <= (hot_n / num_salts) * 2
