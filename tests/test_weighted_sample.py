"""Weighted bottom-k sampling (x98): exact properties.

1. **Tournament ≡ single window** for any shard count (the quota_sample
   exactness argument, now on weighted keys).
2. **Weight monotonicity, EXACT**: raising one row's weight adds hash
   candidates to its min, so its key can only fall — its rank never
   worsens while every other key is untouched. (The probabilistic
   "proportional to w" claim is the Cohen/Kaplan bottom-k property; this
   is its testable deterministic shadow.)
3. **Zero/negative weights are never sampled**; weight-1 keys reduce to
   the plain quota_sample key shape.
4. **Mergeability**: bottom-n over a union == bottom-n over the unioned
   per-slice bottom-ns (what a streaming fold would rely on).
5. Determinism under repartitioning.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dwh_etl_framework_spark.operators.sampling import weighted_sample


def _docs(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id") * 7, F.lit(9))).cast("long").alias("weight"),
    )


def _single_window(df, n, salt="wsample:"):
    key = F.array_min(
        F.transform(
            F.sequence(F.lit(1), F.col("weight")),
            lambda j: F.md5(
                F.concat(
                    F.lit(salt), F.col("doc_id").cast("string"),
                    F.lit(":"), j.cast("string"),
                )
            ),
        )
    )
    return (
        df.filter(F.col("weight") >= 1)
        .withColumn("wkey", key)
        .withColumn("rk", F.row_number().over(Window.orderBy("wkey")))
        .filter(F.col("rk") <= n)
    )


def _ranks(df):
    return {r["doc_id"]: (r["rk"], r["wkey"]) for r in df.collect()}


def test_tournament_equals_single_window_any_shards(spark):
    docs = _docs(spark)
    direct = _ranks(_single_window(docs, 25))
    for shards in (1, 3, 64):
        out = weighted_sample(docs, "doc_id", "weight", 25, n_shards=shards)
        assert _ranks(out) == direct, f"shards={shards}"


def test_weight_monotonicity_exact(spark):
    docs = _docs(spark).filter(F.col("weight") >= 1)
    base = weighted_sample(docs, "doc_id", "weight", 1000)
    base_ranks = _ranks(base)
    # pick a mid-ranked doc and double its weight
    target = sorted(base_ranks, key=lambda d: base_ranks[d][0])[
        len(base_ranks) // 2
    ]
    boosted = docs.withColumn(
        "weight",
        F.when(F.col("doc_id") == target, F.col("weight") * 2).otherwise(
            F.col("weight")
        ),
    )
    new_ranks = _ranks(weighted_sample(boosted, "doc_id", "weight", 1000))
    assert new_ranks[target][0] <= base_ranks[target][0]  # never worse
    assert new_ranks[target][1] <= base_ranks[target][1]  # key only falls
    for d, (rk, key) in new_ranks.items():
        if d != target:
            assert key == base_ranks[d][1]  # every other key untouched


def test_zero_weight_never_sampled_and_weight1_is_quota_key(spark):
    docs = spark.createDataFrame(
        [(1, 0), (2, -3), (3, 1), (4, 1)], "doc_id long, weight long"
    )
    out = weighted_sample(docs, "doc_id", "weight", 10).collect()
    assert {r["doc_id"] for r in out} == {3, 4}
    # weight-1 key is exactly md5(salt || id || ':1')
    for r in out:
        import hashlib

        expect = hashlib.md5(f"wsample:{r['doc_id']}:1".encode()).hexdigest()
        assert r["wkey"] == expect


def test_mergeable_bottom_k(spark):
    docs = _docs(spark).filter(F.col("weight") >= 1)
    direct = _ranks(weighted_sample(docs, "doc_id", "weight", 20))
    slices = [
        weighted_sample(
            docs.filter(F.col("doc_id") % 3 == i), "doc_id", "weight", 20
        ).drop("rk")
        for i in range(3)
    ]
    merged = slices[0].unionByName(slices[1]).unionByName(slices[2])
    refolded = (
        merged.withColumn("rk", F.row_number().over(Window.orderBy("wkey")))
        .filter(F.col("rk") <= 20)
    )
    assert _ranks(refolded) == direct


def test_deterministic_under_repartition(spark):
    docs = _docs(spark)
    a = _ranks(weighted_sample(docs, "doc_id", "weight", 30))
    b = _ranks(
        weighted_sample(docs.repartition(13), "doc_id", "weight", 30)
    )
    assert a == b
