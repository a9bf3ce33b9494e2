"""Round-6 regression locks.

1. DRIVER_WINDOW schema lint: the correctness driver canonicalizes results
   through ``pandas.DataFrame.sort_values``, which cannot sort object-list
   cells — an array/map/struct column in any driver-window query errors the
   whole row (x40 in round 4, x42 in round 5: the same bug class two rounds
   running). This lint makes the class impossible: no complex type may
   appear in the output schema of any DRIVER_WINDOW query. Arrays must ship
   serialized (``concat_ws('|', ...)`` / ``array_to_string``).
2. x42_product_quantize itself now ships codes serialized; pin that.
"""

from __future__ import annotations

import pytest

from pyspark.sql.types import ArrayType, MapType, StructType

from dwh_etl_framework_spark.queries import DRIVER_WINDOW, QUERIES

from conftest import SF_DIR


@pytest.mark.parametrize("name", DRIVER_WINDOW)
def test_driver_window_schema_is_canonicalizable(spark, name):
    """No array/map/struct column may reach the driver's pandas hasher."""
    sdf = QUERIES[name].fn(spark, SF_DIR)
    complex_cols = [
        (f.name, f.dataType.simpleString())
        for f in sdf.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not complex_cols, (
        f"{name}: driver-window query outputs complex-typed columns "
        f"{complex_cols} — the driver canonicalizer cannot sort these; "
        f"serialize (concat_ws('|', transform(col, c -> cast(c as string))))"
    )


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_quality_checks_pin_scalar_broadcast(spark):
    """The 1-row totals in unique_key/referential checks are explicitly
    F.broadcast-pinned (VERDICT r5 item 5): the BroadcastNestedLoopJoin
    build side is guaranteed by the plan, not discovered by AQE, and no
    CartesianProduct may appear anywhere in the report plan."""
    from dwh_etl_framework_spark.queries import QUERIES

    plan = _physical_plan(QUERIES["x23_quality_report"].fn(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    # every nested-loop join in the report is a broadcast of a 1-row agg
    assert plan.count("BroadcastNestedLoopJoin BuildRight") >= 2, plan


def test_cap_observation_resolves_with_zero_drops(spark):
    """Latent since r4: with zero oversized buckets AQE rewrites the
    broadcast anti-join away, pruning the CollectMetrics node — and
    Observation.get never resolved. Zero drops is the healthy case a
    production alert reads; it must report zeros, not hang/error."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from dwh_etl_framework_spark.operators.bucket_cap import cap_bucket_size

    df = spark.range(100).select((F.col("id") % 10).alias("k"), "id")
    obs = Observation()
    out = cap_bucket_size(df, ["k"], max_bucket_size=50, observation=obs)
    assert out.count() == 100
    assert obs.get == {
        "dropped_buckets": 0,
        "dropped_rows": 0,
        "largest_bucket": 10,
    }


def test_cross_lsh_batch_side_drop_is_observable(spark):
    """ADVICE r5: a degenerate bucket on the BATCH side of the incremental
    cross-LSH must be droppable AND observable through its own Observation
    — a silent batch-side drop hides exactly the degeneracy the cap is
    there to surface."""
    from pyspark.sql import Observation

    from dwh_etl_framework_spark.operators import dedup

    base = "w" + " w".join(str(i) for i in range(30))
    corpus = spark.createDataFrame(
        [(0, base + " tail_a")], "doc_id long, text string"
    )
    batch_rows = [(100 + i, "junk junk junk junk junk junk") for i in range(60)]
    batch_rows.append((999, base + " tail_b"))
    batch = spark.createDataFrame(batch_rows, "doc_id long, text string")
    sig_c = dedup.minhash_signatures(corpus, "text", "doc_id", n=3, k=64)
    sig_b = dedup.minhash_signatures(batch, "text", "doc_id", n=3, k=64)

    obs_c = Observation("cross_corpus_cap")
    obs_b = Observation("cross_batch_cap")
    pairs = dedup.lsh_candidate_pairs_cross(
        sig_c,
        sig_b,
        "doc_id",
        est_threshold=0.5,
        max_bucket_size=50,
        bucket_observation=obs_c,
        batch_bucket_observation=obs_b,
    ).collect()
    ids = {(r.doc_corpus, r.doc_batch) for r in pairs}
    assert (0, 999) in ids  # honest cross pair survives the cap
    assert obs_b.get["dropped_buckets"] >= 1  # junk bucket observed
    assert obs_b.get["dropped_rows"] >= 60
    assert obs_c.get["dropped_buckets"] == 0  # corpus side untouched


def test_x42_codes_are_serialized(spark):
    sdf = QUERIES["x42_product_quantize"].fn(spark, SF_DIR)
    field = {f.name: f for f in sdf.schema.fields}["codes"]
    assert field.dataType.simpleString() == "string"
    row = sdf.limit(1).collect()[0]
    # m=4 subspaces -> 4 '|'-separated integer codes
    parts = row["codes"].split("|")
    assert len(parts) == 4 and all(p.lstrip("-").isdigit() for p in parts)
