"""Guard the shipped example against rot: run it as a subprocess exactly as

a user would (its own README-documented command line)."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_example_runs_end_to_end():
    out = subprocess.run(
        [sys.executable, str(REPO / "examples/customer_orders/run.py")],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=str(REPO),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "master rows: 150" in out.stdout
    # the config-declared join_strategy ran and picked the dim broadcast
    assert "join plan [customer_rollup]: broadcast_right" in out.stdout


def test_corpus_curation_example(spark):
    """The end-to-end curation funnel is monotone non-increasing through
    the dedup/gate/selection stages and produces a batch plan."""
    import importlib.util
    from pathlib import Path

    path = Path(__file__).resolve().parents[1] / "examples/corpus_curation/run.py"
    spec = importlib.util.spec_from_file_location("corpus_curation_run", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    funnel, packed = mod.curate(spark, "/root/testdata/sf0.001")
    order = [
        "raw",
        "after_exact_dedup",
        "after_near_dedup",
        "after_semantic_dedup",
        "after_quality_gate",
        "after_dsir_selection",
    ]
    for a, b in zip(order, order[1:]):
        assert funnel[a] >= funnel[b], (a, b, funnel)
    assert funnel["after_near_dedup"] < funnel["raw"]  # screen really fires
    assert funnel["batches"] >= 1
    assert packed.columns == ["doc_id", "n_tok", "bucket", "batch_id"]


def test_warehouse_maintenance_example(spark, tmp_path):
    """The maintenance pipeline is self-verifying: the z-order rewrite
    preserves every row (f30 checksums match before/after) and the real
    parquet footers let the 2-D probe skip files."""
    import importlib.util

    path = (
        Path(__file__).resolve().parents[1]
        / "examples/warehouse_maintenance/run.py"
    )
    spec = importlib.util.spec_from_file_location("warehouse_maintenance_run", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    report = mod.maintain(spark, "/root/testdata/sf0.01", str(tmp_path / "z"))
    assert report["checksum_match"] is True
    assert report["n_files"] >= 8
    assert report["n_skipped_by_probe"] > 0
    # mutation sensitivity: re-fingerprint a corrupted copy and it must differ
    from dwh_etl_framework_spark.queries.registry import fixtures
    from dwh_etl_framework_spark.queries.wave12 import table_checksum

    from pyspark.sql import functions as F

    t = fixtures(spark, "/root/testdata/sf0.01")
    good = sorted(
        tuple(r) for r in table_checksum(t.orders).collect()
    )
    bad_src = t.orders.withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") == 3, F.col("o_custkey") + 1).otherwise(
            F.col("o_custkey")
        ),
    )
    bad = sorted(tuple(r) for r in table_checksum(bad_src).collect())
    assert good != bad


def test_entity_resolution_example(spark):
    """The MDM pipeline is self-consistent: entities partition the rows,
    the dirty-key profile explains the clustering, the k-gate counts
    match the golden table, and the planner estimate never undercounts
    the true re-key join."""
    import importlib.util

    path = (
        Path(__file__).resolve().parents[1]
        / "examples/entity_resolution/run.py"
    )
    spec = importlib.util.spec_from_file_location("entity_resolution_run", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    report, golden = mod.resolve(spark, "/root/testdata/sf0.001")
    assert report["entities"] <= report["distinct_values"]
    assert report["fuzzy_value_pairs"] > 0  # the fixture is really dirty
    # rows either keep their key (golden) or re-key: the two partition
    n_golden = golden.filter("is_golden").count()
    assert n_golden == report["entities"]
    assert n_golden + report["rows_rekeyed"] == report["raw_rows"]
    # the sketch estimate upper-bounds the true re-key join size
    from pyspark.sql import functions as F

    from dwh_etl_framework_spark.queries.registry import fixtures

    t = fixtures(spark, "/root/testdata/sf0.001")
    true_join = t.lineitem.join(
        golden, t.lineitem["l_partkey"] == golden["p_partkey"]
    ).count()
    assert report["rekey_join_size_estimate"] >= true_join


def test_incremental_warehouse_example(spark, tmp_path):
    """The composed day-2 feed: partitioned cursor backfill -> streamed
    SCD2 fold -> PIT/change-feed served from state -> planner decision
    from folded sketches. Pins the exact day-2 arithmetic: 64 keys on
    day 1, every 2nd key re-versioned on day 2."""
    import importlib.util
    from pathlib import Path

    path = (
        Path(__file__).resolve().parents[1]
        / "examples/incremental_warehouse/run.py"
    )
    spec = importlib.util.spec_from_file_location("incremental_wh_run", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    report = mod.run(spark, tmp_path / "wh", n_keys=64)
    assert report["day1_interval_rows"] == 64
    assert report["interval_rows"] == 96      # 64 + 32 closed versions
    assert report["open_intervals"] == 64     # one open interval per key
    assert report["pit_day1_matches"] == 64   # day-1 noon sees day-1 state
    assert report["changed_keys_day2"] == 32  # every 2nd key updated
    assert report["change_types"] == ["UPDATE"]
    d = report["decision"]
    assert d.strategy == "broadcast_left"
    # journal self-join size: 32 keys x 2 versions squared + 32 x 1
    assert d.est_join_rows >= 160 and d.n_left == 96
    # metadata-only decision (VERDICT r10 #6): served from the landed
    # tables' _sketches dirs without scanning either side
    md = report["meta_decision"]
    assert md.n_left == 96 and md.n_right == 64
    assert md.strategy in ("broadcast_left", "broadcast_right")
    assert md.est_join_rows >= 96  # 96 interval rows each match one dim key
