#!/usr/bin/env python
"""End-to-end master-data entity resolution: the round-9 fuzzy tier
composed into the pipeline a warehouse team runs BEFORE trusting a
journal merge's natural keys.

    dirty rows (part catalog)
      → value profile            (distinct-first multiplicities — x99b)
      → fuzzy match              (lossless segment-pigeonhole join,
                                  operators/editjoin — x99)
      → entity clustering        (connected components — x20 machinery)
      → golden record            (struct-MAX survivorship — x101)
      → k-anonymity gate         (QI group-size audit — f31)
      → re-key join plan         (CMS statistics → broadcast-vs-
                                  shuffle decision — x103/x105 — and the
                                  join executed under it)

Each stage is the SAME DataFrame plan the oracle-checked registry query
runs; this script wires them together and prints the resolution report.
Run:

    python examples/entity_resolution/run.py [sf_dir]

(defaults to /root/testdata/sf0.001 — finishes in ~30 s on local[*]).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from pyspark.sql import functions as F

from dwh_etl_framework_spark.operators import editjoin
from dwh_etl_framework_spark.operators.sketch import (
    apply_join_strategy,
    choose_join_strategy,
    cms_sketch,
)
from dwh_etl_framework_spark.queries.registry import fixtures
from dwh_etl_framework_spark.queries.wave16 import (
    JOINSIZE_W,
    K_ANON,
    x101_entity_golden_record,
)
from dwh_etl_framework_spark.session import SessionFactory


def resolve(spark, sf_dir: str):
    """Returns (report, golden): stage-by-stage stats and the resolved
    table. Pure DataFrames — callable from tests."""
    t = fixtures(spark, sf_dir)
    report: dict[str, int] = {"raw_rows": t.part.count()}

    # 1. value profile: how dirty is the key column? (x99b — distinct
    #    values, fuzzy value pairs, the row-pair count an id-level join
    #    would pay)
    vprofile = editjoin.edit_distance_value_pairs(t.part, "p_name", k=1)
    report["distinct_values"] = (
        t.part.select("p_name").distinct().count()
    )
    report["fuzzy_value_pairs"] = vprofile.count()
    report["row_pairs_avoided"] = (
        vprofile.agg(F.sum("n_pairs").cast("long").alias("s")).first()["s"]
        or 0
    )

    # 2-4. match → cluster → golden record (the x101 composition)
    golden = x101_entity_golden_record(spark, sf_dir)
    # localCheckpoint returns a NEW DataFrame — reassign, else the three
    # downstream actions each recompute the full fuzzy-join + CC plan
    golden = golden.localCheckpoint(eager=True)
    report["entities"] = (
        golden.select("entity_cluster").distinct().count()
    )
    report["rows_rekeyed"] = golden.filter(~F.col("is_golden")).count()

    # 5. k-anonymity gate before any export of the resolved table (f31
    #    shape, over the entity grid): an entity smaller than k would
    #    re-identify its source rows.
    small = (
        golden.select("entity_cluster", "n_members")
        .distinct()
        .filter(F.col("n_members") < K_ANON)
        .count()
    )
    report[f"entities_below_k{K_ANON}"] = small

    # 6. planner decision: the fact table (lineitem) re-keys through the
    #    resolved entities — broadcast or shuffle? Decided from two
    #    sketches without touching the data (x103 statistics feeding
    #    choose_join_strategy, the x105 decision rule), then the re-key
    #    join actually EXECUTES under that decision.
    a = cms_sketch(t.lineitem.select("l_partkey"), "l_partkey", JOINSIZE_W)
    b = cms_sketch(golden.select("p_partkey"), "p_partkey", JOINSIZE_W)
    decision = choose_join_strategy(
        a, b, broadcast_threshold_rows=10_000_000
    )
    report["rekey_join_size_estimate"] = decision.est_join_rows
    report["rekey_strategy"] = decision.strategy
    rekeyed = apply_join_strategy(
        t.lineitem,
        golden.select("p_partkey", "entity_cluster"),
        (F.col("l_partkey") == F.col("p_partkey"), ["l_partkey"], ["p_partkey"]),
        decision,
    )
    report["rekey_join_rows"] = rekeyed.count()
    return report, golden


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = SessionFactory(app_name="entity-resolution-example").build()
    spark.sparkContext.setLogLevel("ERROR")
    report, golden = resolve(spark, sf_dir)
    print("entity resolution report:")
    for k, v in report.items():
        print(f"  {k:>28}: {v}")
    print("sample golden rows:")
    for row in (
        golden.filter(F.col("is_golden") & (F.col("n_members") > 1))
        .orderBy("entity_cluster")
        .limit(5)
        .collect()
    ):
        print(f"  {row.asDict()}")
    spark.stop()


if __name__ == "__main__":
    main()
