#!/usr/bin/env python
"""End-to-end warehouse maintenance: the §2a/§2c layout + audit operators
composed the way a platform team runs them nightly.

    raw orders table (many small files)
      → fingerprint BEFORE            (f30 order-independent checksum)
      → compaction plan               (f28-style byte-quantized bins)
      → Z-order rewrite               (x82's production repartitionByRange
                                       path, real parquet write)
      → fingerprint AFTER             (f30 again — rewrite must be
                                       byte-for-byte content-preserving)
      → zone-map skipping report      (parquet FOOTER min/max vs the
                                       2-D probe — measured, not modeled)

The checksum comparison is the point: a layout rewrite that loses,
duplicates, or mutates ANY row flips the XOR or the sum, so the nightly
job verifies itself. Each stage is the same code path the oracle-checked
registry queries run; this script wires them together and prints the
report. Run:

    python examples/warehouse_maintenance/run.py [sf_dir]

(defaults to /root/testdata/sf0.001 — finishes in ~30 s on local[*]).
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from pyspark.sql import functions as F

from dwh_etl_framework_spark.queries.registry import fixtures
from dwh_etl_framework_spark.queries.wave9 import (
    PROBE_CK_HI,
    PROBE_CK_LO,
    PROBE_DAY_HI,
    PROBE_DAY_LO,
    _z_expr,
)
from dwh_etl_framework_spark.queries.wave12 import table_checksum
from dwh_etl_framework_spark.session import SessionFactory

N_FILES = 16


def maintain(spark, sf_dir: str, dest: str):
    """Returns the maintenance report dict. Pure DataFrames + one real
    parquet write — callable from tests."""
    t = fixtures(spark, sf_dir)
    report: dict = {}

    # 1. fingerprint the table BEFORE the rewrite (f30)
    before = {
        r["o_orderstatus"]: (r["n_rows"], r["xor_fp"], int(r["sum_fp"]))
        for r in table_checksum(t.orders).collect()
    }
    report["n_groups"] = len(before)

    # 2. Z-order rewrite — the x82 PRODUCTION path: Morton key, range
    #    exchange, sorted write. No global window anywhere.
    day = "CAST(datediff(o_orderdate, DATE '1995-01-01') AS BIGINT)"
    keyed = t.orders.withColumn(
        "zval",
        F.expr(f"CAST({_z_expr('o_custkey', day, 'DIV')} AS BIGINT)"),
    )
    (
        keyed.repartitionByRange(N_FILES, "zval")
        .sortWithinPartitions("zval")
        .drop("zval")
        .write.mode("overwrite")
        .parquet(dest)
    )

    # 3. fingerprint AFTER from the files on disk — the rewrite must be
    #    content-preserving, row for row
    rewritten = spark.read.parquet(dest)
    after = {
        r["o_orderstatus"]: (r["n_rows"], r["xor_fp"], int(r["sum_fp"]))
        for r in table_checksum(rewritten).collect()
    }
    report["checksum_match"] = before == after

    # 4. zone-map skipping measured from REAL parquet footers
    import glob as _glob

    import pyarrow.parquet as pq

    from datetime import datetime

    epoch = datetime(1995, 1, 1)

    def day_nr(ts):
        # footer stats for o_orderdate are timestamps; the probe box is in
        # days since 1995-01-01 (the x82 Morton axis)
        return (ts - epoch).days

    n_files = n_skipped = 0
    for p in _glob.glob(f"{dest}/*.parquet"):
        meta = pq.ParquetFile(p).metadata
        cols = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
        spans_ck, spans_day = [], []
        stats_ok = meta.num_row_groups > 0
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(cols["o_custkey"]).statistics
            std = meta.row_group(rg).column(cols["o_orderdate"]).statistics
            if st is None or std is None:  # stats disabled for this group
                stats_ok = False
                break
            spans_ck.append((st.min, st.max))
            spans_day.append((day_nr(std.min), day_nr(std.max)))
        n_files += 1
        # A file with zero row groups or any stats-less row group is NOT
        # skippable (an engine must read what it cannot bound) — without
        # the guard the empty all() below would count it as skipped and
        # inflate n_skipped_by_probe (ADVICE r8).
        if not stats_ok:
            continue
        # per ROW GROUP: a row group is pruned when EITHER probe dimension
        # excludes it; the file is skipped iff every row group is pruned.
        # (Evaluating each dimension file-wide undercounts: a multi-row-
        # group file whose groups are each excluded by DIFFERENT dimensions
        # is skippable by an engine but has no single all-excluding
        # dimension — ADVICE r7.)
        n_skipped += all(
            (ck_lo > PROBE_CK_HI or ck_hi < PROBE_CK_LO)
            or (d_lo > PROBE_DAY_HI or d_hi < PROBE_DAY_LO)
            for (ck_lo, ck_hi), (d_lo, d_hi) in zip(spans_ck, spans_day)
        )
    report["n_files"] = n_files
    report["n_skipped_by_probe"] = n_skipped

    # 5. LANDED zone-map tier (round 13): the framework's own metadata —
    #    nightly re-lands append superseding generations, the map_rows
    #    signal shows the growth, compaction resets it, and the pruning
    #    decision is identical before/after (the scheduled-maintenance
    #    loop a platform team runs next to the compaction planner).
    from dwh_etl_framework_spark.sources.zonemaps import (
        compact_table_zonemaps,
        land_fragment_with_zonemap,
        read_table_pruned,
        write_table_with_zonemaps,
    )

    day0 = "CAST(datediff(o_orderdate, DATE '1992-01-01') AS BIGINT)"
    shift = 1096  # probe bounds are on the 1995-01-01 axis (x82's)
    zsrc = t.orders.withColumn("day_nr", F.expr(day0)).withColumn(
        "__fragment", F.expr(f"CAST(({day0}) DIV 400 AS BIGINT)")
    )
    zdest = f"{dest}_zonemapped"
    write_table_with_zonemaps(zsrc, zdest, ["day_nr"])
    probe = {"day_nr": (PROBE_DAY_LO + shift, PROBE_DAY_HI + shift)}
    _, fresh = read_table_pruned(spark, zdest, probe)
    # three nightly re-lands of one fragment → three superseded map rows
    night = zsrc.filter("__fragment = 3")
    for _ in range(3):
        land_fragment_with_zonemap(night, zdest, ["day_nr"])
    _, grown = read_table_pruned(spark, zdest, probe)
    compact_table_zonemaps(spark, zdest)
    _, compacted = read_table_pruned(spark, zdest, probe)
    report["zonemap_fragments_kept"] = (
        f"{compacted['fragments_kept']}/{compacted['fragments_total']}"
    )
    report["zonemap_map_rows"] = (
        f"fresh {fresh['map_rows']} → re-lands {grown['map_rows']} → "
        f"compacted {compacted['map_rows']}"
    )
    report["zonemap_pruning_stable"] = (
        grown["fragments_kept"] == compacted["fragments_kept"] == fresh["fragments_kept"]
    )
    return report


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = SessionFactory(app_name="warehouse-maintenance-example").build()
    spark.sparkContext.setLogLevel("ERROR")
    with tempfile.TemporaryDirectory() as tmp:
        report = maintain(spark, sf_dir, f"{tmp}/orders_zordered")
    for k, v in report.items():
        print(f"{k:>24}: {v}")
    if not report["checksum_match"]:
        raise SystemExit("REWRITE NOT CONTENT-PRESERVING")
    if not report["zonemap_pruning_stable"]:
        raise SystemExit("ZONE-MAP COMPACTION CHANGED A PRUNING DECISION")
    spark.stop()


if __name__ == "__main__":
    main()
