#!/usr/bin/env python
"""Machine-readable oracle-parity evidence for EVERY registry query.

The correctness driver only hash-checks the first 50 registry slots
(DRIVER_WINDOW); this runner produces the same per-query evidence —
row count, schema match, order-insensitive value-hash match against the
DuckDB oracle — for the whole registry, so the queries past the window
carry auditable proof too (VERDICT r2 "Next round" item 6).

    python tools/run_parity.py [round_no]    # writes PARITY_r{NN}.json

Fields per query mirror CORRECTNESS_r{N}.json: rows_match / schema_match /
hash_match / spark_rows / oracle_rows / err, plus "hash" (md5 of the
canonicalized sorted rows, identical recipe for both engines) and
"rows_only": true for queries whose semantics have no ANSI-SQL oracle
(their evidence is the dedicated pytest named in COVERAGE.md).
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402

from dwh_etl_framework_spark.queries import QUERIES  # noqa: E402
from dwh_etl_framework_spark.session import SessionFactory  # noqa: E402
from dwh_etl_framework_spark.sources.registry import FIXTURE_TABLES  # noqa: E402


def _canon(value):
    if value is None:
        return None
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        return repr(value)
    if isinstance(value, bytes):
        return value.hex()
    if isinstance(value, list):
        return tuple(_canon(v) for v in value)
    return str(value)


def _hash(schema_names, rows) -> str:
    order = sorted(range(len(schema_names)), key=lambda i: schema_names[i])
    canon = sorted(
        (tuple(_canon(r[i]) for i in order) for r in rows),
        key=lambda t: tuple((v is None, str(v)) for v in t),
    )
    h = hashlib.md5()
    for row in canon:
        h.update(repr(row).encode())
    return h.hexdigest()


def main() -> int:
    """CLI: ``run_parity.py [round_no] [--subset n1,n2,...] [--out FILE]``.

    Default writes PARITY_r{NN}.json over the whole registry at
    $SPARK_GRAFT_SF_DIR (sf0.01). ``--subset``/``--out`` support scale
    sweeps (e.g. the sf1 headliner parity artifact) without touching the
    round artifact that tools/coverage_check.py freshness-guards.
    """
    argv = sys.argv[1:]
    subset: list[str] | None = None
    out_name: str | None = None
    if "--subset" in argv:
        i = argv.index("--subset")
        subset = argv[i + 1].split(",")
        del argv[i : i + 2]
    if "--out" in argv:
        i = argv.index("--out")
        out_name = argv[i + 1]
        del argv[i : i + 2]
    round_no = int(argv[0]) if argv else 0
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = SessionFactory(app_name="parity-runner", shuffle_partitions=8).build()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    todo = (
        {n: QUERIES[n] for n in subset} if subset is not None else dict(QUERIES)
    )
    out: dict[str, dict] = {}
    fails = []
    for name, qd in todo.items():
        rec: dict = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        try:
            sdf = qd.fn(spark, sf_dir)
            scols = sorted(sdf.columns)
            srows = [tuple(r) for r in sdf.collect()]
            rec["spark_rows"] = len(srows)
            if qd.oracle is None:
                rec["rows_only"] = True
                rec["hash"] = _hash(sdf.columns, srows)
            else:
                rel = con.sql(qd.oracle)
                drows = rel.fetchall()
                rec["oracle_rows"] = len(drows)
                rec["rows_match"] = len(srows) == len(drows)
                rec["schema_match"] = scols == sorted(rel.columns)
                s_hash = _hash(sdf.columns, srows)
                d_hash = _hash(rel.columns, drows)
                rec["hash"] = s_hash
                rec["hash_match"] = s_hash == d_hash
                if not (rec["rows_match"] and rec["schema_match"]
                        and rec["hash_match"]):
                    fails.append(name)
        except Exception as exc:  # record, keep going
            rec["err"] = f"{type(exc).__name__}: {exc}"[:500]
            fails.append(name)
        out[name] = rec

    dest = REPO / (out_name or f"PARITY_r{round_no:02d}.json")
    dest.write_text(json.dumps(out, indent=2) + "\n")
    n_oracle = sum(1 for r in out.values() if not r.get("rows_only"))
    print(
        f"{dest.name}: {len(out)} queries ({n_oracle} oracle-checked, "
        f"{len(out) - n_oracle} rows-only), failures: {fails or 'none'}"
    )
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
