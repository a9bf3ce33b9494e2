#!/usr/bin/env python
"""Machine-readable oracle-parity evidence for EVERY registry query.

The correctness driver only hash-checks the first 50 registry slots
(DRIVER_WINDOW); this runner produces the same per-query evidence —
row count, schema match, order-insensitive value-hash match against the
DuckDB oracle — for the whole registry, so the queries past the window
carry auditable proof too (VERDICT r2 "Next round" item 6).

    python tools/run_parity.py [round_no]    # writes PARITY_r{NN}.json

Fields per query mirror CORRECTNESS_r{N}.json: rows_match / schema_match /
hash_match / spark_rows / oracle_rows / err, plus "hash" (order- and
column-order-insensitive value digest, identical recipe for both engines)
and "rows_only": true for queries whose semantics have no ANSI-SQL oracle
(their evidence is the dedicated pytest named in COVERAGE.md).

Hash recipe (r8, NOT comparable with ≤r7 artifacts): per row, md5 of the
repr of the canonicalized value tuple (columns in sorted-name order);
rows combine by SUMMING the 128-bit digests mod 2^128, prefixed with the
row count — commutative, so no global sort is needed. Values reach
Python through Arrow (``DataFrame.toArrow`` / ``rel.fetch_arrow_table``)
instead of row-at-a-time collect; together these cut the sf1 sweep's
driver-side hashing ~5x (r24-class 1.5M-row outputs dominated the r7
sweep). ``tests/test_parity_hash.py`` pins fast-path == row-path on
every value type the registry emits.
"""

from __future__ import annotations

import datetime
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


_MASK128 = (1 << 128) - 1


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
    # tz-aware datetimes (TIMESTAMPTZ results reaching the ROW fallback)
    # normalize to the naive UTC wall clock — byte-identical to what the
    # Arrow fast path produces for tz-aware columns. Without this the two
    # paths disagree (str() keeps the UTC offset), and a query where one
    # engine takes Arrow while the other falls back would report a
    # spurious hash mismatch (ADVICE r8). UTC, not system-local, so the
    # digest is environment-independent.
    if isinstance(value, datetime.datetime) and value.tzinfo is not None:
        return str(value.astimezone(datetime.timezone.utc).replace(tzinfo=None))
    return str(value)


def _digest(canon_rows) -> str:
    """Order-insensitive combine: Σ md5(repr(row)) mod 2^128, plus count.

    Commutative and associative, so rows hash in whatever order the
    engine yields them — the O(n log n) Python sort the old recipe paid
    per engine per query is gone entirely."""
    total = n = 0
    for t in canon_rows:
        d = int.from_bytes(hashlib.md5(repr(t).encode()).digest(), "big")
        total = (total + d) & _MASK128
        n += 1
    return f"{n}:{total:032x}"


def _hash_rows(schema_names, rows) -> str:
    """Row-path (collect()/fetchall() output) — fallback + test anchor."""
    order = sorted(range(len(schema_names)), key=lambda i: schema_names[i])
    return _digest(tuple(_canon(r[i]) for i in order) for r in rows)


def _hash_arrow(table) -> str:
    """Fast path: columns come out of Arrow in one C pass (to_pylist),
    with tz-aware timestamps normalized to the naive UTC wall clock —
    the same normalization ``_canon`` applies to tz-aware datetimes on
    the row path, so the two paths agree on TIMESTAMPTZ whichever one
    each engine happens to take (ADVICE r8)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    names = table.schema.names
    order = sorted(range(len(names)), key=lambda i: names[i])
    cols = []
    for i in order:
        col = table.column(i)
        if (
            pa.types.is_timestamp(col.type)
            and getattr(col.type, "tz", None) is not None
        ):
            col = pc.local_timestamp(
                col.cast(pa.timestamp(col.type.unit, tz="UTC"))
            )
        cols.append(col.to_pylist())
    if not cols:
        return _digest(() for _ in range(table.num_rows))
    return _digest(
        tuple(_canon(v) for v in row) for row in zip(*cols)
    )


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
            try:
                stbl = sdf.toArrow()
                s_rows_n, s_hash = stbl.num_rows, _hash_arrow(stbl)
            except Exception:  # Arrow-unfriendly type: row-path fallback
                srows = [tuple(r) for r in sdf.collect()]
                s_rows_n, s_hash = len(srows), _hash_rows(sdf.columns, srows)
            rec["spark_rows"] = s_rows_n
            if qd.oracle is None:
                rec["rows_only"] = True
                rec["hash"] = s_hash
            else:
                rel = con.sql(qd.oracle)
                dcols = rel.columns
                try:
                    dtbl = rel.fetch_arrow_table()
                    d_rows_n, d_hash = dtbl.num_rows, _hash_arrow(dtbl)
                except Exception:
                    drows = rel.fetchall()
                    d_rows_n, d_hash = len(drows), _hash_rows(dcols, drows)
                rec["oracle_rows"] = d_rows_n
                rec["rows_match"] = s_rows_n == d_rows_n
                rec["schema_match"] = scols == sorted(dcols)
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
