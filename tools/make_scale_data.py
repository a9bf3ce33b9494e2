#!/usr/bin/env python
"""Replicate a driver fixture directory K-fold to approximate a larger SF.

The driver ships sf0.001/sf0.01/sf0.1 only; VERDICT r2 asks for bench
evidence at the largest scale available plus proof that per-query time
scales <= linearly in SF. This tool manufactures an sf1-equivalent from
sf0.1 by unioning K=10 key-shifted copies of every FACT table:

- Each surrogate-key domain (custkey, orderkey, partkey, suppkey,
  event_id, user_id, doc_id, vec_id) gets its own stride = the next power
  of ten above the domain's max, so replica i shifts every key in the
  domain by ``i * stride``. Foreign keys shift by the SAME stride as their
  parent, preserving referential integrity and join fan-out exactly.
- Dimension tables ``region`` / ``nation`` are copied unreplicated (they
  are enum-like; a 10x corpus does not grow the nation list) and the small
  FK columns c_nationkey / s_nationkey stay in-range untouched.
- ``documents.text`` is word-salted per replica (every whitespace token
  gets a ``_r{i}`` suffix for i>0) so cross-replica copies share no
  shingles: the dedup/LSH workload keeps its per-cluster size
  distribution instead of every doc gaining 9 artificial near-dups (which
  would make candidate-pair work scale quadratically and poison the
  linearity measurement). ``n_chars`` is recomputed to stay consistent.
- ``embeddings`` replicate with shifted vec_id only; the brute-force
  top-k headliner is row-linear regardless of vector values.

Timestamps, measures and categorical columns are left untouched, so every
selectivity in the headline queries is preserved and row counts scale by
exactly K.

Usage:
    python tools/make_scale_data.py [--src /root/testdata/sf0.1] \
        [--dest .scaledata/sf1] [--copies 10]
"""

from __future__ import annotations

import argparse
import math
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

# key domains: (stride source columns) -> columns to shift, per table
DOMAINS = {
    "custkey": ["customer.c_custkey", "orders.o_custkey"],
    "orderkey": ["orders.o_orderkey", "lineitem.l_orderkey"],
    "partkey": ["part.p_partkey", "lineitem.l_partkey"],
    "suppkey": ["supplier.s_suppkey", "lineitem.l_suppkey"],
    "event_id": ["events.event_id"],
    "user_id": ["events.user_id"],
    "doc_id": ["documents.doc_id"],
    "vec_id": ["embeddings.vec_id"],
}

DIM_TABLES = ["region", "nation"]
FACT_TABLES = [
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _strides(con: duckdb.DuckDBPyConnection, src: Path) -> dict[str, int]:
    strides: dict[str, int] = {}
    for domain, cols in DOMAINS.items():
        mx = 0
        for qual in cols:
            table, col = qual.split(".")
            val = con.sql(
                f"SELECT max({col}) FROM read_parquet('{src}/{table}.parquet')"
            ).fetchone()[0]
            mx = max(mx, int(val))
        strides[domain] = 10 ** math.ceil(math.log10(mx + 1))
    return strides


def _shift_expr(table: str, col: str, strides: dict[str, int], i: int) -> str | None:
    for domain, cols in DOMAINS.items():
        if f"{table}.{col}" in cols:
            return f"{col} + {i * strides[domain]} AS {col}"
    return None


def replicate(src: Path, dest: Path, copies: int) -> None:
    dest.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    strides = _strides(con, src)
    for table in DIM_TABLES:
        con.sql(
            f"COPY (SELECT * FROM read_parquet('{src}/{table}.parquet')) "
            f"TO '{dest}/{table}.parquet' (FORMAT PARQUET)"
        )
    for table in FACT_TABLES:
        cols = [
            r[0]
            for r in con.sql(
                f"DESCRIBE SELECT * FROM read_parquet('{src}/{table}.parquet')"
            ).fetchall()
        ]
        selects = []
        for i in range(copies):
            exprs = []
            for col in cols:
                shifted = _shift_expr(table, col, strides, i)
                if shifted is not None:
                    exprs.append(shifted)
                elif table == "documents" and col == "text" and i > 0:
                    # word-salt: decorrelate shingles across replicas
                    exprs.append(
                        "array_to_string(list_transform(string_split(text, ' '),"
                        f" w -> w || '_r{i}'), ' ') AS text"
                    )
                elif table == "documents" and col == "n_chars" and i > 0:
                    exprs.append("0 AS n_chars")  # fixed up below
                else:
                    exprs.append(col)
            selects.append(
                f"SELECT {', '.join(exprs)} FROM read_parquet('{src}/{table}.parquet')"
            )
        union = " UNION ALL ".join(selects)
        if table == "documents":
            union = (
                f"SELECT * REPLACE (length(text) AS n_chars) FROM ({union})"
            )
        con.sql(
            f"COPY ({union}) TO '{dest}/{table}.parquet' (FORMAT PARQUET)"
        )
    _harmonize_types(src, dest)
    for table in DIM_TABLES + FACT_TABLES:
        n = con.sql(
            f"SELECT count(*) FROM read_parquet('{dest}/{table}.parquet')"
        ).fetchone()[0]
        print(f"{table}: {n} rows")


def _harmonize_types(src: Path, dest: Path) -> None:
    """Cast every replica table back to the source fixture's exact arrow

    types. DuckDB's COPY normalizes timestamps to timestamp[us]; the driver
    fixtures carry timestamp[ns] (events.ts, read via nanosAsLong) and
    timestamp[ms] — the engine's readers key off those physical types, so
    the replica must be byte-type-identical to be a fair scale stand-in."""
    for table in DIM_TABLES + FACT_TABLES:
        want = pq.read_schema(src / f"{table}.parquet")
        have = pq.read_schema(dest / f"{table}.parquet")
        target = pa.schema(
            [pa.field(f.name, want.field(f.name).type) for f in have]
        )
        if target == have:
            continue
        tbl = pq.read_table(dest / f"{table}.parquet")
        pq.write_table(tbl.cast(target), dest / f"{table}.parquet")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dest", default=str(Path(__file__).resolve().parents[1] / ".scaledata" / "sf1"))
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()
    replicate(Path(args.src), Path(args.dest), args.copies)


if __name__ == "__main__":
    main()
