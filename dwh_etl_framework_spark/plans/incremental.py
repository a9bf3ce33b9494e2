"""Incremental ("delta") extract — the mode the reference declares but

never implements (``airflow_etl.py:452-463``, README.md:24-27).

Batch-incremental model: a durable high-water-mark per (source, column);
each extract reads only rows strictly above the stored watermark, then
advances it to the max seen. Combined with a date/id-partitioned source
layout, the predicate prunes partitions, so a delta extract touches only
new data — the O(new) behavior that makes daily loads feasible at 100 TB.

The watermark value is computed with a Spark aggregation (no driver-side
row loops; only the single scalar crosses to the driver). State is a JSON
file (swap for a table/object-store key in production — the protocol is
the contract, not the storage).
"""

from __future__ import annotations

import datetime
import decimal
import json
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _encode(value):
    """Tag non-JSON-native watermark types so they round-trip TYPED.

    ``json.dumps(default=str)`` would flatten a timestamp watermark to a
    string, making the later ``>`` comparison lean on Spark's implicit
    string→timestamp cast — which silently yields NULL (⇒ an empty delta)
    for reprs the cast rejects. Encode the type explicitly instead and
    rebuild the Python object on read, so ``F.lit`` gets a real
    datetime/date/Decimal and the comparison is typed end-to-end."""
    if isinstance(value, datetime.datetime):
        return {"__wm_type__": "timestamp", "value": value.isoformat()}
    if isinstance(value, datetime.date):
        return {"__wm_type__": "date", "value": value.isoformat()}
    if isinstance(value, decimal.Decimal):
        return {"__wm_type__": "decimal", "value": str(value)}
    return value


def _decode(value):
    if isinstance(value, dict) and "__wm_type__" in value:
        kind, raw = value["__wm_type__"], value["value"]
        if kind == "timestamp":
            return datetime.datetime.fromisoformat(raw)
        if kind == "date":
            return datetime.date.fromisoformat(raw)
        if kind == "decimal":
            return decimal.Decimal(raw)
        raise ValueError(f"unknown watermark type tag {kind!r}")
    return value


class WatermarkStore:
    """Durable high-water-marks, keyed by source name."""

    def __init__(self, path: str):
        self.path = Path(path)

    def _load(self) -> dict:
        if self.path.exists():
            return json.loads(self.path.read_text())
        return {}

    def get(self, source: str):
        return _decode(self._load().get(source))

    def set(self, source: str, value) -> None:
        state = self._load()
        # no default=str: an unencodable watermark type fails loud here
        # rather than corrupting the comparison later
        state[source] = _encode(value)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self.path.write_text(json.dumps(state))


def extract_delta(
    df: DataFrame,
    watermark_col: str,
    store: WatermarkStore,
    source: str,
    advance: bool = True,
) -> DataFrame:
    """Rows strictly above the stored watermark. First run (no watermark)

    is a full extract, like the reference's full→delta bootstrap.

    With ``advance=True`` the slice is MATERIALIZED (localCheckpoint) so
    its content is frozen before the watermark moves — one scan, and rows
    landing mid-extract go to the next slice, not both. Semantics are
    then at-most-once per row: if the caller's downstream sink fails after
    this returns, the slice is not re-extractable. Callers needing
    transactional delivery should use ``advance=False`` and call
    ``store.set(source, slice.agg(max(col)))`` only AFTER the sink commits.
    """
    current = store.get(source)
    if current is None:
        # bootstrap: the slice is the WHOLE source — materializing it would
        # copy the full table into executor storage (fatal at 100 TB scale).
        # Compute the watermark with a separate scan instead; rows landing
        # between the two scans are delivered again next cycle
        # (at-least-once on bootstrap only).
        sliced = df
        if advance:
            row = df.agg(F.max(watermark_col).alias("m")).collect()[0]
            if row.m is not None:
                store.set(source, row.m)
        return sliced
    sliced = df.filter(F.col(watermark_col) > F.lit(current))
    if advance:
        # delta slices are bounded (one cycle of new rows) — materialize so
        # the content is frozen before the watermark moves
        sliced = sliced.localCheckpoint(eager=True)
        row = sliced.agg(F.max(watermark_col).alias("m")).collect()[0]
        if row.m is not None:
            store.set(source, row.m)
    return sliced
