"""As-of join (R28): for each left row, the latest right row at-or-before it.

The reference's journal ordering (``airflow_etl.py:172``) generalized to
event time across two tables. Spark has no built-in as-of join, so this is a
composition of existing ops (SURVEY.md §2b R28):

    union-tag both sides → window over (key) ordered by (time, side) →
    carry the last right-row *struct* forward → keep left rows

i.e. ONE shuffle on (key), no range cross-join blowup. Equivalent to DuckDB's
``ASOF JOIN`` (which the correctness oracle uses) and pandas ``merge_asof``.

The right payload travels as a single struct filled with
``last(ignorenulls=True)`` so a NULL in one payload column cannot leak an
older row's value into that column (a classic bug in per-column fills).

Scale: the window sorts within key partitions only; skewed keys are handled
by AQE. For extremely dense right sides, a bucketed/pre-sorted layout on
(key, time) removes even the sort.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PAYLOAD = "__asof_payload"
_TS = "__asof_ts"
_SIDE = "__asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    right_payload: Sequence[str] | None = None,
    allow_exact_matches: bool = True,
    direction: str = "backward",
) -> DataFrame:
    """Join each left row to the most recent right row with

    ``right_time <= left_time`` (direction='backward'); 'forward' gives the
    earliest right row at-or-after. Left rows with no match get NULL payload.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    on = list(on)
    payload = list(
        right_payload
        if right_payload is not None
        else [c for c in right.columns if c not in on and c != right_time]
    )
    clash = [c for c in payload if c in left.columns]
    if clash:
        # silently overwriting left columns would drop the left side's data;
        # make the caller rename/exclude explicitly (pandas merge_asof would
        # suffix — here an explicit alias keeps plans self-documenting)
        raise ValueError(
            f"right payload columns {clash} collide with left columns; "
            "rename them or pass right_payload excluding them"
        )

    r_tagged = right.select(
        *on,
        F.col(right_time).alias(_TS),
        F.struct(*[F.col(c) for c in payload]).alias(_PAYLOAD),
    ).withColumn(_SIDE, F.lit(0))
    payload_type = r_tagged.schema[_PAYLOAD].dataType

    l_tagged = (
        left.withColumn(_TS, F.col(left_time))
        .withColumn(_PAYLOAD, F.lit(None).cast(payload_type))
        .withColumn(_SIDE, F.lit(1))
    )
    for c in left.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l_tagged.unionByName(r_tagged.select(*l_tagged.columns))

    ts_order = F.col(_TS).asc() if direction == "backward" else F.col(_TS).desc()
    # On time ties: with exact matches the right row must be visible to the
    # left row, so right (side=0) sorts first; otherwise left sorts first.
    side_order = F.col(_SIDE).asc() if allow_exact_matches else F.col(_SIDE).desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn(
        _PAYLOAD, F.last(F.col(_PAYLOAD), ignorenulls=True).over(w)
    )
    out = filled.filter(F.col(_SIDE) == 1)
    for c in payload:
        out = out.withColumn(c, F.col(f"{_PAYLOAD}.{c}"))
    return out.drop(_PAYLOAD, _TS, _SIDE)
