"""Stream-stream interval join (R33 family): correlate two live event

streams on a key within a time bound — e.g. purchases attributed to the
click that preceded them. The reference has no streaming engine at all
(its "delta" modes are declared but unimplemented, ``airflow_etl.py:
452-463``); this is the Spark-native construct its users would reach for.

Spark's stream-stream inner join requires BOTH sides watermarked and a
time-range predicate so the state store can evict: a left row is held only
until the right watermark passes ``left_ts + lookback``, so state is
bounded by (arrival rate × lookback), independent of stream length. That
eviction bound is the whole design at 100 TB/day — an unbounded-condition
join would accumulate forever.

Batch/stream unification: ``r33b_interval_join_twin`` in the registry runs
the identical join condition over the batch fixture and is hash-checked
against DuckDB; ``tests/test_stream_join.py`` replays the same data as two
file streams through THIS operator and asserts result equality with the
twin (multi-micro-batch, out-of-order arrival included).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lookback: str = "30 minutes",
    watermark_delay: str = "10 minutes",
    prefix: tuple[str, str] = ("l_", "r_"),
) -> DataFrame:
    """Inner-join ``right`` rows to ``left`` rows with the same ``on`` key

    where ``left_ts <= right_ts <= left_ts + lookback`` (left happened
    first; right follows within the window).

    Works unchanged on batch frames (watermarks are no-ops there) — that
    IS the unification test strategy. All non-key columns are prefixed so
    the two sides never collide.
    """
    lp, rp = prefix
    l = left.withWatermark(left_ts, watermark_delay)
    r = right.withWatermark(right_ts, watermark_delay)
    for c in left.columns:
        if c != on:
            l = l.withColumnRenamed(c, lp + c)
    for c in right.columns:
        if c != on:
            r = r.withColumnRenamed(c, rp + c)
    cond = (
        (l[on] == r[on])
        & (r[rp + right_ts] >= l[lp + left_ts])
        & (r[rp + right_ts] <= l[lp + left_ts] + F.expr(f"INTERVAL {lookback}"))
    )
    return l.join(r, cond, "inner").drop(r[on])
