"""Streaming as-of join (R28 × R33): enrich a left event stream with the

most recent right-side value per key — continuously.

Spark has no native streaming as-of join (stream-stream joins need
equality + time-bound conditions and can't express "latest at-or-before").
This operator builds it from parts the engine already has:

- both streams are unioned with a side tag (the same trick as the batch
  as-of in operators/asof.py),
- ``applyInPandasWithState`` keeps ONE value per key: the latest right
  (time, payload) seen so far,
- each micro-batch is processed in event-time order inside the UDF, so
  within a batch the join is exactly the batch as-of; rights that arrive in
  a later batch apply from that batch onward (standard streaming-enrichment
  semantics — a late dimension update can't rewrite already-emitted rows;
  if you need retractions you want the batch as-of over the journal).

State is one row per key (bounded by key cardinality, not by stream
length); the state store shards by key hash, so this scales like any keyed
stateful op.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_SIDE = "side"  # 0 = right (dimension update), 1 = left (event)


def tag_streams(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    left_payload: str,
    right_payload: str,
) -> DataFrame:
    """Union the two streams into the single keyed stream the stateful

    operator consumes: (key, ts, side, left_val, right_val)."""
    l_tagged = left.select(
        F.col(on).alias("key"),
        F.col(left_time).alias("ts"),
        F.lit(1).alias(_SIDE),
        F.col(left_payload).cast("double").alias("left_val"),
        F.lit(None).cast("double").alias("right_val"),
    )
    r_tagged = right.select(
        F.col(on).alias("key"),
        F.col(right_time).alias("ts"),
        F.lit(0).alias(_SIDE),
        F.lit(None).cast("double").alias("left_val"),
        F.col(right_payload).cast("double").alias("right_val"),
    )
    return l_tagged.unionByName(r_tagged)


OUTPUT_SCHEMA = (
    "key bigint, ts timestamp, left_val double, asof_right double, "
    "asof_right_ts timestamp"
)
STATE_SCHEMA = "right_ts timestamp, right_val double"


def _asof_update(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (k,) = key
    if state.exists:
        right_ts, right_val = state.get
        right_ts = pd.Timestamp(right_ts) if right_ts is not None else None
    else:
        right_ts, right_val = None, None
    out_rows = []
    # applyInPandasWithState may deliver one group as SEVERAL Arrow chunks
    # with no cross-chunk ordering — concatenate before sorting, or a right
    # update in a later chunk could apply to an earlier-time event.
    # Memory = one key's rows for one micro-batch (bounded by batch size).
    all_chunks = [pdf for pdf in pdfs if len(pdf)]
    if all_chunks:
        merged = pd.concat(all_chunks, ignore_index=True)
        # event-time order; rights sort before lefts on ties so an
        # exact-tie update is visible to the event (asof_join parity)
        merged = merged.sort_values(["ts", _SIDE])
        for row in merged.itertuples():
            if getattr(row, _SIDE) == 0:
                right_ts, right_val = row.ts, row.right_val
            else:
                out_rows.append(
                    (k, row.ts, row.left_val, right_val, right_ts)
                )
    state.update((right_ts, right_val))
    yield pd.DataFrame(
        out_rows, columns=["key", "ts", "left_val", "asof_right", "asof_right_ts"]
    )


def stream_asof_join(tagged: DataFrame) -> DataFrame:
    """The stateful as-of over a tag_streams() union (streaming DataFrame)."""
    return tagged.groupBy("key").applyInPandasWithState(
        _asof_update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
