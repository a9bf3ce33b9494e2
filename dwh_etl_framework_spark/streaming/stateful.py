"""Custom stateful streaming operator (R33 "custom stateful operators"):

a per-key running aggregator via ``applyInPandasWithState`` — the escape
hatch for stateful semantics Spark's built-in windowed aggs can't express
(running counters with custom merge logic, decaying scores, per-entity
sessionization with business rules...).

State model: one (count, total) pair per user_id, updated per micro-batch,
emitted as an update row each time the key appears. GroupStateTimeout can
evict idle keys; at 100 TB/day the state store shards by key hash across
executors, so the operator scales with the cluster like any keyed agg.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"


def _update_running_totals(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [total]}
    )


def running_totals_per_user(events: DataFrame) -> DataFrame:
    """Continuously-updated (count, total) per user. Works only on streaming

    DataFrames; the batch equivalent is a plain groupBy (tests compare the
    two — stream/batch unification again)."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_running_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def has_tws_runtime() -> bool:
    """Capability probe for ``transformWithStateInPandas``: Spark 4's

    Python state client talks protobuf to the JVM state server, so the
    API needs ``google.protobuf`` importable on driver AND workers."""
    import importlib.util

    try:
        # find_spec imports the PARENT package, so a missing "google"
        # namespace raises instead of returning None
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        return False


def running_totals_per_user_tws(events: DataFrame) -> DataFrame:
    """``transformWithStateInPandas`` twin of ``running_totals_per_user``

    — identical semantics (tests replay both against the batch groupBy),
    different state plumbing: a named ValueState on the processor handle.
    Requires the RocksDB state store provider (see
    ``tests/test_stateful.py`` for the session conf) and the protobuf
    runtime (``has_tws_runtime``); without it this raises immediately
    with a clear message instead of failing deep inside the first
    micro-batch. UNVERIFIED in this container (no protobuf, installs
    disabled) — the ``applyInPandasWithState`` twin carries the tested
    semantics; run ``tests/test_stateful.py`` wherever protobuf exists
    before relying on this path."""
    if not has_tws_runtime():
        raise RuntimeError(
            "transformWithStateInPandas requires google.protobuf (Spark 4 "
            "state-client dependency), which is not installed; use "
            "running_totals_per_user (applyInPandasWithState) instead"
        )
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class Processor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            if self._totals.exists():
                n, total = self._totals.get()
            else:
                n, total = 0, 0.0
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            Processor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="update",
            timeMode="none",
        )
    )
