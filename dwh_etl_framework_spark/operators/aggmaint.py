"""Incremental aggregate (materialized-view) maintenance (SURVEY §2a

adjacent: the reference's transform steps recompute aggregates from
scratch every run — ``airflow_etl.py`` has no incremental mode at all).
Algebraic aggregates (COUNT, SUM, MIN, MAX — commutative monoids) can be
maintained from a delta without touching the base fact data: keep the
aggregate table in PARTIAL form (counts + sums, never averages), combine
the delta's partial aggregate into it by key, and derive ratios at read
time. This is the standard lattice/"algebraic aggregate" design every
warehouse MV engine uses, expressed as two DataFrame ops.

Scale shape: per increment the cost is (delta scan + delta-sized partial
agg) + one |keys|-sized recombination shuffle of TWO aggregate tables —
the base FACTS are never rescanned. At 100 TB the aggregate table is
orders of magnitude smaller than the facts, so maintenance cost is
delta-proportional, which is the entire point.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: combine rule per partial-aggregate column kind
_COMBINE = {
    "sum": F.sum,
    "count": F.sum,  # counts combine by summing
    "min": F.min,
    "max": F.max,
}


def partial_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    measures: dict[str, tuple[str, str]],
) -> DataFrame:
    """Aggregate ``df`` into PARTIAL form: ``measures`` maps output column

    → (kind, source column) with kind ∈ {sum, count, min, max}; ``count``
    ignores the source column and counts rows. Averages must NOT be
    materialized here — derive them from (sum, count) at read time, or
    the result stops being combinable."""
    aggs = []
    for out, (kind, src) in measures.items():
        if kind == "count":
            aggs.append(F.count(F.lit(1)).alias(out))
        elif kind in ("sum", "min", "max"):
            aggs.append(getattr(F, kind)(src).alias(out))
        else:
            raise ValueError(f"non-algebraic aggregate kind: {kind!r}")
    return df.groupBy(*keys).agg(*aggs)


def combine_partial_aggregates(
    base: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    measures: dict[str, tuple[str, str]],
) -> DataFrame:
    """Merge two partial-aggregate tables (same schema) into one:

    union + one keyed recombination using each measure's combine rule
    (sum/count → sum, min → min, max → max). New keys appear, existing
    keys update — no base-fact access. Deletes/updates in the delta must
    arrive as compensating rows (negative sums / adjusted counts), the
    standard retraction encoding; MIN/MAX are NOT maintainable under
    retraction (a deleted row that held the min forces a rescan) — this
    combiner is for append-style increments."""
    keys = list(keys)
    unioned = base.select(*keys, *measures).unionByName(
        delta.select(*keys, *measures)
    )
    aggs = [
        _COMBINE[kind](out).alias(out) for out, (kind, _) in measures.items()
    ]
    return unioned.groupBy(*keys).agg(*aggs)
