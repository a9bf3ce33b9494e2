"""Frequency-sketch operators: Misra-Gries heavy-hitter candidates + an

exact verify pass (SURVEY §2c adjacent — the sketch tier of the
LLM-pipeline suite).

The two-pass shape is the scalable heavy-hitter design: a per-partition
Misra-Gries sketch (bounded memory, one Arrow-batched pass, NO shuffle of
raw rows) emits a candidate superset; an exact count restricted to
candidates (broadcast semi-join + one candidate-keyed aggregate) trims
false positives. Guarantee (pigeonhole): any key with global frequency
> n/k exceeds n_p/k in at least one partition, so the candidate union
is a superset of the true heavy hitters while ≤ partitions·k rows ever
leave the executors. The exact pass makes the final answer oracle-equal
to a plain GROUP BY ... HAVING — the sketch only bounds the candidate
space, exactly like the bloom prefilter (x72) and the LSH cascade (x02b).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: per-partition Misra-Gries counter budget. The superset guarantee for a
#: threshold of n/k needs k counters; thresholds relative to the mean
#: (count > mult·n/u over u distinct keys) need k ≥ u/mult. For key
#: cardinalities beyond a few million counters, switch the candidate tier
#: to count-min — the verify pass stays identical.
MG_COUNTERS = 4096


def mg_candidates(df: DataFrame, key_col: str, k: int = MG_COUNTERS) -> DataFrame:
    """Per-partition Misra-Gries: one bounded-memory pass over Arrow

    batches, emitting the surviving counter keys per partition (the
    candidate superset). Returns a 1-column DataFrame of distinct keys."""

    def sketch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            for key, cnt in pdf[key_col].value_counts().items():
                cnt = int(cnt)
                if key in counters:
                    counters[key] += cnt
                elif len(counters) < k:
                    counters[key] = cnt
                else:
                    # decrement-all by the smallest of (cnt, min counter):
                    # the batched generalization of MG's decrement step
                    m = min(min(counters.values()), cnt)
                    cnt -= m
                    counters = {
                        ky: c - m for ky, c in counters.items() if c > m
                    }
                    if cnt > 0 and len(counters) < k:
                        counters[key] = cnt
        yield pd.DataFrame({key_col: list(counters.keys())})

    return df.select(key_col).mapInPandas(
        sketch, schema=df.select(key_col).schema
    ).distinct()


def heavy_hitters_exact(
    df: DataFrame,
    key_col: str,
    mult_num: int = 6,
    mult_den: int = 5,
    k: int = MG_COUNTERS,
) -> DataFrame:
    """Keys whose count exceeds (mult_num/mult_den)× the mean key count,

    found via MG candidates + exact verify. All-integer acceptance
    (mult_den·cnt·u > mult_num·n) so the result is engine-exact. Returns
    (key, n_events, share_ppm)."""
    cand = F.broadcast(mg_candidates(df, key_col, k))
    totals = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct(key_col).alias("u"),
    ).localCheckpoint(eager=False)
    counts = (
        df.join(cand, key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .filter(
            F.col("n_events") * mult_den * F.col("u") > mult_num * F.col("n")
        )
        .select(
            key_col,
            "n_events",
            F.expr("CAST(n_events * 1000000 DIV n AS BIGINT)").alias(
                "share_ppm"
            ),
        )
    )
