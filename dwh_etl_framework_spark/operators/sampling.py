"""Deterministic exact-quota stratified sampling (tournament top-n).

The rate-based sampler (x33, ``md5 < threshold``) is map-only but gives
BINOMIAL stratum sizes; evaluation sets, ablation corpora, and per-source
caps need EXACT quotas. The classic distributed answer is reservoir
sampling; its deterministic, engine-portable equivalent is hash-ranked
top-n: rank every row in a stratum by md5(salt || id) and keep the n
smallest. A pure function of (salt, id) — stable under corpus growth*,
repartitioning, executor count, and engine choice, none of which holds
for ``df.sample``/``rand()``.

(*) adding rows can only displace the largest kept hash, never reorder
survivors — the "bottom-k sketch" property, which also makes the kept
set MERGEABLE: top-n of a union = top-n of the unioned per-shard top-ns.
That property is the scale design: a single window over a 100 TB stratum
would sort one giant partition, so ``quota_sample`` runs a TOURNAMENT —
per (stratum, shard) top-n first (shard = hash of id mod S, so each task
sorts ~|stratum|/S rows), then top-n over the ≤ S·n survivors. Both
rounds are exact; the result is identical to the single-window plan the
oracle runs (row_number in DuckDB), which is what the x95 parity hash
proves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def quota_sample(
    df: DataFrame,
    strata_cols: list[str],
    id_col: str,
    n_per_stratum: int,
    salt: str = "quota:",
    n_shards: int = 16,
) -> DataFrame:
    """Keep exactly min(n, |stratum|) rows per stratum, deterministically.

    Output: the input columns plus ``rk`` (1-based rank within the
    stratum under the md5 order — the stable "which survivors drop if
    the quota shrinks" column). md5 of a unique id never ties, so the
    result is a pure function of the input SET.
    """
    h = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    shard = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))
    ranked = df.withColumn("__h", h).withColumn("__shard", shard)

    # round 1: top-n inside each (stratum, shard) — bounded task input,
    # no stratum-sized sort anywhere
    w1 = Window.partitionBy(*strata_cols, "__shard").orderBy("__h")
    survivors = (
        ranked.withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= n_per_stratum)
        .drop("__r1")
    )
    # round 2: exact rank over the ≤ shards·n survivors per stratum
    w2 = Window.partitionBy(*strata_cols).orderBy("__h")
    return (
        survivors.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= n_per_stratum)
        .drop("__h", "__shard")
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    n: int,
    salt: str = "wsample:",
    n_shards: int = 16,
) -> DataFrame:
    """Deterministic weighted sampling without replacement: keep the n
    rows with the smallest weighted keys, where a row of integer weight
    w gets key = min over j ∈ [1, w] of md5(salt || id || ':' || j).

    This is uniform bottom-n over the weight-REPLICATED multiset
    (Cohen/Kaplan bottom-k sketches; the integer-weight analogue of
    Efraimidis–Sirvola's u^(1/w) keys, with no libm in sight): the
    probability a given row owns the global minimum is exactly
    w_i / Σw, and successive minima realize weighted sampling without
    replacement. Every guarantee of ``quota_sample`` carries over —
    pure function of (salt, id, w), mergeable bottom-k (growth can only
    displace the largest kept key), tournament execution (no global
    sort task) — plus one new EXACT property the tests pin: increasing
    a row's weight adds candidate hashes and so can only LOWER its key,
    i.e. never worsen its rank.

    The w hash candidates are generated map-side as an array transform
    (``F.transform(F.sequence(...))`` + ``array_min``) — no explode, no
    shuffle growth; the per-row cost is O(w), so weights are assumed
    modest integers (quality scores, duplication counts — the training-
    mix use case; cap upstream if a source can produce huge weights).
    Rows with weight < 1 are excluded (weight 0 = never sample).

    Output: the input columns plus ``wkey`` (the hex key — the audit
    column showing WHY a row won) and ``rk`` (1-based global rank).
    """
    w = F.col(weight_col).cast("long")
    key = F.array_min(
        F.transform(
            F.sequence(F.lit(1), w),
            lambda j: F.md5(
                F.concat(
                    F.lit(salt),
                    F.col(id_col).cast("string"),
                    F.lit(":"),
                    j.cast("string"),
                )
            ),
        )
    )
    shard = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))
    ranked = (
        df.filter(w >= 1)
        .withColumn("wkey", key)
        .withColumn("__shard", shard)
    )
    w1 = Window.partitionBy("__shard").orderBy("wkey")
    survivors = (
        ranked.withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= n)
        .drop("__r1")
    )
    w2 = Window.orderBy("wkey")
    return (
        survivors.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= n)
        .drop("__shard")
    )
