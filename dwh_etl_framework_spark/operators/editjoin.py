"""Exact edit-distance similarity join via segment pigeonhole (PassJoin-lite).

The string-similarity counterpart of ``operators/setjoin.py``: where the
prefix filter makes the JACCARD self-join lossless-but-scalable, the
segment filter does the same for LEVENSHTEIN distance. The principle
(Li/Deng/Feng "PassJoin", VLDB 2012 — partition-based pigeonhole): split
every indexed string s into ``k+1`` disjoint segments. An edit script of
cost ≤ k touches at most k segments, so at least ONE segment of s
survives untouched and appears VERBATIM in any string r with
``lev(r, s) ≤ k`` — and an optimal alignment can shift its start
position by at most k. Candidates are therefore exactly the pairs that
collide on ``(target_length, segment_no, segment_text)`` where the probe
substring starts within ±k of the segment's home position; everything
else is provably ≥ k+1 edits away and never shuffles.

Lossless by construction — the query oracle is the NAIVE O(n²)
levenshtein self-join, so the driver's hash check certifies that the
segment filter drops no qualifying pair (the x94 proof pattern applied
to edit distance).

At 100 TB: the join keys are (int, int, ≤⌈len/(k+1)⌉-char segment)
tuples — short fixed-ish keys, never whole strings crossed with whole
strings. Per string the probe side emits at most
(2k+1)·(k+1)·(2k+1) substrings (length window × segments × position
window) and the index side k+1 segments — both linear in corpus size.
Degenerate segments (a constant prefix shared corpus-wide — exactly the
TPC-H ``Customer#`` shape) are the known hazard, same class as hot
shingles in the set join: ``max_segment_df`` drops over-frequent segment
keys from candidate generation, loudly changing the contract to "pairs
discoverable under the cap" (OFF by default; the oracle-checked queries
run uncapped so a silent activation cannot exist). Verification is one
JVM ``levenshtein`` expression per DISTINCT candidate pair — banded DP
cost O(len·k) in principle, O(len²) in Spark's builtin, either way per
pair and embarrassingly parallel; the explicit repartition sizes that
stage by pair count, not by the pair table's byte size (the AQE-coalesce
trap found while benching the set join, same fix).

The reference framework has no fuzzy-matching tier at all; this is the
entity-resolution primitive (name/address dedup before a warehouse
merge) its journal-merge protocol would call first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Verify-stage cost budget: DP cell evaluations per task. A candidate
#: pair costs ~avg_len² cells in Spark's levenshtein; partitions =
#: ceil(pairs · avg_len² / budget), floored at 2×parallelism (never less
#: parallel than the AQE-trap fix demands) and capped at 32k tasks.
VERIFY_CELLS_PER_TASK = 50_000_000


def _verify_partitions(
    est_pairs: float, avg_len: float, parallelism: int,
    budget: int = VERIFY_CELLS_PER_TASK,
) -> int:
    """Cost-based verify exchange width (pure, unit-tested)."""
    work = est_pairs * max(avg_len, 1.0) ** 2
    by_cost = int(-(-work // budget)) if work > 0 else 0
    return min(32768, max(parallelism * 2, by_cost))


def _prep_base(df: DataFrame, str_col: str, id_col: str) -> DataFrame:
    """(__id, __s, __l) projection, NULL strings dropped, checkpointed —
    every consumer (index/probe explodes, both verify sides) reads the
    materialized table, not the source scan (PLANS.md lineage rule)."""
    return (
        df.select(
            F.col(id_col).alias("__id"),
            F.col(str_col).alias("__s"),
            F.length(str_col).alias("__l"),
        )
        .filter(F.col("__s").isNotNull())
        .localCheckpoint(eager=True)
    )


def _seg_start(length, i, kk: int):
    # p_i = i*floor(L/(k+1)) + min(i, L mod (k+1)), 0-based
    q = F.floor(length / (kk + 1)).cast("int")
    r = (length % (kk + 1)).cast("int")
    return i * q + F.least(i, r)


def _seg_len(length, i, kk: int):
    q = F.floor(length / (kk + 1)).cast("int")
    r = (length % (kk + 1)).cast("int")
    return q + F.when(i < r, F.lit(1)).otherwise(F.lit(0))


def _index_segments(base: DataFrame, kk: int) -> DataFrame:
    """Index side: the k+1 home segments of every string, keyed by the
    string's own length. substring() is 1-based. Output:
    (id_b, __lt, __i, __seg)."""
    seg_no = F.explode(F.sequence(F.lit(0), F.lit(kk))).alias("__i")
    return (
        base.select("__id", "__s", "__l", seg_no)
        .withColumn("__p", _seg_start(F.col("__l"), F.col("__i"), kk))
        .withColumn("__m", _seg_len(F.col("__l"), F.col("__i"), kk))
        .select(
            F.col("__id").alias("id_b"),
            F.col("__l").alias("__lt"),
            "__i",
            F.expr("substring(__s, __p + 1, __m)").alias("__seg"),
        )
    )


def _probe_segments(base: DataFrame, kk: int) -> DataFrame:
    """Probe side: for every target length within ±k and every segment
    slot, the substrings starting within ±k of that segment's home
    position. Row fanout per string ≤ (2k+1)·(k+1)·(2k+1). The position
    window is emitted through a WHEN-guarded sequence — Spark's
    sequence(lo, hi) runs DESCENDING when lo > hi (a probe string
    shorter than the segment), which would be garbage positions, not an
    empty set. Output: (id_a, __lt, __i, __seg)."""
    seg_no = F.explode(F.sequence(F.lit(0), F.lit(kk))).alias("__i")
    return (
        base.select(
            "__id", "__s", "__l",
            F.explode(
                F.sequence(
                    F.greatest(F.col("__l") - kk, F.lit(0)), F.col("__l") + kk
                )
            ).alias("__lt"),
        )
        .select("__id", "__s", "__l", "__lt", seg_no)
        .withColumn("__p", _seg_start(F.col("__lt"), F.col("__i"), kk))
        .withColumn("__m", _seg_len(F.col("__lt"), F.col("__i"), kk))
        .withColumn("__lo", F.greatest(F.col("__p") - kk, F.lit(0)))
        .withColumn("__hi", F.least(F.col("__p") + kk, F.col("__l") - F.col("__m")))
        .select(
            "__id", "__s", "__lt", "__i", "__m",
            F.explode(
                F.when(
                    F.col("__lo") <= F.col("__hi"),
                    F.sequence(F.col("__lo"), F.col("__hi")),
                ).otherwise(F.array().cast("array<int>"))
            ).alias("__q"),
        )
        .select(
            F.col("__id").alias("id_a"),
            "__lt",
            "__i",
            F.expr("substring(__s, __q + 1, __m)").alias("__seg"),
        )
    )


def edit_distance_pairs(
    df: DataFrame,
    str_col: str,
    id_col: str,
    k: int = 1,
    max_segment_df: int | None = None,
) -> DataFrame:
    """All pairs (id_a < id_b) with ``levenshtein(str_a, str_b) <= k``.

    Output: (id_a, id_b, dist) — one row per unordered pair, ``dist``
    the exact edit distance. NULL / empty handling: NULL strings are
    dropped (no distance is defined); empty strings participate (an
    empty string is within k of any string of length ≤ k).

    Segment scheme (even partition, deterministic in length alone): for
    a string of length L, segment i ∈ [0, k] starts at
    ``p_i = i·⌊L/(k+1)⌋ + min(i, L mod (k+1))`` and has length
    ``⌊L/(k+1)⌋ + (1 if i < L mod (k+1) else 0)``. Strings shorter than
    k+1 produce empty segments whose key is ('', position) — they match
    only other length-compatible strings, a bounded block.

    The probe side enumerates, for each candidate target length
    ``Lt ∈ [L-k, L+k]``, each segment number, and each start position
    within ±k of that segment's home (clamped to valid substring
    range) — all with builtin ``sequence``/``explode``; no Python
    touches a row.
    """
    base = _prep_base(df, str_col, id_col)
    kk = int(k)
    idx = _index_segments(base, kk)
    probe = _probe_segments(base, kk)

    if max_segment_df is not None:
        hot = (
            idx.groupBy("__lt", "__i", "__seg")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") > max_segment_df)
            .select("__lt", "__i", "__seg")
        )
        idx = idx.join(F.broadcast(hot), ["__lt", "__i", "__seg"], "left_anti")
        probe = probe.join(
            F.broadcast(hot), ["__lt", "__i", "__seg"], "left_anti"
        )

    cand = (
        probe.join(idx, ["__lt", "__i", "__seg"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )

    # verify exchange sized by estimated DP work, not pair-table bytes
    # (the setjoin AQE-coalesce lesson). Both scalars are one tiny job
    # over the checkpointed base / the candidate keys' frequency table.
    est_pairs = (
        idx.groupBy("__lt", "__i", "__seg")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("p"))
        .first()["p"]
        or 0.0
    )
    avg_len = base.agg(F.avg("__l").alias("a")).first()["a"] or 0.0
    n_part = _verify_partitions(
        est_pairs, avg_len, df.sparkSession.sparkContext.defaultParallelism
    )

    sa = base.select(F.col("__id").alias("id_a"), F.col("__s").alias("__stra"))
    sb = base.select(F.col("__id").alias("id_b"), F.col("__s").alias("__strb"))
    return (
        cand.repartition(n_part, "id_a", "id_b")
        .join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("dist", F.levenshtein("__stra", "__strb").cast("int"))
        .filter(F.col("dist") <= kk)
        .select("id_a", "id_b", "dist")
    )


def edit_distance_pairs_cross(
    probe_df: DataFrame,
    index_df: DataFrame,
    str_col: str,
    id_col: str,
    k: int = 1,
) -> DataFrame:
    """All pairs (one side ∈ ``probe_df``, other ∈ ``index_df``,
    ``levenshtein ≤ k``, ids distinct), canonicalized to ``id_a < id_b``
    and deduplicated.

    The incremental-ingest shape (the ``lsh_candidate_pairs_cross``
    precedent): when a batch of NEW strings arrives against a persisted
    corpus, probe only the new side against the index of everything —
    the pigeonhole argument is one-directional (at least one of the
    INDEXED string's segments survives any ≤k edit script and appears
    verbatim in the probe string), so completeness needs the index side
    to cover every string the probe may pair with; it never needs
    probe×probe symmetry. Cost per increment: O(|batch|) probe fanout
    joined against segment keys, never a corpus re-join.
    """
    kk = int(k)
    pbase = _prep_base(probe_df, str_col, id_col)
    ibase = _prep_base(index_df, str_col, id_col)
    cand = (
        _probe_segments(pbase, kk)
        .join(_index_segments(ibase, kk), ["__lt", "__i", "__seg"])
        .filter(F.col("id_a") != F.col("id_b"))
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .distinct()
    )
    est_pairs = (
        _index_segments(ibase, kk)
        .groupBy("__lt", "__i", "__seg")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("p"))
        .first()["p"]
        or 0.0
    )
    avg_len = ibase.agg(F.avg("__l").alias("a")).first()["a"] or 0.0
    n_part = _verify_partitions(
        est_pairs, avg_len, probe_df.sparkSession.sparkContext.defaultParallelism
    )
    strings = pbase.unionByName(ibase).dropDuplicates(["__id"])
    sa = strings.select(F.col("__id").alias("id_a"), F.col("__s").alias("__stra"))
    sb = strings.select(F.col("__id").alias("id_b"), F.col("__s").alias("__strb"))
    return (
        cand.repartition(n_part, "id_a", "id_b")
        .join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("dist", F.levenshtein("__stra", "__strb").cast("int"))
        .filter(F.col("dist") <= kk)
        .select("id_a", "id_b", "dist")
    )


def edit_distance_value_pairs(
    df: DataFrame,
    str_col: str,
    k: int = 1,
    max_segment_df: int | None = None,
) -> DataFrame:
    """Value-level fuzzy-match profile: pairs of DISTINCT string values
    within ``levenshtein <= k``, each with both multiplicities.

    Output: (val_a, val_b, dist, n_a, n_b, n_pairs) with ``val_a <
    val_b`` lexicographically, ``1 <= dist <= k`` (equal strings are the
    SAME distinct value — exact-dup accounting is the exact-dedup tier's
    job), ``n_pairs = n_a * n_b`` the row-level pair count the id-level
    join would emit for this value pair.

    This is the 100 TB shape for low-cardinality dirty columns (names,
    addresses, category labels — exactly where fuzzy matching is run):
    edit distance depends only on the VALUES, so collapse to distinct
    values first (one map-side-combinable aggregate), run the segment
    join over the value universe (often 10²–10⁶ rows when the corpus is
    10⁹+), and carry multiplicities as integers. The id-level expansion
    — quadratic in cluster sizes by definition — is left to the caller
    to join back IF the use case truly needs row pairs; the profile
    itself stays linear in distinct values + qualifying value pairs.
    """
    vals = (
        df.filter(F.col(str_col).isNotNull())
        .groupBy(F.col(str_col).alias("__v"))
        .agg(F.count(F.lit(1)).alias("__n"))
        .localCheckpoint(eager=True)
    )
    pairs = edit_distance_pairs(
        vals, "__v", "__v", k=k, max_segment_df=max_segment_df
    )
    # no broadcast hint: the counts table is vocabulary-sized (tiny for
    # label-like columns, where AQE broadcasts it anyway) but CAN be
    # huge for free-text values — forcing a broadcast there would be the
    # wrong call, and AQE makes the right one per-corpus at runtime.
    ca = vals.select(F.col("__v").alias("id_a"), F.col("__n").alias("n_a"))
    cb = vals.select(F.col("__v").alias("id_b"), F.col("__n").alias("n_b"))
    return (
        pairs.join(ca, "id_a")
        .join(cb, "id_b")
        .select(
            F.col("id_a").alias("val_a"),
            F.col("id_b").alias("val_b"),
            "dist",
            "n_a",
            "n_b",
            (F.col("n_a") * F.col("n_b")).alias("n_pairs"),
        )
    )
