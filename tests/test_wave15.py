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
4. **RRF fusion is the textbook one**: the fused score of every output
   row equals 1/(60+rank_sparse) + 1/(60+rank_dense) with a missing
   side contributing exactly 0; the component ranks agree with the
   standalone x69/x05 rankings; a doc ranked well by BOTH sides beats
   a doc ranked equally well by ONE side.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dwh_etl_framework_spark.operators import editjoin
from dwh_etl_framework_spark.queries.wave15 import (
    _RRF_DEPTH,
    _RRF_K,
    _RRF_TOPK,
    x99_edit_distance_join,
    x99b_edit_join_values,
    x100_hybrid_rrf,
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


def test_value_pairs_consistent_with_id_level(spark):
    # distinct-first must describe EXACTLY the id-level join: for every
    # value pair, n_pairs equals the number of id pairs with that
    # unordered value combination; no value pair missing, none extra.
    rows = [
        (1, "alpha"), (2, "alpha"), (3, "alpha"),
        (4, "alphb"), (5, "alphb"),
        (6, "gamma"), (7, "gamme"),
        (8, "delta"),
    ]
    df = spark.createDataFrame(rows, "id long, s string")
    vp = {
        (r["val_a"], r["val_b"]): (r["dist"], r["n_a"], r["n_b"], r["n_pairs"])
        for r in editjoin.edit_distance_value_pairs(df, "s", k=1).collect()
    }
    assert vp == {
        ("alpha", "alphb"): (1, 3, 2, 6),
        ("gamma", "gamme"): (1, 1, 1, 1),
    }
    # cross-check n_pairs against the id-level operator (dist>=1 pairs)
    idp = [
        r for r in editjoin.edit_distance_pairs(df, "s", "id", k=1).collect()
        if r["dist"] >= 1
    ]
    assert len(idp) == sum(v[3] for v in vp.values())


def test_x99b_matches_fixture_expectation(spark):
    out = x99b_edit_join_values(spark, SF_DIR).collect()
    assert all(r["dist"] == 1 for r in out)  # distinct values, k=1
    assert all(r["val_a"] < r["val_b"] for r in out)
    assert all(r["n_pairs"] == r["n_a"] * r["n_b"] for r in out)


def test_rrf_score_is_the_textbook_formula(spark):
    out = x100_hybrid_rrf(spark, SF_DIR).collect()
    assert len(out) == _RRF_TOPK
    assert sorted(r["rk"] for r in out) == list(range(1, _RRF_TOPK + 1))
    for r in out:
        want = 0.0
        if r["rank_sparse"] is not None:
            assert 1 <= r["rank_sparse"] <= _RRF_DEPTH
            want += 1.0 / (_RRF_K + r["rank_sparse"])
        if r["rank_dense"] is not None:
            assert 1 <= r["rank_dense"] <= _RRF_DEPTH
            want += 1.0 / (_RRF_K + r["rank_dense"])
        assert r["rank_sparse"] is not None or r["rank_dense"] is not None
        assert math.isclose(r["rrf_score"], want, rel_tol=1e-15), r
    by_rank = sorted(out, key=lambda r: r["rk"])
    scores = [r["rrf_score"] for r in by_rank]
    assert scores == sorted(scores, reverse=True)


def test_rrf_component_ranks_match_standalone_tiers(spark):
    from dwh_etl_framework_spark.operators import similarity
    from dwh_etl_framework_spark.queries.wave7 import x69_bm25_topk

    out = {r["doc_id"]: r for r in x100_hybrid_rrf(spark, SF_DIR).collect()}
    # dense side: recompute the standalone cosine ranking (x05's plan at
    # depth 50, same exclusion of the query vector)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qv = emb.filter(F.col("vec_id") == 0)
    dense = similarity.brute_force_topk(
        emb.filter(F.col("vec_id") != 0), qv, k=_RRF_DEPTH, exact=True
    ).collect()
    dense_rank = {
        r["vec_id"]: i + 1
        for i, r in enumerate(
            sorted(dense, key=lambda r: (-r["cosine_sim"], r["vec_id"]))
        )
    }
    for doc_id, r in out.items():
        assert r["rank_dense"] == dense_rank.get(doc_id), doc_id
    # sparse side: x69 ranks the FULL corpus (including doc 0) with the
    # same integer score — on this fixture doc 0 either appears in both
    # or neither ranking's top region; verify ordering consistency on
    # the docs common to both rankings.
    x69 = {r["doc_id"]: r["rk"] for r in x69_bm25_topk(spark, SF_DIR).collect()}
    common = [
        (r["rank_sparse"], x69[d])
        for d, r in out.items()
        if r["rank_sparse"] is not None and d in x69
    ]
    assert len(common) >= 5  # the fixture genuinely overlaps
    # order agreement: sorting by x100's sparse rank sorts x69's rank
    by_ours = sorted(common)
    assert [x for _, x in by_ours] == sorted(x for _, x in by_ours)


def test_rrf_two_sided_beats_one_sided():
    # pure-math property of the fused score as implemented: a doc at
    # rank r on BOTH sides outscores a doc at rank r on ONE side.
    r = 7
    both = 1.0 / (_RRF_K + r) + 1.0 / (_RRF_K + r)
    one = 1.0 / (_RRF_K + r)
    assert both > one


def test_cross_variant_lossless_vs_naive_split(spark):
    """edit_distance_pairs_cross(probe, index) returns EXACTLY the naive
    pairs touching at least one probe string — on the ragged fixture
    split every way across the probe/index boundary (k=1 and k=2),
    including probe∩index overlap (the streaming new-vs-all shape has
    the new values in BOTH: probe = new, index = old ∪ new)."""
    rows = [(i, s) for i, s in RAGGED if s is not None]
    df_all = spark.createDataFrame(RAGGED, "id long, s string")
    for k in (1, 2):
        want_all = _naive_pairs(RAGGED, k)
        for probe_pred in (lambda i: i % 2 == 0, lambda i: i <= 4):
            probe_ids = {i for i, _ in rows if probe_pred(i)}
            probe = df_all.filter(F.col("id").isin(list(probe_ids)))
            got = {
                (r["id_a"], r["id_b"], r["dist"])
                for r in editjoin.edit_distance_pairs_cross(
                    probe, df_all, "s", "id", k=k
                ).collect()
            }
            want = {
                p for p in want_all
                if p[0] in probe_ids or p[1] in probe_ids
            }
            assert got == want, (k, sorted(probe_ids))


def test_cross_variant_union_over_batches_equals_self_join(spark):
    """The entity_folds losslessness argument, pinned directly: feeding
    the ragged strings in 3 batches and cross-joining each batch's NEW
    strings against everything seen so far unions to exactly the naive
    self-join pair set."""
    batches = [RAGGED[0:5], RAGGED[5:9], RAGGED[9:]]
    seen: list = []
    got = set()
    for b in batches:
        new = [(i, s) for i, s in b if s is not None]
        seen.extend(new)
        if not new:
            continue
        probe = spark.createDataFrame(new, "id long, s string")
        index = spark.createDataFrame(seen, "id long, s string")
        got |= {
            (r["id_a"], r["id_b"], r["dist"])
            for r in editjoin.edit_distance_pairs_cross(
                probe, index, "s", "id", k=1
            ).collect()
        }
    # keep only cross-or-within-batch pairs discovered per protocol;
    # the union must equal the one-shot self-join exactly
    assert got == _naive_pairs(RAGGED, 1)
