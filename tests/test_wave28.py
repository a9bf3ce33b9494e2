"""Round-14 additions: weighted label propagation (x118) known-graph
semantics and the native top-k sketch (r59) exact-mode invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from dwh_etl_framework_spark.queries.wave26 import cc_labels
from dwh_etl_framework_spark.queries.wave28 import (
    R59_K,
    r59_native_topk_sketch,
    weighted_lp_labels,
    x118_weighted_label_prop,
)

from conftest import SF_DIR


def _wpairs(spark, edges):
    """(u, v, support) weighted undirected edge list, u < v."""
    return spark.createDataFrame(edges, "u bigint, v bigint, support bigint")


def _labels(df):
    return {r["node"]: r["lbl"] for r in df.collect()}


def test_weight_beats_degree(spark):
    """The defining property vs unweighted LP: node 5 has TWO neighbors
    carrying label 1-side labels (weight 1 each) and ONE neighbor with a
    heavy edge (weight 5) — the heavy single edge must win the argmax."""
    edges = [(1, 5, 1), (2, 5, 1), (5, 9, 5)]
    after1 = _labels(weighted_lp_labels(_wpairs(spark, edges), 1))
    # round 1: node 5's candidates are lbl 1 (w=1), lbl 2 (w=1),
    # lbl 9 (w=5) — the single heavy edge outweighs both light ones
    assert after1[5] == 9
    assert after1[1] == 5 and after1[2] == 5 and after1[9] == 5


def test_equal_weight_tie_takes_smaller_label(spark):
    """Total tie order: equal summed weights resolve to the SMALLER
    label — the determinism contract the oracle unrolls."""
    edges = [(3, 10, 2), (7, 10, 2)]
    after1 = _labels(weighted_lp_labels(_wpairs(spark, edges), 1))
    assert after1[10] == 3  # 3 vs 7 at weight 2 each -> 3
    # and equal-weight aggregation sums per LABEL, not per edge: two
    # weight-1 edges from label-8 nodes beat one weight-1.5... (ints
    # only) -> two weight-2 edges beat one weight-3 edge
    edges2 = [(8, 100, 2), (9, 100, 2), (1, 100, 3)]
    # candidates for 100: lbl 8 (2), lbl 9 (2), lbl 1 (3) -> 1 wins
    assert _labels(weighted_lp_labels(_wpairs(spark, edges2), 1))[100] == 1


def test_barbell_keeps_two_communities_where_cc_merges(spark):
    """Two K3s joined by one weak bridge: min-label CC merges everything
    into one component, weighted LP keeps the two dense communities —
    the reason x118 exists next to x116."""
    left = [(1, 2, 4), (1, 3, 4), (2, 3, 4)]
    right = [(7, 8, 4), (7, 9, 4), (8, 9, 4)]
    bridge = [(3, 7, 1)]
    wp = _wpairs(spark, left + right + bridge)
    lp = _labels(weighted_lp_labels(wp, 4))
    assert {lp[1], lp[2], lp[3]} == {1} and {lp[7], lp[8], lp[9]} == {7}
    cc = {r["node"]: r["lbl"] for r in cc_labels(wp.select("u", "v"), 4).collect()}
    assert set(cc.values()) == {1}  # CC: one component, label 1


def test_synchronous_rounds_are_bounded_and_deterministic(spark):
    """Bounded-round contract: a path graph's labels after R rounds are
    exactly the R-step synchronous argmax — rerunning gives identical
    frames (no data-dependent convergence in the checked semantics)."""
    path = [(1, 2, 1), (2, 3, 1), (3, 4, 1)]
    wp = _wpairs(spark, path)
    a = _labels(weighted_lp_labels(wp, 3))
    b = _labels(weighted_lp_labels(wp, 3))
    assert a == b
    # hand-computed round 1 (neighbor argmax, ties to smaller label):
    # 1<-{2}; 2<-{1(w1),3(w1)}->1; 3<-{2,4}->2; 4<-{3}
    r1 = _labels(weighted_lp_labels(wp, 1))
    assert r1 == {1: 2, 2: 1, 3: 2, 4: 3}


def test_x118_report_shape_and_totals(spark):
    """Fixture smoke at sf0.001: sizes sum consistency and the
    size-desc/community-asc report order."""
    rep = x118_weighted_label_prop(spark, SF_DIR).collect()
    assert rep, "thresholded graph should be non-empty at sf0.001"
    n_comm = rep[0]["n_communities"]
    n_nodes = rep[0]["n_nodes"]
    assert all(r["n_communities"] == n_comm for r in rep)
    assert sum(r["size"] for r in rep) <= n_nodes
    sizes = [r["size"] for r in rep]
    assert sizes == sorted(sizes, reverse=True)
    for a, b in zip(rep, rep[1:]):
        if a["size"] == b["size"]:
            assert a["community"] < b["community"]


def test_r59_exact_mode_matches_groupby(spark):
    """Exact-mode claim behind the oracle: with NDV ≪ maxItemsTracked
    and k ≥ NDV, the native sketch's output IS the exact group count —
    every brand present, every count exact."""
    got = {
        r["brand"]: r["cnt"]
        for r in r59_native_topk_sketch(spark, SF_DIR).collect()
    }
    from dwh_etl_framework_spark.queries.registry import fixtures

    t = fixtures(spark, SF_DIR)
    exact = {
        r["p_brand"]: r["n"]
        for r in t.part.groupBy("p_brand")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect()
    }
    assert got == exact
    assert len(got) <= R59_K
