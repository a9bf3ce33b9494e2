"""Round-14 additions: weighted label propagation (x118) known-graph
semantics and the native top-k sketch (r59) exact-mode invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from dwh_etl_framework_spark.queries.wave26 import cc_labels
from dwh_etl_framework_spark.queries.wave28 import (
    r60_native_hll_ndv,
    r61_theta_set_algebra,
    R59_K,
    modularity_report,
    r59_native_topk_sketch,
    weighted_lp_labels,
    x118_weighted_label_prop,
    x119_community_modularity,
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


def _labels_df(spark, mapping):
    return spark.createDataFrame(
        list(mapping.items()), "node bigint, lbl bigint"
    )


def test_modularity_single_community_is_zero(spark):
    """Everything in one community: Σw_in = m and Σd_c² = (2m)², so
    q_num = 4m·m − 4m² = 0 exactly — the null-model fixed point."""
    tri = [(1, 2, 3), (1, 3, 3), (2, 3, 3)]
    rep = modularity_report(
        _wpairs(spark, tri), _labels_df(spark, {1: 1, 2: 1, 3: 1})
    ).collect()
    assert len(rep) == 1
    r = rep[0]
    assert r["q_num"] == 0 and r["q_den"] == 4 * 9 * 9
    assert r["w_in"] == 9 and r["d_c"] == 18 and r["size"] == 3


def test_modularity_hand_computed_barbell(spark):
    """Two K3s (weight 4 each edge) + weight-1 bridge, split at the
    bridge: m = 25, each side w_in = 12, d_c = 25 -> q_num =
    4·25·24 − 2·625 = 1150, q_den = 2500 (Q = 0.46) — and the split
    labeling must beat all-in-one (Q = 0)."""
    left = [(1, 2, 4), (1, 3, 4), (2, 3, 4)]
    right = [(7, 8, 4), (7, 9, 4), (8, 9, 4)]
    bridge = [(3, 7, 1)]
    wp = _wpairs(spark, left + right + bridge)
    split = _labels_df(spark, {1: 1, 2: 1, 3: 1, 7: 7, 8: 7, 9: 7})
    rows = {r["community"]: r for r in modularity_report(wp, split).collect()}
    assert rows[1]["w_in"] == 12 and rows[1]["d_c"] == 25
    assert rows[7]["w_in"] == 12 and rows[7]["d_c"] == 25
    assert rows[1]["q_num"] == 4 * 25 * 24 - 2 * 625 == 1150
    assert rows[1]["q_den"] == 4 * 25 * 25 == 2500
    merged = _labels_df(spark, {n: 1 for n in (1, 2, 3, 7, 8, 9)})
    assert modularity_report(wp, merged).collect()[0]["q_num"] == 0


def test_modularity_can_go_negative(spark):
    """An adversarial labeling that cuts every edge (each node its own
    community): Σw_in = 0, so q_num = −Σd_c² < 0 — the reason the
    checked columns are exact integer terms, never an integer
    division whose negative semantics differ across engines."""
    path = [(1, 2, 2), (2, 3, 2)]
    singletons = _labels_df(spark, {1: 1, 2: 2, 3: 3})
    r = modularity_report(_wpairs(spark, path), singletons).collect()[0]
    assert r["q_num"] == -(4 + 16 + 4) and r["q_den"] == 64


def test_x119_fixture_consistency(spark):
    """Fixture smoke at sf0.001: q_num/q_den consistent across rows,
    per-community identities hold (w_in ≤ d_c/2, size ≥ 1)."""
    rep = x119_community_modularity(spark, SF_DIR).collect()
    assert rep
    q_num, q_den = rep[0]["q_num"], rep[0]["q_den"]
    assert q_den > 0
    assert all(r["q_num"] == q_num and r["q_den"] == q_den for r in rep)
    for r in rep:
        assert 2 * r["w_in"] <= r["d_c"]  # intra edges ≤ half degree mass
        assert r["size"] >= 1


def test_louvain_gain_hand_computed_mislabeled_barbell(spark):
    """Barbell with node 9 mislabeled into the left community: the
    move-gain scan must flag EXACTLY node 9, moving to community 7,
    with the hand-computed 2m²-scaled relative gain 464 — and applying
    the move must raise exact-integer modularity (222 → 1150)."""
    from dwh_etl_framework_spark.queries.wave28 import louvain_move_gains

    left = [(1, 2, 4), (1, 3, 4), (2, 3, 4)]
    right = [(7, 8, 4), (7, 9, 4), (8, 9, 4)]
    bridge = [(3, 7, 1)]
    wp = _wpairs(spark, left + right + bridge)
    mislabeled = _labels_df(spark, {1: 1, 2: 1, 3: 1, 9: 1, 7: 7, 8: 7})
    movers = louvain_move_gains(wp, mislabeled).collect()
    assert len(movers) == 1
    mv = movers[0]
    # k_9=8, cur=1: stay = 2·25·0 − 8·(33−8) = −200;
    # move to 7 = 2·25·8 − 8·17 = 264; rel = 464
    assert (mv["node"], mv["from_c"], mv["to_c"]) == (9, 1, 7)
    assert mv["rel_gain"] == 464
    assert mv["n_movers"] == 1 and mv["n_nodes"] == 6
    q_before = modularity_report(wp, mislabeled).collect()[0]["q_num"]
    fixed = _labels_df(spark, {1: 1, 2: 1, 3: 1, 7: 7, 8: 7, 9: 7})
    q_after = modularity_report(wp, fixed).collect()[0]["q_num"]
    assert (q_before, q_after) == (222, 1150) and q_after > q_before


def test_louvain_local_optimum_has_no_movers(spark):
    """The correctly-split barbell is a local optimum of one-node
    moves: zero movers — including node 3, whose bridge candidate must
    lose to its hand-computed stay gain (256 vs −175)."""
    from dwh_etl_framework_spark.queries.wave28 import louvain_move_gains

    left = [(1, 2, 4), (1, 3, 4), (2, 3, 4)]
    right = [(7, 8, 4), (7, 9, 4), (8, 9, 4)]
    bridge = [(3, 7, 1)]
    wp = _wpairs(spark, left + right + bridge)
    split = _labels_df(spark, {1: 1, 2: 1, 3: 1, 7: 7, 8: 7, 9: 7})
    assert louvain_move_gains(wp, split).collect() == []


def test_r62_both_paths_agree_and_rerun_is_idempotent(spark):
    """Session variables: the var-bound and EXECUTE-IMMEDIATE-bound
    reports must be row-identical, and a second run in the SAME session
    (DECLARE OR REPLACE) must work and agree — the registry idempotency
    contract."""
    from dwh_etl_framework_spark.queries.wave28 import r62_session_variables

    first = r62_session_variables(spark, SF_DIR).collect()
    by_path = {}
    for r in first:
        by_path.setdefault(r["path"], set()).add(
            (r["priority"], r["n"], r["cents"])
        )
    assert set(by_path) == {"var", "exec"}
    assert by_path["var"] == by_path["exec"]
    second = r62_session_variables(spark, SF_DIR).collect()
    assert sorted(map(tuple, first)) == sorted(map(tuple, second))


def test_khop_path_graph_layering(spark):
    """A weighted path 1-2-3-4-5 with node 3 the heaviest: seed = 3,
    and the frontier grows by exactly two nodes per hop until the path
    is covered, then saturates (n_new = 0)."""
    from dwh_etl_framework_spark.queries.wave28 import khop_profile

    path = [(1, 2, 1), (2, 3, 5), (3, 4, 5), (4, 5, 1)]
    rep = {r["hop"]: r for r in khop_profile(
        spark, _wpairs(spark, path), 3
    ).collect()}
    assert all(r["seed"] == 3 for r in rep.values())
    assert (rep[1]["n_reached"], rep[1]["n_new"]) == (3, 2)  # {3}+{2,4}
    assert (rep[2]["n_reached"], rep[2]["n_new"]) == (5, 2)  # +{1,5}
    assert (rep[3]["n_reached"], rep[3]["n_new"]) == (5, 0)  # saturated


def test_khop_seed_tiebreak_and_disconnection(spark):
    """Equal degrees tie to the smaller node id, and a disconnected
    component is never reached at any hop."""
    from dwh_etl_framework_spark.queries.wave28 import khop_profile

    two_islands = [(1, 2, 3), (8, 9, 3)]  # equal degree mass everywhere
    rep = {r["hop"]: r for r in khop_profile(
        spark, _wpairs(spark, two_islands), 2
    ).collect()}
    assert all(r["seed"] == 1 for r in rep.values())  # tie -> smallest
    assert rep[1]["n_reached"] == 2  # {1, 2}
    assert rep[2]["n_reached"] == 2  # island {8, 9} stays unreachable


def test_theta_union_without_lgk_degrades(spark):
    """The live trap r61 pins: theta_union WITHOUT the explicit
    lgNomEntries arg defaults to 2^12 nominal and silently downsamples
    a union that both input sketches hold exactly — the lgK must ride
    every union call, not just the accumulators."""
    q = """
        SELECT CAST(theta_sketch_estimate(theta_union(a.s, b.s{arg}))
               AS BIGINT) AS n
        FROM (SELECT theta_sketch_agg(id, 20) s FROM range(100000)) a,
             (SELECT theta_sketch_agg(id, 20) s
              FROM range(50000, 150000)) b
    """
    exact = spark.sql(q.format(arg=", 20")).collect()[0]["n"]
    assert exact == 150000  # explicit lgK: exact
    degraded = spark.sql(q.format(arg="")).collect()[0]["n"]
    assert degraded != 150000  # default union nominal: estimate mode


def test_r61_set_identities_and_exactness(spark):
    """Exact-mode invariants on the fixture: inclusion-exclusion and
    difference identities hold EXACTLY (they would only approximately
    hold if any sketch had crossed into estimate mode)."""
    r = r61_theta_set_algebra(spark, SF_DIR).collect()[0]
    assert r["n_union"] == r["n_low"] + r["n_high"] - r["n_inter"]
    assert r["n_low_only"] == r["n_low"] - r["n_inter"]
    assert 0 <= r["n_inter"] <= min(r["n_low"], r["n_high"])


def test_r60_audit_row_shape_and_determinism(spark):
    """The HLL audit: per-priority rows + the 'ALL' union row, every
    band check green at fixture scale, and the estimate path is
    deterministic (two runs, identical frames — hash-based sketch, no
    RNG — the property that makes hll_ok oracle-safe)."""
    a = {r["grp"]: r for r in r60_native_hll_ndv(spark, SF_DIR).collect()}
    b = {r["grp"]: r for r in r60_native_hll_ndv(spark, SF_DIR).collect()}
    assert a.keys() == b.keys() and "ALL" in a
    for g in a:
        assert a[g]["hll_ok"] is True
        assert a[g]["n_exact"] == b[g]["n_exact"]
    assert a["ALL"]["n_exact"] >= max(
        r["n_exact"] for g, r in a.items() if g != "ALL"
    )


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
