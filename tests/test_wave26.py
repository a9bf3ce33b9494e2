"""x113 triangle counting: known-graph invariants behind the oracle."""

from __future__ import annotations

from dwh_etl_framework_spark.queries.wave26 import (
    triangle_report,
    x113_triangle_count,
)

from conftest import SF_DIR


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "u bigint, v bigint")


def test_k4_plus_pendant(spark):
    """K4 has exactly 4 triangles, 3 per member; a pendant node has 0."""
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    rows = {r["part_id"]: r for r in triangle_report(_pairs(spark, k4)).collect()}
    assert rows[1]["n_triangles"] == 4 and rows[1]["n_edges"] == 7
    assert all(rows[n]["tri_cnt"] == 3 for n in (1, 2, 3, 4))
    assert rows[5]["tri_cnt"] == 0 and rows[5]["degree"] == 1
    assert rows[4]["degree"] == 4


def test_triangle_free_graph(spark):
    """A star (hub + 4 leaves) is triangle-free whatever the skew —
    the orientation must not manufacture triangles at the hub."""
    star = [(1, 2), (1, 3), (1, 4), (1, 5)]
    rows = triangle_report(_pairs(spark, star)).collect()
    assert all(r["tri_cnt"] == 0 for r in rows)
    assert rows[0]["n_triangles"] == 0


def test_handshake_identity_on_fixture(spark):
    """Each triangle contributes exactly 3 per-node counts: over the
    FULL fixture report, sum(tri_cnt) == 3 * n_triangles."""
    from pyspark.sql import functions as F
    from dwh_etl_framework_spark.queries.registry import fixtures

    t = fixtures(spark, SF_DIR)
    li = t.lineitem.select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    )
    rep = triangle_report(pairs)
    agg = rep.agg(
        F.sum("tri_cnt").alias("s"), F.first("n_triangles").alias("n")
    ).first()
    assert agg["s"] == 3 * agg["n"]


def test_x113_no_cartesian_and_total_order(spark):
    df = x113_triangle_count(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the only cross joins are the two single-row totals broadcasts
    assert "CartesianProduct" not in plan
    rows = df.collect()
    assert len(rows) <= 10
    keys = [(-r["tri_cnt"], r["part_id"]) for r in rows]
    assert keys == sorted(keys)


def test_x114_clique_survives_chain_peels(spark):
    """6-clique + pendant path, k=3: the path peels in round 1, the
    clique never peels (every member keeps degree 5)."""
    from dwh_etl_framework_spark.queries.wave26 import kcore_profile

    clique = [(i, j) for i in range(1, 7) for j in range(i + 1, 7)]
    path = [(6, 7), (7, 8), (8, 9)]
    rows = kcore_profile(spark, _pairs(spark, clique + path), 3, 4).collect()
    assert [(r["round"], r["n_removed"], r["n_remaining"]) for r in rows] == [
        (1, 3, 6), (2, 0, 6), (3, 0, 6), (4, 0, 6),
    ]


def test_x114_cascade_removes_hub_after_leaves(spark):
    """Star with k=2: leaves die in round 1 (degree 1), the hub dies in
    round 2 once its edges are gone — the cascade the peel exists for."""
    from dwh_etl_framework_spark.queries.wave26 import kcore_profile

    star = [(1, 2), (1, 3), (1, 4), (1, 5)]
    rows = kcore_profile(spark, _pairs(spark, star), 2, 3).collect()
    assert [(r["round"], r["n_removed"], r["n_remaining"]) for r in rows] == [
        (1, 4, 1), (2, 1, 0), (3, 0, 0),
    ]


def test_x115_thresholded_graph_is_tiny_and_consistent(spark):
    """The support gate removes coincidence density: the thresholded
    edge count must be a small fraction of the raw projection, and the
    handshake identity holds on the thresholded report too."""
    from pyspark.sql import functions as F
    from dwh_etl_framework_spark.queries.wave26 import x115_support_triangles

    df = x115_support_triangles(spark, SF_DIR)
    rows = df.collect()
    assert rows, "thresholded graph must not be empty on the fixture"
    n_edges = rows[0]["n_edges"]
    # raw sf0.001 projection has ~8.9k edges; thresholded must be well under
    assert 0 < n_edges < 5000


def test_x115_within_basket_repeat_does_not_self_certify(spark):
    """The support gate counts DISTINCT ORDERS: a part repeated inside
    one basket must not push a pair over the threshold (review r12),
    while genuine two-order co-occurrence must."""
    from dwh_etl_framework_spark.queries.wave26 import _copurchase_pairs

    li = spark.createDataFrame(
        # order 1 holds part 5 twice + part 7 once; order 2 repeats
        # the (8, 9) pair that also co-occurs in order 3
        [(1, 5), (1, 5), (1, 7), (2, 8), (2, 9), (3, 8), (3, 9)],
        "l_orderkey bigint, l_partkey bigint",
    )
    gated = {(r["u"], r["v"]) for r in _copurchase_pairs(li, support=2).collect()}
    assert gated == {(8, 9)}  # (5, 7) saw only one order
    ungated = {(r["u"], r["v"]) for r in _copurchase_pairs(li).collect()}
    assert ungated == {(5, 7), (8, 9)}


def test_kcore_fixpoint_agrees_with_bounded_trace(spark):
    """The fixpoint certifies x114's bounded-round semantics: once the
    bounded trace goes quiet, its remaining count IS the true core."""
    from pyspark.sql import functions as F
    from dwh_etl_framework_spark.queries.registry import fixtures
    from dwh_etl_framework_spark.queries.wave26 import (
        X114_K,
        _copurchase_pairs,
        kcore_fixpoint,
        kcore_profile,
    )

    t = fixtures(spark, SF_DIR)
    pairs = _copurchase_pairs(t.lineitem.select("l_orderkey", "l_partkey"))
    core, rounds = kcore_fixpoint(spark, pairs, X114_K)
    trace = kcore_profile(spark, pairs, X114_K, max(rounds, 1) + 1).collect()
    assert trace[-1]["n_remaining"] == core.count()
    assert trace[-1]["n_removed"] == 0  # the trace had gone quiet


def test_kcore_fixpoint_known_graphs(spark):
    from dwh_etl_framework_spark.queries.wave26 import kcore_fixpoint

    clique = [(i, j) for i in range(1, 7) for j in range(i + 1, 7)]
    path = [(6, 7), (7, 8), (8, 9)]
    core, rounds = kcore_fixpoint(spark, _pairs(spark, clique + path), 3)
    assert sorted(r["node"] for r in core.collect()) == [1, 2, 3, 4, 5, 6]
    assert rounds == 1  # one peel removes the path, the next is quiet
    star = [(1, 2), (1, 3), (1, 4), (1, 5)]
    core2, rounds2 = kcore_fixpoint(spark, _pairs(spark, star), 2)
    assert core2.count() == 0 and rounds2 == 2  # leaves, then the hub


def test_cc_labels_known_graphs(spark):
    """x116 invariants: two disjoint cliques resolve to two components
    labeled by their minimum node ids; bounded rounds mean exactly
    'min label within R hops' on a long path."""
    from dwh_etl_framework_spark.queries.wave26 import cc_labels

    two = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)]
    got = {
        r["node"]: r["lbl"] for r in cc_labels(_pairs(spark, two), 4).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}
    # path 0-1-...-9, R=2: node i's label is exactly max(0, i - 2)
    path = [(i, i + 1) for i in range(9)]
    got2 = {
        r["node"]: r["lbl"]
        for r in cc_labels(_pairs(spark, path), 2).collect()
    }
    assert got2 == {i: max(0, i - 2) for i in range(10)}


def test_cc_fixpoint_agrees_with_bounded_rounds(spark):
    """The fixpoint certifies x116's bounded-round semantics on the real
    thresholded fixture graph: once propagation converges, the bounded
    plan with >= that many rounds produces the identical labeling."""
    from dwh_etl_framework_spark.queries.registry import fixtures
    from dwh_etl_framework_spark.queries.wave26 import (
        X115_SUPPORT,
        _copurchase_pairs,
        cc_fixpoint,
        cc_labels,
    )

    t = fixtures(spark, SF_DIR)
    pairs = _copurchase_pairs(
        t.lineitem.select("l_orderkey", "l_partkey"), support=X115_SUPPORT
    )
    labels, rounds = cc_fixpoint(spark, pairs)
    bounded = cc_labels(pairs, max(rounds, 1))
    assert (
        labels.withColumnRenamed("lbl", "a")
        .join(bounded.withColumnRenamed("lbl", "b"), "node")
        .filter("a != b")
        .count()
        == 0
    )
    assert labels.count() == bounded.count()


def test_cc_fixpoint_known_graphs(spark):
    from dwh_etl_framework_spark.queries.wave26 import cc_fixpoint

    # two components, diameters 3 and 0 -> converges in <= 3 rounds
    g = [(5, 6), (6, 7), (7, 8), (20, 21)]
    labels, rounds = cc_fixpoint(spark, _pairs(spark, g))
    got = {r["node"]: r["lbl"] for r in labels.collect()}
    assert got == {5: 5, 6: 5, 7: 5, 8: 5, 20: 20, 21: 20}
    assert 1 <= rounds <= 3
    with __import__("pytest").raises(RuntimeError, match="converge"):
        cc_fixpoint(spark, _pairs(spark, [(i, i + 1) for i in range(12)]),
                    max_rounds=3)


def test_twostar_known_graphs_and_agreement(spark):
    """Star contraction produces the identical (node → component min)
    labeling as min-label propagation — on known graphs and on the real
    support-thresholded fixture graph."""
    from dwh_etl_framework_spark.queries.registry import fixtures
    from dwh_etl_framework_spark.queries.wave26 import (
        X115_SUPPORT,
        _copurchase_pairs,
        cc_fixpoint,
        cc_fixpoint_twostar,
    )

    g = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12), (20, 21)]
    labels, rounds = cc_fixpoint_twostar(spark, _pairs(spark, g))
    got = {r["node"]: r["lbl"] for r in labels.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
    assert rounds >= 1
    t = fixtures(spark, SF_DIR)
    pairs = _copurchase_pairs(
        t.lineitem.select("l_orderkey", "l_partkey"), support=X115_SUPPORT
    )
    lp, _ = cc_fixpoint(spark, pairs)
    ts, _ = cc_fixpoint_twostar(spark, pairs)
    assert (
        lp.withColumnRenamed("lbl", "a")
        .join(ts.withColumnRenamed("lbl", "b"), "node", "full")
        .filter("a IS NULL OR b IS NULL OR a != b")
        .count()
        == 0
    )


def test_twostar_beats_label_propagation_on_a_path(spark):
    """The scale claim, measured: on a 64-node path (diameter 63),
    min-label propagation needs O(diameter) rounds while star
    contraction needs O(log) — the reason both algorithms exist."""
    from dwh_etl_framework_spark.queries.wave26 import (
        cc_fixpoint,
        cc_fixpoint_twostar,
    )

    path = _pairs(spark, [(i, i + 1) for i in range(63)])
    ts_labels, ts_rounds = cc_fixpoint_twostar(spark, path)
    assert ts_rounds <= 10  # logarithmic in component size
    assert ts_labels.filter("lbl != 0").count() == 0  # one component, min 0
    lp_labels, lp_rounds = cc_fixpoint(spark, path, max_rounds=80)
    assert lp_rounds >= 60  # O(diameter): pays ~63 rounds on the chain
    assert lp_labels.filter("lbl != 0").count() == 0
    assert ts_rounds * 5 < lp_rounds  # the measured gap the docstring claims
