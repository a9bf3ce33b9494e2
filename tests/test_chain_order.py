"""x110 generalized chain join-order DP: brute-force equality of the
O(k²) interval DP, the oracled four-table decision table's invariants,
and the landed-metadata entry point."""

from __future__ import annotations

import random

import pytest

from dwh_etl_framework_spark.operators.sketch import (
    chain_interval_estimates,
    chain_join_order,
)
from dwh_etl_framework_spark.queries.wave22 import x110_chain_order_dp
from dwh_etl_framework_spark.sources.sinks import (
    choose_chain_join_order_from_metadata,
    choose_join_order_from_metadata,
    write_table_with_sketches,
)

from conftest import SF_DIR


def _brute_force_cost(ns: list[int], ds: list[int]) -> int:
    """Min sum-of-intermediates over EVERY left-deep build sequence,
    enumerated directly: pick a start table, then extend the interval
    one table at a time in any left/right order."""
    k = len(ns)
    est = chain_interval_estimates(ns, ds)

    def walk(i: int, j: int) -> int:
        size = j - i + 1
        cost = est[(i, j)] if 2 <= size < k else 0
        if i == 0 and j == k - 1:
            return cost
        opts = []
        if i > 0:
            opts.append(walk(i - 1, j))
        if j < k - 1:
            opts.append(walk(i, j + 1))
        return cost + min(opts)

    return min(walk(s, s) for s in range(k))


def test_dp_equals_brute_force_random_chains():
    rng = random.Random(110)
    for _ in range(200):
        k = rng.randint(2, 7)
        ns = [rng.randint(1, 10**6) for _ in range(k)]
        ds = [rng.randint(1, 10**5) for _ in range(k - 1)]
        got = chain_join_order(ns, ds)
        assert got["cost"] == _brute_force_cost(ns, ds), (ns, ds)
        # the returned order is a valid left-deep build: connected
        # prefixes, and its charged intermediates sum to the cost
        seq = got["order"]
        assert sorted(seq) == list(range(k))
        a = b = seq[0]
        total = 0
        est = chain_interval_estimates(ns, ds)
        for t in seq[1:]:
            assert t == a - 1 or t == b + 1, seq  # interval growth only
            a, b = min(a, t), max(b, t)
            if (b - a + 1) < k:
                total += est[(a, b)]
        assert total == got["cost"]


def test_dp_edge_cases():
    # two tables: no intermediates, cost 0, final = the single join
    got = chain_join_order([10, 4], [2])
    assert got["cost"] == 0 and got["est_final"] == 20
    with pytest.raises(ValueError):
        chain_join_order([10, 4], [2, 3])
    with pytest.raises(ValueError):
        chain_join_order([10, 4], [0])


def test_x110_invariants(spark):
    """Exactly one plan chosen; the chosen cost is the minimum; the
    final estimate is plan-invariant; and on this schema the
    dimension-first order (nation⋈customer, then orders, then lineitem)
    must win — its two intermediates ≈ |customer| + |orders| beat every
    fact-first alternative."""
    rows = {r["plan"]: r for r in x110_chain_order_dp(spark, SF_DIR).collect()}
    assert set(rows) == {"co_n", "co_l", "nc_o", "ol_c"}
    assert sum(1 for r in rows.values() if r["chosen"]) == 1
    winner = next(r for r in rows.values() if r["chosen"])
    assert winner["cost"] == min(r["cost"] for r in rows.values())
    assert len({r["est_final"] for r in rows.values()}) == 1
    assert winner["plan"] == "nc_o"
    for r in rows.values():
        assert r["cost"] == r["est_step2"] + r["est_step3"]


def test_x110_chosen_cost_equals_pure_dp(spark):
    """The oracled decision table and the pure-python DP agree on the
    optimal cost and (no ties on this fixture) the charged intervals."""
    from dwh_etl_framework_spark.queries.registry import fixtures
    from dwh_etl_framework_spark.queries.wave22 import _ndv_df

    t = fixtures(spark, SF_DIR)
    ns = [df.count() for df in (t.nation, t.customer, t.orders, t.lineitem)]

    def ndv(df, key):
        return _ndv_df(df, key).first()["ndv"]

    ds = [
        max(ndv(t.nation, "n_nationkey"), ndv(t.customer, "c_nationkey"), 1),
        max(ndv(t.customer, "c_custkey"), ndv(t.orders, "o_custkey"), 1),
        max(ndv(t.orders, "o_orderkey"), ndv(t.lineitem, "l_orderkey"), 1),
    ]
    dp = chain_join_order(ns, ds)
    rows = {r["plan"]: r for r in x110_chain_order_dp(spark, SF_DIR).collect()}
    winner = next(r for r in rows.values() if r["chosen"])
    assert winner["cost"] == dp["cost"]
    assert winner["est_final"] == dp["est_final"]
    assert sorted(dp["est"].values()) == sorted(
        [winner["est_step2"], winner["est_step3"]]
    )


def test_chain_metadata_entry_point(spark, tmp_path):
    """The k-table metadata entry point reproduces the pure DP from
    landed ``_sketches/`` tiers (zero input scans) and, restricted to
    three tables, agrees with the original 3-table entry point."""
    from dwh_etl_framework_spark.queries.registry import fixtures

    t = fixtures(spark, SF_DIR)
    paths = {}
    for name, df, keys in [
        ("nation", t.nation, ["n_nationkey"]),
        ("customer", t.customer, ["c_nationkey", "c_custkey"]),
        ("orders", t.orders, ["o_custkey", "o_orderkey"]),
        ("lineitem", t.lineitem, ["l_orderkey"]),
    ]:
        paths[name] = str(tmp_path / name)
        write_table_with_sketches(df, paths[name], keys, mode="overwrite")
    got = choose_chain_join_order_from_metadata(
        spark,
        [
            (paths["nation"], "n_nationkey"),
            (paths["customer"], "c_nationkey", "c_custkey"),
            (paths["orders"], "o_custkey", "o_orderkey"),
            (paths["lineitem"], "l_orderkey"),
        ],
    )
    assert got["n_rows"] == [
        t.nation.count(), t.customer.count(),
        t.orders.count(), t.lineitem.count(),
    ]
    dp = chain_join_order(got["n_rows"], got["edge_ndvs"])
    assert got["cost"] == dp["cost"] and got["order"] == dp["order"]
    # dimension-first on this schema: nation joins before lineitem
    assert got["order"].index(0) < got["order"].index(3)
    # 3-table restriction ≡ the original entry point's decision
    three = choose_chain_join_order_from_metadata(
        spark,
        [
            (paths["customer"], "c_custkey"),
            (paths["orders"], "o_custkey", "o_orderkey"),
            (paths["lineitem"], "l_orderkey"),
        ],
    )
    orig = choose_join_order_from_metadata(
        spark,
        (paths["customer"], "c_custkey"),
        (paths["orders"], "o_custkey", "o_orderkey"),
        (paths["lineitem"], "l_orderkey"),
    )
    # for a 3-chain the DP's single charged intermediate IS the pairwise
    # choice: lm_first ⇔ the first two tables join first
    got_first_pair = set(three["order"][:2])
    want_first_pair = {0, 1} if orig["chosen"] == "lm_first" else {1, 2}
    assert got_first_pair == want_first_pair
    assert three["est_final"] == orig["est_final_rows"]
