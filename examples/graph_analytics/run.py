#!/usr/bin/env python
"""End-to-end graph analytics over the co-purchase projection: the §2c
graph tier composed the way a market-basket analysis runs it.

    lineitem (order, part)
      → support-thresholded edges     (x115's significance gate — the
                                       step that collapses coincidence
                                       pairs and keeps the graph
                                       sublinear in scale factor)
      → connected components          (x116 min-label propagation to
                                       FIXPOINT, convergence certified
                                       by one monotone scalar/round)
      → weighted LP communities       (x118 — dense regions keep their
                                       own label where CC merges)
      → modularity audit              (x119 — exact-integer Newman Q
                                       says whether LP found structure:
                                       communities are only worth
                                       publishing if Q > 0)
      → native sketch profile         (r59/r60-style DataSketches
                                       aggregates over the community
                                       assignment — KB-sized states,
                                       no row exchange)

The modularity audit is the point: community detection without a
quality score is a guess. The script prints component counts, the
top communities, Q as both exact integers and a float, and refuses
(exit 1) if LP's Q is not strictly positive — the shape a scheduled
pipeline should have. Run:

    python examples/graph_analytics/run.py [sf_dir]

(defaults to /root/testdata/sf0.001 — finishes in ~60 s on local[*]).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from pyspark.sql import functions as F  # noqa: E402

from dwh_etl_framework_spark.session import SessionFactory  # noqa: E402
from dwh_etl_framework_spark.queries.registry import fixtures  # noqa: E402
from dwh_etl_framework_spark.queries.wave26 import (  # noqa: E402
    X115_SUPPORT,
    _copurchase_pairs,
    cc_fixpoint,
)
from dwh_etl_framework_spark.queries.wave28 import (  # noqa: E402
    X118_ROUNDS,
    louvain_move_gains,
    modularity_report,
    weighted_lp_labels,
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = SessionFactory(app_name="graph-analytics-example").build()
    spark.sparkContext.setLogLevel("ERROR")
    t = fixtures(spark, sf_dir)
    li = t.lineitem.select("l_orderkey", "l_partkey")

    # 1. significance gate: weighted edges (support = distinct orders)
    pairs = _copurchase_pairs(
        li, support=X115_SUPPORT, keep_support=True
    ).localCheckpoint()
    n_edges = pairs.count()
    n_nodes = (
        pairs.select(F.col("u").alias("n"))
        .union(pairs.select("v"))
        .distinct()
        .count()
    )
    print(f"thresholded graph: {n_nodes} nodes, {n_edges} edges")

    # 2. connected components to fixpoint (certified convergence)
    cc, rounds = cc_fixpoint(spark, pairs.select("u", "v"))
    n_components = cc.select("lbl").distinct().count()
    print(f"components: {n_components} (converged in {rounds} rounds)")

    # 3. weighted LP communities + 4. modularity audit
    labels = weighted_lp_labels(pairs, X118_ROUNDS)
    rep = modularity_report(pairs, labels)
    rows = rep.orderBy(F.col("size").desc(), F.col("community")).collect()
    if not rows:
        # ADVICE r14: a support-thresholded graph can be empty at small
        # SFs — report and bail instead of ZeroDivisionError below.
        print("FAIL: thresholded graph is empty — nothing to audit")
        spark.stop()
        return 1
    q_num, q_den = rows[0]["q_num"], rows[0]["q_den"]
    q_str = f"{q_num / q_den:+.4f}" if q_den else "undefined (q_den=0)"
    print(f"communities: {len(rows)};  Q = {q_num}/{q_den} = {q_str}")
    for r in rows[:5]:
        print(f"  community {r['community']:>6}  size {r['size']:>4}"
              f"  w_in {r['w_in']:>5}  degree-mass {r['d_c']:>5}")

    # 4b. Louvain move-gain audit: how far is LP from a local optimum?
    movers = louvain_move_gains(pairs, labels).collect()
    if movers:
        print(f"move-gain audit: {movers[0]['n_movers']} profitable "
              f"single-node moves remain (best: node "
              f"{max(movers, key=lambda r: r['rel_gain'])['node']})")
    else:
        print("move-gain audit: local optimum — no profitable move")

    # 5. native sketch profile of the assignment (engine-side, no rows)
    prof = labels.agg(
        F.expr("CAST(hll_sketch_estimate(hll_sketch_agg(lbl, 14)) "
               "AS BIGINT)").alias("approx_communities"),
        F.count(F.lit(1)).alias("n_nodes"),
    ).collect()[0]
    print(f"sketch profile: ~{prof['approx_communities']} communities over "
          f"{prof['n_nodes']} nodes (native HLL, KB-sized state)")

    ok = q_num > 0
    print("PASS: LP communities beat the null model (Q > 0)" if ok
          else "FAIL: Q <= 0 — do not publish this assignment")
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
