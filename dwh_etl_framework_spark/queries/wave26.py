"""Graph-analytics tier over the part co-purchase graph (rounds 12-13).

The classic primitives, each oracled end-to-end and each with its scale
argument spelled out:

- **x113/x113s** exact triangle counting with the degree-ordered
  orientation of Suri & Vassilvitskii, "Counting Triangles and the
  Curse of the Last Reducer" (WWW 2011): orient every edge from the
  lower (degree, id) endpoint to the higher, enumerate each triangle
  exactly once as x→y→z, and the wedge join's per-key fan-out is
  bounded by O(√m) instead of the max degree — the skew fix that makes
  the join survive a power-law graph at 100 TB.
- **x114** k-core peeling profile (Seidman / Batagelj-Zaversnik) in
  bounded rounds, plus the ``kcore_fixpoint`` convergence certificate.
- **x115** the production shape: support-threshold the edges first
  (distinct-order market-basket evidence), then count — the gate
  removes exactly the coincidence density that makes the raw
  projection quadratic-ish.
- **x116** connected components by bounded-round min-label propagation
  over the thresholded edges (round 13), with ``cc_fixpoint``; and
  ``cc_fixpoint_twostar``, the Kiveris-et-al star contraction whose
  O(log²n) rounds replace O(diameter) on chain-shaped graphs — the
  measured 64-node-path gap is pinned in tests.
- **x117** Watts-Strogatz local clustering coefficient as exact
  integer parts-per-million over the thresholded triangles (round 13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dwh_etl_framework_spark.queries.registry import fixtures, query

X113_TOPK = 10

#: both engines orient by the same spelled-out total order on
#: (degree, node id) — no engine-specific struct/row comparison.
_LOWER = "(du < dv OR (du = dv AND u < v))"


def _copurchase_pairs(
    li: DataFrame,
    support: int | None = None,
    keep_support: bool = False,
) -> DataFrame:
    """Distinct part pairs sharing an order (u < v), from a
    (l_orderkey, l_partkey) projection — the one pair builder every
    wave26 operator shares (review r12: it was copy-pasted four ways).

    With ``support``, keep only pairs co-occurring in ≥ support
    DISTINCT ORDERS. Orders, not joined line pairs: a part can repeat
    within one basket, so COUNT(*) over the join would count a
    twice-in-one-order part as support 2 — the market-basket gate is
    per-basket evidence (review r12 finding, mirrored in the oracle).
    ``keep_support`` (requires ``support``) additionally returns the
    support count as an edge-weight column — the x118 weighted graph.
    """
    if keep_support and support is None:
        raise ValueError("keep_support requires a support threshold")
    a, b = li.alias("a"), li.alias("b")
    joined = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_orderkey").alias("o"),
        F.col("a.l_partkey").alias("u"),
        F.col("b.l_partkey").alias("v"),
    )
    if support is None:
        return joined.select("u", "v").distinct()
    gated = (
        joined.groupBy("u", "v")
        .agg(F.countDistinct("o").alias("support"))
        .filter(F.col("support") >= support)
    )
    return gated if keep_support else gated.select("u", "v")


_X113_ORACLE = f"""
WITH pairs AS (
    SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
    FROM lineitem a
    JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
deg AS (
    SELECT node, CAST(COUNT(*) AS BIGINT) AS d
    FROM (SELECT u AS node FROM pairs UNION ALL SELECT v FROM pairs)
    GROUP BY node
),
oriented AS (
    SELECT CASE WHEN {_LOWER} THEN u ELSE v END AS s,
           CASE WHEN {_LOWER} THEN v ELSE u END AS t
    FROM (
        SELECT p.u, p.v, du.d AS du, dv.d AS dv
        FROM pairs p
        JOIN deg du ON du.node = p.u
        JOIN deg dv ON dv.node = p.v
    )
),
tris AS (
    SELECT e1.s AS a, e1.t AS b, e2.t AS c
    FROM oriented e1
    JOIN oriented e2 ON e2.s = e1.t
    JOIN oriented e3 ON e3.s = e1.s AND e3.t = e2.t
),
pernode AS (
    SELECT node, CAST(COUNT(*) AS BIGINT) AS tri_cnt
    FROM (SELECT a AS node FROM tris
          UNION ALL SELECT b FROM tris
          UNION ALL SELECT c FROM tris)
    GROUP BY node
),
totals AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM pairs) AS n_edges
    FROM tris
)
SELECT d.node AS part_id, d.d AS degree,
       COALESCE(pn.tri_cnt, 0) AS tri_cnt,
       g.n_triangles, g.n_edges
FROM deg d
LEFT JOIN pernode pn ON pn.node = d.node
CROSS JOIN totals g
ORDER BY tri_cnt DESC, part_id ASC
LIMIT {X113_TOPK}
"""


@query("x113_triangle_count", oracle=_X113_ORACLE)
def x113_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-tier graph analytics: exact triangle counting on the part
    co-purchase graph (distinct part pairs sharing an order), via
    degree-ordered orientation (Suri & Vassilvitskii, WWW 2011). The
    top-{X113_TOPK} nodes by triangle count (degree and global
    totals alongside) are the driver-hashed report; the oracle
    recomputes the whole pipeline — pairs, degrees, orientation,
    one-per-triangle enumeration — in portable SQL, sharing the
    spelled-out (degree, id) comparison so neither engine can orient
    differently.

    Scale shape: the quadratic pair expansion is per-ORDER (order line
    counts are bounded small — the market-basket shape), never a global
    self-join. Orientation is the skew fix: every wedge join key is a
    node's OUT-neighborhood under the (degree, id) order, bounded by
    O(√m) even on a power-law graph, so the "last reducer" hot key the
    naive adjacency join creates cannot form; each triangle is
    enumerated exactly once (x<y<z), no post-dedup exchange. Joins are
    all equi-joins on node ids — digest-sized rows, no text, and AQE
    can broadcast the degree table when it fits.

    Honest cost note (measured round 12): orientation bounds the WORST
    key, but total wedge work is Σ outdeg² — on this fixture's DENSE
    co-purchase projection (uniform part choice ⇒ avg degree ~120 at
    sf0.1) that is ~72M wedges ⇒ 8.9 s at sf0.1 (fresh-session harness;
    ~20-22 s on the same harness before the review-pass fix that
    materializes ``tris`` once — the wedge join used to re-execute
    for every consumer), so the full count is
    correctness-tier at bench scale and the benched/sf1 plan is the
    order-sampled x113s (the x02/x60 policy). Real co-purchase graphs
    are support-thresholded first — that production shape is x115,
    which removes exactly this density."""
    t = fixtures(spark, sf_dir)
    li = t.lineitem.select("l_orderkey", "l_partkey")
    return (
        triangle_report(_copurchase_pairs(li))
        .orderBy(F.col("tri_cnt").desc(), F.col("part_id").asc())
        .limit(X113_TOPK)
    )


#: sf1 twin: order-keyed deterministic 1-in-5 sample. Triangle work grows
#: with Σ outdeg² — at sf1 the FULL wedge join costs ~10× the sf0.1 run on
#: both engines (measured round 12: >9 min wall), so the full-strength
#: oracle stays sf0.01/sf0.1 and the sampled twin carries sf1 scale
#: evidence, the x94s/x99s policy. Sampling ORDERS (not edges) keeps every
#: kept basket intact, so sampled triangles are real triangles.
X113S_MOD = 5

_X113S_ORACLE = _X113_ORACLE.replace(
    "FROM lineitem a",
    f"FROM (SELECT * FROM lineitem WHERE l_orderkey % {X113S_MOD} = 0) a",
).replace(
    "JOIN lineitem b",
    f"JOIN (SELECT * FROM lineitem WHERE l_orderkey % {X113S_MOD} = 0) b",
)


@query("x113s_triangle_sampled", oracle=_X113S_ORACLE)
def x113s_triangle_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x113's sf1 scale twin: the identical orientation pipeline over the
    deterministic 1-in-{X113S_MOD} order sample (whole baskets kept, so
    every sampled triangle is a real co-purchase triangle). Exists so
    PARITY_sf1 carries triangle-count evidence at 10× bench scale while
    the full-strength x113 oracle stays at driver scale — the
    x94s/x99s policy (wedge-join work grows superlinearly with density,
    measured round 12)."""
    t = fixtures(spark, sf_dir)
    li = (
        t.lineitem.filter(F.col("l_orderkey") % X113S_MOD == 0)
        .select("l_orderkey", "l_partkey")
    )
    return (
        triangle_report(_copurchase_pairs(li))
        .orderBy(F.col("tri_cnt").desc(), F.col("part_id").asc())
        .limit(X113_TOPK)
    )


def triangle_report(
    pairs: DataFrame, include_globals: bool = True
) -> DataFrame:
    """Core x113 plan over any undirected edge list (u < v, distinct) —
    split out so the known-graph invariant tests can drive it.

    ALL THREE fan-out points are materialized once (the x87 rule):
    ``pairs`` feeds three consumers (degrees, the orientation join,
    n_edges), ``oriented`` feeds the three wedge-join arms, and —
    found by the round-12 review pass — ``tris`` feeds the per-corner
    explode AND the global count, and is by far the most expensive
    subtree. Measured: materializing ``tris`` cut the full x113 from
    19.7 to 8.9 s warm at sf0.1 (the wedge join now executes once,
    not once per consumer) and x113s from 3.2 to 2.8 s; per-corner
    attribution is a single explode pass over the materialized
    triangles instead of three unions. (Fresh-session harness both
    sides; the official warm bench reads lower absolute numbers —
    BENCH_local.json is the comparable trail.)"""
    pairs = pairs.localCheckpoint(eager=False)
    deg = (
        pairs.select(F.col("u").alias("node"))
        .unionAll(pairs.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    oriented = (
        pairs.join(du, "u")
        .join(dv, "v")
        .selectExpr(
            f"CASE WHEN {_LOWER} THEN u ELSE v END AS s",
            f"CASE WHEN {_LOWER} THEN v ELSE u END AS t",
        )
        .localCheckpoint(eager=False)
    )
    e1 = oriented.select(F.col("s").alias("a"), F.col("t").alias("b"))
    e2 = oriented.select(F.col("s").alias("b"), F.col("t").alias("c"))
    e3 = oriented.select(F.col("s").alias("a"), F.col("t").alias("c"))
    # tris is the THIRD fan-out point (three per-corner consumers + the
    # global count) and by far the most expensive subtree — without this
    # checkpoint the wedge join re-executes per consumer (review r12)
    tris = e1.join(e2, "b").join(e3, ["a", "c"]).localCheckpoint(eager=False)
    pernode = (
        tris.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("tri_cnt"))
    )
    core = deg.join(pernode, "node", "left").select(
        F.col("node").alias("part_id"),
        F.col("d").alias("degree"),
        F.coalesce("tri_cnt", F.lit(0)).cast("long").alias("tri_cnt"),
    )
    if not include_globals:
        # x117 drops the totals — skip the two global aggregate jobs
        # (Catalyst does not eliminate an unused crossJoin; review r13)
        return core
    glob = tris.agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    ).crossJoin(pairs.agg(F.count(F.lit(1)).cast("long").alias("n_edges")))
    return core.crossJoin(F.broadcast(glob))


# ---- x114: k-core peeling profile ---------------------------------------

X114_K = 64
X114_ROUNDS = 5


def _x114_oracle() -> str:
    """Unroll the peeling rounds as a CTE chain — like x108's greedy
    trajectory, one hash certifies every round's removal decision."""
    # AS MATERIALIZED is load-bearing: DuckDB inlines CTEs by default,
    # and each round references the prior round 4x — inlined, the chain
    # re-expands exponentially (measured: sf0.001 never finished).
    parts = [
        """
WITH pairs AS MATERIALIZED (
    SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
    FROM lineitem a
    JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
s0 AS MATERIALIZED (SELECT u AS node FROM pairs UNION SELECT v FROM pairs)"""
    ]
    for i in range(1, X114_ROUNDS + 1):
        p = i - 1
        parts.append(f""",
d{i} AS MATERIALIZED (
    SELECT node, CAST(COUNT(*) AS BIGINT) AS d
    FROM (
        SELECT p.u AS node FROM pairs p
        WHERE p.u IN (SELECT node FROM s{p})
          AND p.v IN (SELECT node FROM s{p})
        UNION ALL
        SELECT p.v FROM pairs p
        WHERE p.u IN (SELECT node FROM s{p})
          AND p.v IN (SELECT node FROM s{p})
    ) GROUP BY node
),
s{i} AS MATERIALIZED (SELECT node FROM d{i} WHERE d >= {X114_K})""")
    rows = ", ".join(
        f"({i}, (SELECT COUNT(*) FROM s{i-1}) - (SELECT COUNT(*) FROM s{i}),"
        f" (SELECT COUNT(*) FROM s{i}))"
        for i in range(1, X114_ROUNDS + 1)
    )
    parts.append(f"""
SELECT CAST(col0 AS BIGINT) AS round,
       CAST(col1 AS BIGINT) AS n_removed,
       CAST(col2 AS BIGINT) AS n_remaining
FROM (VALUES {rows}) t(col0, col1, col2)
ORDER BY round""")
    return "".join(parts)


_X114_ORACLE = _x114_oracle()


@query("x114_kcore_profile", oracle=_X114_ORACLE)
def x114_kcore_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-tier graph analytics: the k-core peeling trace (Seidman 1983;
    the Matula-Beck/Batagelj-Zaversnik peel) on the part co-purchase
    graph — {X114_ROUNDS} bounded rounds of "drop every node with
    fewer than {X114_K} surviving co-purchase partners", reporting
    (round, n_removed, n_remaining). Bounded-round semantics on
    purpose: the trace is deterministic at every scale factor (no
    data-dependent fixpoint claim for the oracle to chase), the fixture
    exercises real peeling (nodes keep falling below k as their
    neighbors leave), and ``kcore_fixpoint`` in tests shows the same
    rounds reach the true core when they converge. The oracle unrolls
    all rounds as one CTE chain (the x108 trajectory pattern), so a
    single driver hash certifies every round's degree computation and
    removal decision.

    Scale shape: peeling needs NO wedge work — each round is one
    degree aggregate over surviving edges plus two semi-joins
    (node-sized build sides, broadcastable), so unlike x113 the full
    dense graph stays cheap: O(rounds × edges) with edges shrinking.
    The round count is a driver-side constant, not driver data flow
    (the x77 iterative precedent), and each round's survivor frame is
    localCheckpointed to keep the lineage flat at cluster scale."""
    t = fixtures(spark, sf_dir)
    li = t.lineitem.select("l_orderkey", "l_partkey")
    pairs = _copurchase_pairs(li).localCheckpoint(eager=False)
    return kcore_profile(spark, pairs, X114_K, X114_ROUNDS)


def kcore_profile(
    spark: SparkSession, pairs: DataFrame, k: int, rounds: int
) -> DataFrame:
    """Core x114 plan over any undirected edge list (u < v, distinct)."""
    survivors = (
        pairs.select(F.col("u").alias("node"))
        .union(pairs.select(F.col("v").alias("node")))
        .distinct()
    )
    trace = []
    for rnd in range(1, rounds + 1):
        su = survivors.select(F.col("node").alias("u"))
        sv = survivors.select(F.col("node").alias("v"))
        alive = pairs.join(su, "u", "left_semi").join(sv, "v", "left_semi")
        deg = (
            alive.select(F.col("u").alias("node"))
            .unionAll(alive.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).cast("long").alias("d"))
        )
        nxt = (
            deg.filter(F.col("d") >= k)
            .select("node")
            .localCheckpoint(eager=False)
        )
        trace.append(
            survivors.agg(
                F.count(F.lit(1)).cast("long").alias("n_prev")
            ).crossJoin(
                nxt.agg(F.count(F.lit(1)).cast("long").alias("n_remaining"))
            ).select(
                F.lit(rnd).cast("long").alias("round"),
                (F.col("n_prev") - F.col("n_remaining"))
                .cast("long")
                .alias("n_removed"),
                "n_remaining",
            )
        )
        survivors = nxt
    out = trace[0]
    for t_ in trace[1:]:
        out = out.unionAll(t_)
    return out.orderBy("round")


# ---- x115: support-thresholded co-purchase triangles --------------------

X115_SUPPORT = 2

_X115_ORACLE = f"""
WITH pairs AS MATERIALIZED (
    SELECT u, v FROM (
        SELECT a.l_partkey AS u, b.l_partkey AS v,
               COUNT(DISTINCT a.l_orderkey) AS support
        FROM lineitem a
        JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
    ) WHERE support >= {X115_SUPPORT}
),
deg AS (
    SELECT node, CAST(COUNT(*) AS BIGINT) AS d
    FROM (SELECT u AS node FROM pairs UNION ALL SELECT v FROM pairs)
    GROUP BY node
),
oriented AS (
    SELECT CASE WHEN {_LOWER} THEN u ELSE v END AS s,
           CASE WHEN {_LOWER} THEN v ELSE u END AS t
    FROM (
        SELECT p.u, p.v, du.d AS du, dv.d AS dv
        FROM pairs p
        JOIN deg du ON du.node = p.u
        JOIN deg dv ON dv.node = p.v
    )
),
tris AS (
    SELECT e1.s AS a, e1.t AS b, e2.t AS c
    FROM oriented e1
    JOIN oriented e2 ON e2.s = e1.t
    JOIN oriented e3 ON e3.s = e1.s AND e3.t = e2.t
),
pernode AS (
    SELECT node, CAST(COUNT(*) AS BIGINT) AS tri_cnt
    FROM (SELECT a AS node FROM tris
          UNION ALL SELECT b FROM tris
          UNION ALL SELECT c FROM tris)
    GROUP BY node
),
totals AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM pairs) AS n_edges
    FROM tris
)
SELECT d.node AS part_id, d.d AS degree,
       COALESCE(pn.tri_cnt, 0) AS tri_cnt,
       g.n_triangles, g.n_edges
FROM deg d
LEFT JOIN pernode pn ON pn.node = d.node
CROSS JOIN totals g
ORDER BY tri_cnt DESC, part_id ASC
LIMIT {X113_TOPK}
"""


@query("x115_support_triangles", oracle=_X115_ORACLE)
def x115_support_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-tier graph analytics: x113's production shape — co-purchase
    edges are SUPPORT-THRESHOLDED (kept only when the pair co-occurs in
    ≥ {X115_SUPPORT} orders, the market-basket significance gate)
    before the same degree-oriented triangle count. Thresholding is
    what a real pipeline does first, and it removes exactly the
    random-coincidence density that makes the raw projection
    quadratic-ish: measured edges fall 8.9k→2.5k (sf0.001),
    116k→3.6k (sf0.01), 1.20M→3.9k (sf0.1) — SUBLINEAR in scale
    factor, because coincidence pairs grow with data while truly
    associated pairs saturate. Same oracle chain, same spelled-out
    orientation; one hash certifies threshold + orientation + count.

    Scale shape: the support aggregate is the x113 pair expansion plus
    one map-side-combinable groupBy (no new shuffle class); everything
    after runs on the significance-sized graph, so the wedge join that
    costs 19.7 s raw (x113's honest note) costs milliseconds here —
    the full-strength plan IS the scale plan, no sampled twin needed."""
    t = fixtures(spark, sf_dir)
    li = t.lineitem.select("l_orderkey", "l_partkey")
    return (
        triangle_report(_copurchase_pairs(li, support=X115_SUPPORT))
        .orderBy(F.col("tri_cnt").desc(), F.col("part_id").asc())
        .limit(X113_TOPK)
    )


def kcore_fixpoint(
    spark: SparkSession, pairs: DataFrame, k: int, max_rounds: int = 64
):
    """Peel to convergence: the true k-core (Batagelj-Zaversnik) as the
    fixpoint of x114's bounded rounds. Returns ``(survivors, rounds)``
    where ``survivors`` is the node frame of the k-core and ``rounds``
    is how many peels ran before a round removed nothing.

    Driver control flow is ONE SCALAR per round (the survivor count —
    the x77 iterative precedent); each round's frame is
    localCheckpointed so lineage stays flat however long the cascade
    runs. ``max_rounds`` is a runaway guard: a graph's peel depth is
    bounded by its node count, so hitting the guard means the guard is
    too small, and the function fails loud rather than returning a
    non-converged set as if it were the core."""
    pairs = pairs.localCheckpoint(eager=False)
    survivors = (
        pairs.select(F.col("u").alias("node"))
        .union(pairs.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_prev = survivors.count()
    for rnd in range(1, max_rounds + 1):
        su = survivors.select(F.col("node").alias("u"))
        sv = survivors.select(F.col("node").alias("v"))
        alive = pairs.join(su, "u", "left_semi").join(sv, "v", "left_semi")
        nxt = (
            alive.select(F.col("u").alias("node"))
            .unionAll(alive.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") >= k)
            .select("node")
            .localCheckpoint(eager=False)
        )
        n_now = nxt.count()
        if n_now == n_prev:
            return survivors, rnd - 1
        survivors, n_prev = nxt, n_now
        if n_now == 0:
            return survivors, rnd
    raise RuntimeError(
        f"k-core peel did not converge within {max_rounds} rounds — "
        "raise max_rounds (peel depth is bounded by the node count)"
    )


# ---- x116: connected components on the thresholded graph ----------------

X116_ROUNDS = 6


def _x116_oracle() -> str:
    """Unroll the label-propagation rounds as a MATERIALIZED CTE chain —
    the x114 pattern: one driver hash certifies every round's min-label
    exchange. (AS MATERIALIZED is load-bearing for the same reason as
    x114: each round references the prior round twice, and DuckDB's
    default CTE inlining would re-expand the chain exponentially.)"""
    parts = [
        f"""
WITH pairs AS MATERIALIZED (
    SELECT u, v FROM (
        SELECT a.l_partkey AS u, b.l_partkey AS v,
               COUNT(DISTINCT a.l_orderkey) AS support
        FROM lineitem a
        JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
    ) WHERE support >= {X115_SUPPORT}
),
edges AS MATERIALIZED (
    SELECT u, v FROM pairs UNION ALL SELECT v AS u, u AS v FROM pairs
),
l0 AS MATERIALIZED (
    SELECT node, node AS lbl
    FROM (SELECT u AS node FROM pairs UNION SELECT v FROM pairs)
)"""
    ]
    for i in range(1, X116_ROUNDS + 1):
        p = i - 1
        parts.append(f""",
l{i} AS MATERIALIZED (
    SELECT node, MIN(lbl) AS lbl FROM (
        SELECT node, lbl FROM l{p}
        UNION ALL
        SELECT e.v AS node, l.lbl FROM edges e JOIN l{p} l ON l.node = e.u
    ) GROUP BY node
)""")
    parts.append(f""",
comp AS (
    SELECT CAST(lbl AS BIGINT) AS component,
           CAST(COUNT(*) AS BIGINT) AS size
    FROM l{X116_ROUNDS} GROUP BY lbl
),
totals AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_components,
           CAST(SUM(size) AS BIGINT) AS n_nodes
    FROM comp
)
SELECT c.component, c.size, t.n_components, t.n_nodes
FROM comp c CROSS JOIN totals t
ORDER BY size DESC, component ASC
LIMIT {X113_TOPK}""")
    return "".join(parts)


_X116_ORACLE = _x116_oracle()


@query("x116_cc_components", oracle=_X116_ORACLE)
def x116_cc_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-tier graph analytics, round-13 depth (VERDICT r12 item 6):
    connected components of the SUPPORT-THRESHOLDED co-purchase graph
    (x115's significance-sized edges) by min-label propagation —
    {X116_ROUNDS} bounded rounds of "label(v) = min(label(v),
    min over neighbors' labels)", then the top-{X113_TOPK} components by
    size (global totals alongside). Bounded-round semantics on purpose
    (the x114 contract): after R rounds a node's label is exactly the
    minimum node id within R hops — deterministic at every scale factor
    with no data-dependent convergence claim for the oracle to chase —
    and ``cc_fixpoint`` (tests) shows the same rounds reach the true
    components when they converge. The oracle unrolls the rounds as one
    MATERIALIZED CTE chain, so a single driver hash certifies threshold
    + every propagation round + the size rollup.

    Scale shape: each round is ONE equi-join (labels into the symmetric
    edge list) plus ONE min-combine groupBy — both map-side combinable,
    no wedge work, per-round cost O(edges) with digest-sized rows. The
    support gate runs first, so the propagated graph is the
    significance-sized one (1.20M→3.9k edges at sf0.1, sublinear in SF
    — x115's measured collapse); on a graph where the threshold keeps
    edges large, the same loop holds because nothing ever fans out past
    the adjacency list. Per-round frames are localCheckpointed so
    lineage stays flat (the x77 iterative precedent); round count is a
    constant, not driver data flow."""
    t = fixtures(spark, sf_dir)
    li = t.lineitem.select("l_orderkey", "l_partkey")
    pairs = _copurchase_pairs(li, support=X115_SUPPORT)
    labels = cc_labels(pairs, X116_ROUNDS)
    comp = labels.groupBy(F.col("lbl").cast("long").alias("component")).agg(
        F.count(F.lit(1)).cast("long").alias("size")
    )
    totals = comp.agg(
        F.count(F.lit(1)).cast("long").alias("n_components"),
        F.sum("size").cast("long").alias("n_nodes"),
    )
    return (
        comp.crossJoin(F.broadcast(totals))
        .orderBy(F.col("size").desc(), F.col("component").asc())
        .limit(X113_TOPK)
    )


def cc_labels(pairs: DataFrame, rounds: int) -> DataFrame:
    """Core x116 plan over any undirected edge list (u < v, distinct):
    ``rounds`` min-label propagation steps; returns (node, lbl) where
    lbl is the minimum node id within ``rounds`` hops."""
    pairs = pairs.localCheckpoint(eager=False)
    edges = (
        pairs.select("u", "v")
        .unionAll(pairs.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .localCheckpoint(eager=False)
    )
    labels = (
        pairs.select(F.col("u").alias("node"))
        .union(pairs.select(F.col("v").alias("node")))
        .distinct()
        .withColumn("lbl", F.col("node"))
    )
    for _ in range(rounds):
        neigh = edges.join(
            labels.withColumnRenamed("node", "u"), "u"
        ).select(F.col("v").alias("node"), "lbl")
        labels = (
            labels.unionAll(neigh)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint(eager=False)
        )
    return labels


def cc_fixpoint(
    spark: SparkSession, pairs: DataFrame, max_rounds: int = 64
):
    """Propagate to convergence: the true connected components as the
    fixpoint of x116's bounded rounds. Returns ``(labels, rounds)`` —
    ``labels`` maps every node to its component's minimum node id.

    Driver control flow is ONE SCALAR per round (the sum of labels — a
    monotonically DECREASING bigint under min-propagation, so equality
    between rounds certifies the fixpoint; the kcore_fixpoint
    discipline). Converges in O(diameter) rounds; ``max_rounds`` is a
    runaway guard that fails loud rather than returning non-converged
    labels as if they were components."""
    pairs = pairs.localCheckpoint(eager=False)
    edges = (
        pairs.select("u", "v")
        .unionAll(pairs.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .localCheckpoint(eager=False)
    )
    labels = (
        pairs.select(F.col("u").alias("node"))
        .union(pairs.select(F.col("v").alias("node")))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint(eager=False)
    )
    prev_sum = labels.agg(F.sum("lbl")).collect()[0][0]
    for rnd in range(1, max_rounds + 1):
        neigh = edges.join(
            labels.withColumnRenamed("node", "u"), "u"
        ).select(F.col("v").alias("node"), "lbl")
        labels = (
            labels.unionAll(neigh)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint(eager=False)
        )
        now_sum = labels.agg(F.sum("lbl")).collect()[0][0]
        if now_sum == prev_sum:
            return labels, rnd - 1
        prev_sum = now_sum
    raise RuntimeError(
        f"label propagation did not converge within {max_rounds} rounds — "
        "raise max_rounds (round count is bounded by the graph diameter)"
    )


def cc_fixpoint_twostar(
    spark: SparkSession, pairs: DataFrame, max_rounds: int = 40
):
    """Connected components by alternating star contraction — the
    O(log²n)-round algorithm of Kiveris et al., "Connected Components in
    MapReduce and Beyond" (SoCC 2014) — as the HIGH-DIAMETER companion
    to :func:`cc_fixpoint`'s min-label propagation.

    Why both exist: label propagation converges in O(diameter) rounds —
    perfect for the thresholded co-purchase graph (diameter ~a few) but
    pathological on chain-shaped graphs (lineage chains, citation
    threads), where a 10⁶-node path needs 10⁶ rounds. Star contraction
    halves component heights instead: each round REWRITES the edge set —
    large-star hangs every node's larger neighbors onto its minimum
    neighbor, small-star re-hangs the smaller ones — so rounds grow
    logarithmically in component size, independent of diameter
    (``test_twostar_beats_label_propagation_on_a_path`` pins the gap:
    a 64-node path converges in ≤10 two-star rounds vs 63 propagation
    rounds).

    Per round: two groupBy-MIN aggregates and two equi-joins, all on
    (bigint, bigint) edges, O(edges) shuffle — same per-round cost class
    as a propagation round; frames are localCheckpointed so lineage
    stays flat. Driver control flow is TWO SCALARS per round (canonical
    edge count + xxhash64 sum — equality certifies the fixpoint; the
    kcore_fixpoint discipline). Returns ``(labels, rounds)`` with the
    same (node, lbl=component min) contract as :func:`cc_fixpoint` —
    the tests assert both algorithms produce identical labelings.
    """
    edges = (
        pairs.select("u", "v")
        .filter("u != v")
        .distinct()
        .localCheckpoint(eager=False)
    )
    all_nodes = (
        pairs.select(F.col("u").alias("node"))
        .union(pairs.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )

    def canon(e: DataFrame) -> DataFrame:
        return e.select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        ).filter("u != v").distinct()

    def large_star(e: DataFrame) -> DataFrame:
        sym = e.unionAll(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        m = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least("mn", F.col("u")).alias("m"))
        )
        # every (u,v) with v > u re-hangs v onto m(u) ≤ u < v
        return canon(
            sym.filter(F.col("v") > F.col("u"))
            .join(m, "u")
            .select(F.col("m").alias("u"), F.col("v").alias("v"))
        )

    def small_star(e: DataFrame) -> DataFrame:
        # orient big→small (canonical u<v ⇒ big = v); m over small side ∪ big
        m = (
            e.groupBy("v")
            .agg(F.min("u").alias("mn"))
            .select("v", F.least("mn", F.col("v")).alias("m"))
        )
        rehung = e.join(m, "v").select(
            F.col("m").alias("u"), F.col("u").alias("v")
        )
        self_edge = m.select(F.col("m").alias("u"), F.col("v").alias("v"))
        return canon(rehung.unionAll(self_edge))

    def fingerprint(e: DataFrame):
        # count + order-independent XOR of row hashes (the f30 checksum
        # shape — XOR cannot overflow, unlike SUM under ANSI arithmetic)
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).collect()[0]
        return row["n"], row["h"]

    prev = fingerprint(edges)
    for rnd in range(1, max_rounds + 1):
        edges = small_star(large_star(edges)).localCheckpoint(eager=False)
        now = fingerprint(edges)
        if now == prev:
            # fixpoint: a star graph — every edge is (component min, v)
            labels = (
                all_nodes.join(
                    edges.select(
                        F.col("v").alias("node"), F.col("u").alias("lbl")
                    ),
                    "node",
                    "left",
                )
                .select(
                    "node", F.coalesce("lbl", F.col("node")).alias("lbl")
                )
                # defensive MIN: at the fixpoint each non-root hangs on
                # exactly one root, so this is a no-op — but it makes the
                # extraction deterministic even if a caller hands in a
                # pre-contracted edge set one round short of the star
                .groupBy("node")
                .agg(F.min("lbl").alias("lbl"))
            )
            return labels, rnd - 1
        prev = now
    raise RuntimeError(
        f"star contraction did not converge within {max_rounds} rounds — "
        "raise max_rounds (rounds grow with log² of component size)"
    )


# ---- x117: local clustering coefficient on the thresholded graph ---------

_X117_ORACLE = f"""
WITH pairs AS MATERIALIZED (
    SELECT u, v FROM (
        SELECT a.l_partkey AS u, b.l_partkey AS v,
               COUNT(DISTINCT a.l_orderkey) AS support
        FROM lineitem a
        JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
    ) WHERE support >= {X115_SUPPORT}
),
deg AS (
    SELECT node, CAST(COUNT(*) AS BIGINT) AS d
    FROM (SELECT u AS node FROM pairs UNION ALL SELECT v FROM pairs)
    GROUP BY node
),
oriented AS (
    SELECT CASE WHEN {_LOWER} THEN u ELSE v END AS s,
           CASE WHEN {_LOWER} THEN v ELSE u END AS t
    FROM (
        SELECT p.u, p.v, du.d AS du, dv.d AS dv
        FROM pairs p
        JOIN deg du ON du.node = p.u
        JOIN deg dv ON dv.node = p.v
    )
),
tris AS (
    SELECT e1.s AS a, e1.t AS b, e2.t AS c
    FROM oriented e1
    JOIN oriented e2 ON e2.s = e1.t
    JOIN oriented e3 ON e3.s = e1.s AND e3.t = e2.t
),
pernode AS (
    SELECT node, CAST(COUNT(*) AS BIGINT) AS tri_cnt
    FROM (SELECT a AS node FROM tris
          UNION ALL SELECT b FROM tris
          UNION ALL SELECT c FROM tris)
    GROUP BY node
)
SELECT d.node AS part_id, d.d AS degree,
       COALESCE(pn.tri_cnt, 0) AS tri_cnt,
       CAST((2000000 * COALESCE(pn.tri_cnt, 0)) // (d.d * (d.d - 1))
            AS BIGINT) AS coef_ppm
FROM deg d
LEFT JOIN pernode pn ON pn.node = d.node
WHERE d.d >= 2
ORDER BY coef_ppm DESC, tri_cnt DESC, part_id ASC
LIMIT {X113_TOPK}
"""


@query("x117_clustering_coefficient", oracle=_X117_ORACLE)
def x117_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-tier graph analytics, round-13: the per-node LOCAL CLUSTERING
    COEFFICIENT (Watts-Strogatz) on the support-thresholded co-purchase
    graph — c(v) = 2·tri(v)/(d(v)·(d(v)−1)), the community-density
    feature x113's docstring promises — reported for the
    top-{X113_TOPK} nodes. The ratio is carried as EXACT integer parts
    per million (``(2000000·tri) div (d·(d−1))``, Spark ``DIV`` ≡
    DuckDB ``//``): integer arithmetic both engines evaluate
    identically, no float in the driver hash. Nodes with d < 2 are
    excluded (the coefficient is undefined — no neighbor pair exists).

    Scale shape: everything reuses x115's plan — the significance gate,
    the degree-oriented triangle enumeration (wedge key bounded O(√m)),
    the per-corner explode — plus ONE map-side arithmetic projection;
    no new shuffle class. On the raw (unthresholded) projection the
    same function applies after the x113s-style sampling tier — the
    coefficient is then an estimate, which is why the oracled query
    lives on the thresholded graph where full strength is the scale
    plan."""
    t = fixtures(spark, sf_dir)
    li = t.lineitem.select("l_orderkey", "l_partkey")
    rep = triangle_report(
        _copurchase_pairs(li, support=X115_SUPPORT), include_globals=False
    )
    return (
        rep.filter(F.col("degree") >= 2)
        .select(
            "part_id",
            "degree",
            "tri_cnt",
            F.expr(
                "CAST((2000000 * tri_cnt) DIV (degree * (degree - 1)) "
                "AS BIGINT)"
            ).alias("coef_ppm"),
        )
        .orderBy(
            F.col("coef_ppm").desc(),
            F.col("tri_cnt").desc(),
            F.col("part_id").asc(),
        )
        .limit(X113_TOPK)
    )
