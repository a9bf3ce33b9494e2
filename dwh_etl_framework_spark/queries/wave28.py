"""Round-14 additions: the native top-k sketch surface + weighted
label propagation.

Two tiers land here. **r59** productizes the round-14 environment
re-probe's one LIVE discovery (the r53/r54/r58 precedent): Spark 4.1
registers the DataSketches frequent-items family as SQL aggregates —
``approx_top_k`` plus the distributed three-step
``approx_top_k_accumulate`` / ``approx_top_k_combine`` /
``approx_top_k_estimate`` — the engine-native counterpart of the
portable CMS top-k tier (``operators/sketch.py``, x86). The probe
exercises the full distributed-merge path (partial states per group →
combine → estimate), which is exactly how the aggregate executes on a
1000-executor cluster: accumulate is map-side per partition, combine
is the exchange, estimate is a driver-cheap extraction.

Oracle-ability: DataSketches frequent-items is EXACT whenever the
number of distinct items fits ``maxItemsTracked`` (no eviction ever
fires), so with NDV(p_brand)=25 ≪ 4096 the sketch IS a group-count,
and emitting all items as rows (k ≥ NDV) removes tie-order ambiguity
— the DuckDB twin is a plain GROUP BY. The same argument the portable
HLL/CMS tier uses for its exact-audit oracles.

**x118** is VERDICT r13 item 6: weighted label propagation over the
support-thresholded co-purchase graph — the community detector that
x116's min-label connected components can't express (CC merges
everything reachable; LP lets dense regions keep their own label).
Bounded synchronous rounds with a total tie order make it
deterministic and DuckDB-unrollable (the x114/x116 MATERIALIZED CTE
chain pattern).

Reference anchor: the reference framework has no sketch or graph tier
at all (``airflow_etl.py`` moves rows; every aggregate is a Greenplum
passthrough) — both tiers are repo-native capabilities a training-data
pipeline needs at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dwh_etl_framework_spark.queries.registry import fixtures, query
from dwh_etl_framework_spark.queries.wave26 import (
    X113_TOPK,
    X115_SUPPORT,
    _copurchase_pairs,
)

#: sketch capacity for r59 — far above NDV(p_brand)=25, so the
#: frequent-items sketch is provably in exact mode (no eviction)
R59_MAX_TRACKED = 4096
#: emitted k — above NDV, so EVERY brand appears as a row and the
#: sketch's tie order among equal counts never reaches the output
R59_K = 40

_R59_ORACLE = """
SELECT p_brand AS brand, CAST(COUNT(*) AS BIGINT) AS cnt
FROM part
GROUP BY p_brand
"""


@query("r59_native_topk_sketch", oracle=_R59_ORACLE)
def r59_native_topk_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-surface probe (round 14): the native DataSketches
    frequent-items aggregate, exercised through its DISTRIBUTED form —
    ``approx_top_k_accumulate`` builds one partial state per p_type
    group (map-side partials; p_type has ~150 distinct values in TPC-H
    part, so ~150 states), ``approx_top_k_combine`` merges those states
    (the exchange step), ``approx_top_k_estimate`` extracts the
    item/count pairs. With ``maxItemsTracked``={R59_MAX_TRACKED} ≫
    NDV(p_brand)=25 the sketch never evicts, so the estimate is exact
    and the driver hash against a plain GROUP BY certifies the whole
    accumulate→combine→estimate path end-to-end. k={R59_K} ≥ NDV emits
    every brand, so no tie-order reaches the checked rows.

    Scale shape: identical to any partial-aggregate — states are KB-
    sized regardless of input rows, the only exchange is 6 sketch blobs,
    and the same three-step split is what keeps a 100 TB top-k at one
    pass with no row shuffle (the portable-CMS x86 argument, now with
    the engine-native aggregate)."""
    fixtures(spark, sf_dir)
    return spark.sql(f"""
        WITH states AS (
            SELECT approx_top_k_accumulate(p_brand, {R59_MAX_TRACKED}) AS st
            FROM part
            GROUP BY p_type
        ),
        merged AS (
            SELECT approx_top_k_estimate(
                       approx_top_k_combine(st, {R59_MAX_TRACKED}),
                       {R59_K}) AS tk
            FROM states
        )
        SELECT e.item AS brand, CAST(e.count AS BIGINT) AS cnt
        FROM merged LATERAL VIEW explode(tk) AS e
    """)


#: r60 — HLL lgConfigK: σ ≈ 1.04/√2^14 ≈ 0.81%, so the ±3% audit band
#: is ≈ 3.7σ; below a few thousand distincts the sketch's sparse mode
#: is near-exact anyway
R60_LGK = 14
#: r61 — theta lgNomEntries: 2^20 ≈ 1.05M nominal entries, far above
#: the part-key set sizes at every tested SF (~190k at sf1), so every
#: sketch AND every set-operation result stays in EXACT mode
R61_LGK = 20

_R60_ORACLE = """
SELECT o_orderpriority AS grp,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_exact,
       TRUE AS hll_ok
FROM orders GROUP BY o_orderpriority
UNION ALL
SELECT 'ALL', CAST(COUNT(DISTINCT o_custkey) AS BIGINT), TRUE FROM orders
"""


@query("r60_native_hll_ndv", oracle=_R60_ORACLE)
def r60_native_hll_ndv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-surface probe (round 14): the native DataSketches HLL
    family — ``hll_sketch_agg`` per group, ``hll_union_agg`` across the
    group states (the distributed merge), ``hll_sketch_estimate`` to
    extract. HLL is never exact, so this uses the x84 exact-audit
    pattern adapted for a non-portable sketch: the checked columns are
    the EXACT per-group NDV plus ``hll_ok`` — the estimate within ±3%
    (≈3.7σ at lgK={R60_LGK}) — and the oracle emits the exact counts
    with TRUE. The estimate is deterministic for fixed input (hash-
    based, no RNG), so the boolean is hash-stable; a real drift at any
    SF flips it to FALSE and the driver goes red. Upgrades the NDV
    tier's honest weakness (portable HLL at m=64, ±13% σ —
    costing-grade) with an engine-native ±0.8% path.

    Scale shape: per-group states are KB-sized; the union exchange
    carries 5 sketch blobs; the exact audit is the only row-weight and
    exists FOR the oracle (production uses the sketch alone)."""
    fixtures(spark, sf_dir)
    return spark.sql(f"""
        WITH states AS (
            SELECT o_orderpriority AS grp,
                   hll_sketch_agg(o_custkey, {R60_LGK}) AS st,
                   COUNT(DISTINCT o_custkey) AS n_exact
            FROM orders GROUP BY o_orderpriority
        ),
        per AS (
            SELECT grp, n_exact,
                   CAST(hll_sketch_estimate(st) AS BIGINT) AS est
            FROM states
        ),
        gl AS (
            SELECT 'ALL' AS grp,
                   (SELECT COUNT(DISTINCT o_custkey) FROM orders) AS n_exact,
                   CAST(hll_sketch_estimate(hll_union_agg(st, true))
                        AS BIGINT) AS est
            FROM states
        )
        SELECT grp, CAST(n_exact AS BIGINT) AS n_exact,
               (abs(est - n_exact) * 100 <= 3 * n_exact) AS hll_ok
        FROM (SELECT * FROM per UNION ALL SELECT * FROM gl)
    """)


_R61_ORACLE = """
WITH flags AS (
    SELECT l_partkey,
           BOOL_OR(l_quantity <= 5) AS lo,
           BOOL_OR(l_quantity >= 46) AS hi
    FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CASE WHEN lo THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
       CAST(SUM(CASE WHEN hi THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
       CAST(SUM(CASE WHEN lo OR hi THEN 1 ELSE 0 END) AS BIGINT) AS n_union,
       CAST(SUM(CASE WHEN lo AND hi THEN 1 ELSE 0 END) AS BIGINT) AS n_inter,
       CAST(SUM(CASE WHEN lo AND NOT hi THEN 1 ELSE 0 END) AS BIGINT)
           AS n_low_only
FROM flags
"""


@query("r61_theta_set_algebra", oracle=_R61_ORACLE)
def r61_theta_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-surface probe (round 14): DataSketches THETA sketches —
    the sketch family that supports SET ALGEBRA (union, intersection,
    difference), which HLL cannot. One scan builds two part-key
    sketches with FILTER clauses (low-quantity vs high-quantity
    baskets); the report is |A|, |B|, |A∪B|, |A∩B|, |A−B| — all five
    from the sketches, all EXACT because at lgNomEntries={R61_LGK}
    (2^20 nominal) every sketch and every derived result stays below
    capacity at every tested SF, so the driver hash against DuckDB's
    exact per-key BOOL_OR flags certifies the whole algebra.

    Trap pinned live (tests): ``theta_union(a, b)`` WITHOUT the
    explicit lgNomEntries arg defaults to 2^12 nominal and silently
    DOWNSAMPLES an exact 150k-row union into a ±estimate — the same
    class of silent degradation as f44's DECIMAL rounding; the lgK
    must ride every union call, not just the accumulators.

    Scale shape: one pass, two KB..MB-sized states, zero row exchange;
    set algebra over arbitrary predicates without re-scanning — the
    capability the warehouse's overlap/containment audits want at
    100 TB. Production accepts the estimate above capacity; the exact
    regime here exists to make the surface hash-certifiable."""
    fixtures(spark, sf_dir)
    return spark.sql(f"""
        WITH s AS (
            SELECT theta_sketch_agg(l_partkey, {R61_LGK})
                       FILTER (WHERE l_quantity <= 5) AS sa,
                   theta_sketch_agg(l_partkey, {R61_LGK})
                       FILTER (WHERE l_quantity >= 46) AS sb
            FROM lineitem
        )
        SELECT CAST(theta_sketch_estimate(sa) AS BIGINT) AS n_low,
               CAST(theta_sketch_estimate(sb) AS BIGINT) AS n_high,
               CAST(theta_sketch_estimate(theta_union(sa, sb, {R61_LGK}))
                    AS BIGINT) AS n_union,
               CAST(theta_sketch_estimate(theta_intersection(sa, sb))
                    AS BIGINT) AS n_inter,
               CAST(theta_sketch_estimate(theta_difference(sa, sb))
                    AS BIGINT) AS n_low_only
        FROM s
    """)


X118_ROUNDS = 4


def _x118_oracle() -> str:
    """Unroll the weighted-LP rounds as a MATERIALIZED CTE chain — the
    x116 pattern, with the per-round argmax spelled out as
    ROW_NUMBER over (weight DESC, label ASC). AS MATERIALIZED is
    load-bearing: each round references the prior round once inside an
    aggregate-over-join; default inlining would re-expand the chain."""
    parts = [
        f"""
WITH pairs AS MATERIALIZED (
    SELECT u, v, support AS w FROM (
        SELECT a.l_partkey AS u, b.l_partkey AS v,
               COUNT(DISTINCT a.l_orderkey) AS support
        FROM lineitem a
        JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
    ) WHERE support >= {X115_SUPPORT}
),
edges AS MATERIALIZED (
    SELECT u, v, w FROM pairs UNION ALL SELECT v AS u, u AS v, w FROM pairs
),
l0 AS MATERIALIZED (
    SELECT node, node AS lbl
    FROM (SELECT u AS node FROM pairs UNION SELECT v FROM pairs)
)"""
    ]
    for i in range(1, X118_ROUNDS + 1):
        p = i - 1
        parts.append(f""",
l{i} AS MATERIALIZED (
    SELECT node, lbl FROM (
        SELECT e.v AS node, l.lbl, SUM(e.w) AS wt,
               ROW_NUMBER() OVER (
                   PARTITION BY e.v
                   ORDER BY SUM(e.w) DESC, l.lbl ASC
               ) AS rn
        FROM edges e JOIN l{p} l ON l.node = e.u
        GROUP BY e.v, l.lbl
    ) WHERE rn = 1
)""")
    parts.append(f""",
comm AS (
    SELECT CAST(lbl AS BIGINT) AS community,
           CAST(COUNT(*) AS BIGINT) AS size
    FROM l{X118_ROUNDS} GROUP BY lbl
),
totals AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_communities,
           CAST(SUM(size) AS BIGINT) AS n_nodes
    FROM comm
)
SELECT c.community, c.size, t.n_communities, t.n_nodes
FROM comm c CROSS JOIN totals t
ORDER BY size DESC, community ASC
LIMIT {X113_TOPK}""")
    return "".join(parts)


_X118_ORACLE = _x118_oracle()


@query("x118_weighted_label_prop", oracle=_X118_ORACLE)
def x118_weighted_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-tier graph analytics, round-14 depth (VERDICT r13 item 6):
    community detection by WEIGHTED label propagation (Raghavan et al.
    2007, synchronous variant) over the support-thresholded co-purchase
    graph — x116's edges, but carrying their support counts as weights.
    Each of {X118_ROUNDS} bounded rounds every node adopts the label
    with the greatest total incident edge weight among its neighbors,
    ties broken by the SMALLER label — a total order, so the synchronous
    update is deterministic at every scale factor and the oracle can
    unroll it as one MATERIALIZED CTE chain (the x114/x116 pattern: a
    single driver hash certifies threshold + weights + every argmax
    round + the size rollup). Unlike x116's min-label CC — which merges
    everything reachable — weighted LP lets densely-connected regions
    keep distinct communities, the market-basket segmentation shape.

    Scale shape: each round is ONE equi-join (labels into the symmetric
    weighted edge list) + ONE map-side-combinable SUM groupBy + ONE
    argmax groupBy (min over a (−weight, label) struct — no window, no
    skew pivot), per-round cost O(edges). The support gate runs first
    (1.20M→3.9k edges at sf0.1, x115's measured collapse); per-round
    frames are localCheckpointed so lineage stays flat (the x77
    discipline); round count is a constant, never driver data flow."""
    t = fixtures(spark, sf_dir)
    li = t.lineitem.select("l_orderkey", "l_partkey")
    labels = weighted_lp_labels(
        _copurchase_pairs(li, support=X115_SUPPORT, keep_support=True),
        X118_ROUNDS,
    )
    comm = labels.groupBy(F.col("lbl").cast("long").alias("community")).agg(
        F.count(F.lit(1)).cast("long").alias("size")
    )
    totals = comm.agg(
        F.count(F.lit(1)).cast("long").alias("n_communities"),
        F.sum("size").cast("long").alias("n_nodes"),
    )
    return (
        comm.crossJoin(F.broadcast(totals))
        .orderBy(F.col("size").desc(), F.col("community").asc())
        .limit(X113_TOPK)
    )


def _x119_oracle() -> str:
    """x118's unrolled LP chain, then Newman weighted modularity over
    the final labels in EXACT integer arithmetic: per community,
    intra-community weight w_in and degree-sum d_c; globally
    q_num = 4·m·Σw_in − Σd_c², q_den = 4·m² (so Q = q_num/q_den).
    The division itself is never performed — q can be negative, and
    truncating vs flooring integer division differ across engines for
    negatives (the one trap the x117 ppm pattern did not have to face),
    so the checked columns are the exact integer terms."""
    chain = _x118_oracle()
    head = chain[: chain.index(",\ncomm AS (")]
    return head + f""",
deg AS MATERIALIZED (
    SELECT node, CAST(SUM(w) AS BIGINT) AS d FROM (
        SELECT u AS node, w FROM pairs UNION ALL SELECT v, w FROM pairs
    ) GROUP BY node
),
intra AS (
    SELECT la.lbl AS lbl, CAST(SUM(p.w) AS BIGINT) AS w_in
    FROM pairs p
    JOIN l{X118_ROUNDS} la ON la.node = p.u
    JOIN l{X118_ROUNDS} lb ON lb.node = p.v AND lb.lbl = la.lbl
    GROUP BY la.lbl
),
dsum AS (
    SELECT la.lbl, CAST(SUM(d.d) AS BIGINT) AS d_c,
           CAST(COUNT(*) AS BIGINT) AS size
    FROM l{X118_ROUNDS} la JOIN deg d ON d.node = la.node
    GROUP BY la.lbl
),
comm AS (
    SELECT CAST(ds.lbl AS BIGINT) AS community, ds.size,
           CAST(COALESCE(i.w_in, 0) AS BIGINT) AS w_in, ds.d_c
    FROM dsum ds LEFT JOIN intra i ON i.lbl = ds.lbl
),
mt AS (SELECT CAST(SUM(w) AS BIGINT) AS m FROM pairs),
gq AS (
    SELECT CAST(4 * mt.m * (SELECT SUM(w_in) FROM comm)
                - (SELECT SUM(d_c * d_c) FROM comm) AS BIGINT) AS q_num,
           CAST(4 * mt.m * mt.m AS BIGINT) AS q_den
    FROM mt
)
SELECT c.community, c.size, c.w_in, c.d_c, g.q_num, g.q_den
FROM comm c CROSS JOIN gq g
ORDER BY size DESC, community ASC
LIMIT {X113_TOPK}"""


_X119_ORACLE = _x119_oracle()


@query("x119_community_modularity", oracle=_X119_ORACLE)
def x119_community_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-tier graph analytics (round 14): Newman WEIGHTED modularity of
    the x118 communities — the quality score that says whether label
    propagation actually found structure (Q > 0) or noise. Carried as
    EXACT integers (the x117 discipline, one step further): the checked
    columns are q_num = 4·m·Σw_in − Σd_c² and q_den = 4·m² — the
    division is never performed, because Q can be NEGATIVE and
    truncating (Spark DIV) vs flooring (some engines) integer division
    disagree below zero; exact integer terms sidestep the trap
    entirely. Per-community rows carry (size, w_in, d_c) so the hash
    certifies every community's intra-weight and degree mass, not just
    the global score.

    Scale shape: on top of x118's O(edges)-per-round labels, modularity
    is TWO label joins into the edge list + three map-side-combinable
    SUM aggregates — no new shuffle class, no wedge work; the global
    terms are one scalar row broadcast back onto the community rows."""
    t = fixtures(spark, sf_dir)
    li = t.lineitem.select("l_orderkey", "l_partkey")
    pairs = _copurchase_pairs(li, support=X115_SUPPORT, keep_support=True)
    labels = weighted_lp_labels(pairs, X118_ROUNDS)
    return (
        modularity_report(pairs, labels)
        .orderBy(F.col("size").desc(), F.col("community").asc())
        .limit(X113_TOPK)
    )


def modularity_report(pairs: DataFrame, labels: DataFrame) -> DataFrame:
    """Core x119 plan over any weighted undirected edge list (u < v
    distinct, weight column ``support``) and any (node, lbl) labeling:
    one row per community with (community, size, w_in, d_c) plus the
    global exact-integer modularity terms (q_num, q_den) replicated —
    Q = q_num/q_den = Σ_c [w_in_c/m − (d_c/2m)²]."""
    w = pairs.select("u", "v", F.col("support").alias("w"))
    lab_u = labels.select(F.col("node").alias("u"), F.col("lbl").alias("lu"))
    lab_v = labels.select(F.col("node").alias("v"), F.col("lbl").alias("lv"))
    intra = (
        w.join(lab_u, "u")
        .join(lab_v, "v")
        .filter(F.col("lu") == F.col("lv"))
        .groupBy(F.col("lu").alias("lbl"))
        .agg(F.sum("w").cast("long").alias("w_in"))
    )
    deg = (
        w.select(F.col("u").alias("node"), "w")
        .unionAll(w.select(F.col("v").alias("node"), "w"))
        .groupBy("node")
        .agg(F.sum("w").cast("long").alias("d"))
    )
    dsum = (
        labels.join(deg, "node")
        .groupBy("lbl")
        .agg(
            F.sum("d").cast("long").alias("d_c"),
            F.count(F.lit(1)).cast("long").alias("size"),
        )
    )
    comm = (
        dsum.join(intra, "lbl", "left")
        .select(
            F.col("lbl").cast("long").alias("community"),
            "size",
            F.coalesce(F.col("w_in"), F.lit(0)).cast("long").alias("w_in"),
            "d_c",
        )
    )
    m = w.agg(F.sum("w").cast("long").alias("m"))
    glob = (
        comm.agg(
            F.sum("w_in").cast("long").alias("sw"),
            F.sum(F.col("d_c") * F.col("d_c")).cast("long").alias("sd2"),
        )
        .crossJoin(F.broadcast(m))
        .select(
            (4 * F.col("m") * F.col("sw") - F.col("sd2"))
            .cast("long")
            .alias("q_num"),
            (4 * F.col("m") * F.col("m")).cast("long").alias("q_den"),
        )
    )
    return comm.crossJoin(F.broadcast(glob))


_R62_ORACLE = """
SELECT path, o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
FROM orders
CROSS JOIN (SELECT 'exec' AS path UNION ALL SELECT 'var') p
WHERE o_orderstatus = 'F' AND o_totalprice >= 50000.0
GROUP BY path, o_orderpriority
"""


@query("r62_session_variables", oracle=_R62_ORACLE)
def r62_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-surface probe (round 14): SQL session variables
    (``DECLARE [OR REPLACE] VARIABLE`` / ``SET VAR``) and ``EXECUTE
    IMMEDIATE ... USING`` — the IN-ENGINE counterpart of the
    reference's param-template family (F10, ``airflow_etl.py``
    renders parameters into SQL text OUTSIDE the engine; here the
    engine owns declaration, typing, and binding). The same filtered
    report runs through BOTH mechanisms — direct variable references
    in the predicate, and the identical query text bound via
    EXECUTE IMMEDIATE positional USING args — tagged with a ``path``
    column; the oracle emits every row under both tags, so one driver
    hash certifies variable resolution ≡ immediate binding ≡ literal
    inlining. ``DECLARE OR REPLACE`` keeps the query re-runnable in a
    shared session (registry queries must be idempotent).

    Scale shape: variables are session-scoped scalars resolved at
    analysis time — the bound plan is byte-identical to the literal
    plan (filter pushdown, codegen unchanged); nothing about the
    mechanism touches the distributed path."""
    fixtures(spark, sf_dir)
    spark.sql(
        "DECLARE OR REPLACE VARIABLE r62_min_price DOUBLE DEFAULT 0.0"
    )
    spark.sql("SET VAR r62_min_price = 50000.0")
    spark.sql(
        "DECLARE OR REPLACE VARIABLE r62_status STRING DEFAULT 'F'"
    )
    report = """
        SELECT o_orderpriority AS priority,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders
        WHERE o_orderstatus = {status} AND o_totalprice >= {minp}
        GROUP BY o_orderpriority
    """
    via_var = spark.sql(
        report.format(status="r62_status", minp="r62_min_price")
    ).withColumn("path", F.lit("var"))
    exec_sql = report.format(status="?", minp="?").replace("'", "\\'")
    via_exec = spark.sql(
        f"EXECUTE IMMEDIATE '{exec_sql}' USING 'F', 50000.0"
    ).withColumn("path", F.lit("exec"))
    return via_var.unionByName(via_exec)


#: x120 — movers reported (size of the audit slice, the X113_TOPK rule)
X120_TOPK = 20


def _x120_oracle() -> str:
    """x118's unrolled LP chain, then one Louvain move-gain scan over
    the final labels, all denominators cleared to exact integers:
    gain_units(i→C) = 2·m·w(i,C) − k_i·(d_C − k_i·[C = cur(i)]) — the
    standard Louvain insertion gain ×2m² with node i removed from its
    community first. The STAY option is materialized explicitly (a
    node with zero intra-community edges has no (i, cur) candidate
    row), best is argmax over (gain DESC, community ASC), and a mover
    is a node whose best community differs with a strictly positive
    relative gain."""
    chain = _x118_oracle()
    head = chain[: chain.index(",\ncomm AS (")]
    L = f"l{X118_ROUNDS}"
    return head + f""",
deg AS MATERIALIZED (
    SELECT node, CAST(SUM(w) AS BIGINT) AS k_i FROM (
        SELECT u AS node, w FROM pairs UNION ALL SELECT v, w FROM pairs
    ) GROUP BY node
),
dsum AS MATERIALIZED (
    SELECT la.lbl, CAST(SUM(d.k_i) AS BIGINT) AS d_c
    FROM {L} la JOIN deg d ON d.node = la.node GROUP BY la.lbl
),
mt AS (SELECT CAST(SUM(w) AS BIGINT) AS m FROM pairs),
nw AS MATERIALIZED (
    SELECT e.u AS node, l.lbl AS c, CAST(SUM(e.w) AS BIGINT) AS w_ic
    FROM edges e JOIN {L} l ON l.node = e.v GROUP BY e.u, l.lbl
),
cand AS (
    SELECT nw.node, la.lbl AS cur, d.k_i, nw.c,
           2 * mt.m * nw.w_ic
             - d.k_i * (ds.d_c
                        - CASE WHEN nw.c = la.lbl THEN d.k_i ELSE 0 END)
               AS gu
    FROM nw
    JOIN {L} la ON la.node = nw.node
    JOIN deg d ON d.node = nw.node
    JOIN dsum ds ON ds.lbl = nw.c
    CROSS JOIN mt
),
stay AS (
    SELECT la.node, la.lbl AS cur, d.k_i, la.lbl AS c,
           2 * mt.m * COALESCE(nw.w_ic, 0)
             - d.k_i * (ds.d_c - d.k_i) AS gu
    FROM {L} la
    JOIN deg d ON d.node = la.node
    JOIN dsum ds ON ds.lbl = la.lbl
    LEFT JOIN nw ON nw.node = la.node AND nw.c = la.lbl
    CROSS JOIN mt
),
ranked AS (
    SELECT node, cur, c, gu,
           ROW_NUMBER() OVER (
               PARTITION BY node ORDER BY gu DESC, c ASC
           ) AS rn
    FROM (SELECT node, cur, c, gu FROM cand WHERE c <> cur
          UNION ALL SELECT node, cur, c, gu FROM stay)
),
best AS (
    SELECT r.node, r.cur, r.c AS best_c, r.gu - s.gu AS rel_gain
    FROM ranked r JOIN stay s ON s.node = r.node
    WHERE r.rn = 1
),
movers AS (
    SELECT CAST(node AS BIGINT) AS node, CAST(cur AS BIGINT) AS from_c,
           CAST(best_c AS BIGINT) AS to_c, CAST(rel_gain AS BIGINT)
               AS rel_gain
    FROM best WHERE best_c <> cur AND rel_gain > 0
),
totals AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_movers,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM {L}) AS n_nodes
    FROM movers
)
SELECT mv.node, mv.from_c, mv.to_c, mv.rel_gain,
       t.n_movers, t.n_nodes
FROM movers mv CROSS JOIN totals t
ORDER BY rel_gain DESC, node ASC
LIMIT {X120_TOPK}"""


_X120_ORACLE = _x120_oracle()


@query("x120_louvain_move_gains", oracle=_X120_ORACLE)
def x120_louvain_move_gains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-tier graph analytics (round 14): one Louvain move-gain scan
    (Blondel et al. 2008, phase-1 step) over the x118 communities —
    for every node, the best community to move to and the EXACT
    relative modularity gain, with all denominators cleared:
    gain_units(i→C) = 2·m·w(i,C) − k_i·(d_C − k_i·[C = cur]) is the
    insertion gain ×2m² after removing i from its own community, so
    comparing gain_units IS comparing ΔQ — integer-exact, no float in
    the driver hash (the x119 discipline). The STAY option is
    materialized explicitly (a node with no intra-community edge has
    no (i, cur) aggregate row), best = argmax(gain DESC, community
    ASC) — a total order — and the report is the top-{X120_TOPK}
    movers by relative gain with global totals. This is the audit a
    scheduled community pipeline runs between LP rounds: a large
    mover count with large gains means the labeling is far from a
    local optimum.

    Scale shape: ONE equi-join builds the (node, neighbor-community)
    weight aggregate (O(edges) rows in, ≤ adjacency out), then
    node-sized joins against the degree/community-mass tables; the
    argmax is a per-node MIN over a (−gain, community) struct — map-
    side combinable, no skew pivot (the x118 rule); m is one broadcast
    scalar."""
    t = fixtures(spark, sf_dir)
    li = t.lineitem.select("l_orderkey", "l_partkey")
    pairs = _copurchase_pairs(li, support=X115_SUPPORT, keep_support=True)
    labels = weighted_lp_labels(pairs, X118_ROUNDS)
    return (
        louvain_move_gains(pairs, labels)
        .orderBy(F.col("rel_gain").desc(), F.col("node").asc())
        .limit(X120_TOPK)
    )


def louvain_move_gains(pairs: DataFrame, labels: DataFrame) -> DataFrame:
    """Core x120 plan over any weighted undirected edge list (u < v
    distinct, weight column ``support``) and any (node, lbl) labeling:
    one row per MOVER — (node, from_c, to_c, rel_gain) with global
    (n_movers, n_nodes) replicated — where rel_gain is the exact
    integer 2m²-scaled modularity gain of the best move vs staying."""
    w = pairs.select("u", "v", F.col("support").alias("w"))
    edges = w.unionAll(
        w.select(F.col("v").alias("u"), F.col("u").alias("v"), "w")
    )
    deg = (
        edges.groupBy(F.col("u").alias("node"))
        .agg(F.sum("w").cast("long").alias("k_i"))
    )
    dsum = (
        labels.join(deg, "node")
        .groupBy("lbl")
        .agg(F.sum("k_i").cast("long").alias("d_c"))
    )
    m = w.agg(F.sum("w").cast("long").alias("m"))
    nw = (
        edges.join(
            labels.select(F.col("node").alias("v"), F.col("lbl").alias("c")),
            "v",
        )
        .groupBy(F.col("u").alias("node"), "c")
        .agg(F.sum("w").cast("long").alias("w_ic"))
    )
    base = (
        labels.withColumnRenamed("lbl", "cur")
        .join(deg, "node")
        .crossJoin(F.broadcast(m))
    )
    cand = (
        base.join(nw, "node")
        .filter(F.col("c") != F.col("cur"))
        .join(dsum.withColumnRenamed("lbl", "c"), "c")
        .select(
            "node", "cur",
            F.col("c"),
            (
                2 * F.col("m") * F.col("w_ic")
                - F.col("k_i") * F.col("d_c")
            ).cast("long").alias("gu"),
        )
    )
    stay = (
        base.join(dsum.withColumnRenamed("lbl", "cur"), "cur")
        .join(
            nw.withColumnRenamed("c", "cur").withColumnRenamed(
                "w_ic", "w_cur"
            ),
            ["node", "cur"],
            "left",
        )
        .select(
            "node", "cur",
            F.col("cur").alias("c"),
            (
                2 * F.col("m") * F.coalesce(F.col("w_cur"), F.lit(0))
                - F.col("k_i") * (F.col("d_c") - F.col("k_i"))
            ).cast("long").alias("gu"),
        )
    )
    best = (
        cand.unionByName(stay)
        .groupBy("node", "cur")
        .agg(
            F.min(
                F.struct(
                    (-F.col("gu")).alias("neg_gu"), F.col("c").alias("c")
                )
            ).alias("b")
        )
        .select(
            "node", "cur",
            F.col("b.c").alias("best_c"),
            (-F.col("b.neg_gu")).alias("gu_best"),
        )
    )
    rel = (
        best.join(stay.select("node", F.col("gu").alias("gu_stay")), "node")
        .select(
            F.col("node").cast("long").alias("node"),
            F.col("cur").cast("long").alias("from_c"),
            F.col("best_c").cast("long").alias("to_c"),
            (F.col("gu_best") - F.col("gu_stay"))
            .cast("long")
            .alias("rel_gain"),
        )
        .filter((F.col("to_c") != F.col("from_c")) & (F.col("rel_gain") > 0))
    )
    totals = rel.agg(
        F.count(F.lit(1)).cast("long").alias("n_movers")
    ).crossJoin(
        F.broadcast(
            labels.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        )
    )
    return rel.crossJoin(F.broadcast(totals))


#: x121 — BFS rounds (bounded, the x114/x116 contract)
X121_HOPS = 4


def _x121_oracle() -> str:
    """Thresholded edges, a DETERMINISTIC seed (max weighted degree,
    ties to the smaller node id — a total order), then the reachable
    set unrolled one MATERIALIZED CTE per hop; the report is one row
    per hop with cumulative and newly-reached counts."""
    chain = _x118_oracle()
    head = chain[: chain.index(",\nl0 AS MATERIALIZED (")]
    parts = [head + """,
deg AS MATERIALIZED (
    SELECT node, CAST(SUM(w) AS BIGINT) AS d FROM (
        SELECT u AS node, w FROM pairs UNION ALL SELECT v, w FROM pairs
    ) GROUP BY node
),
r0 AS MATERIALIZED (
    SELECT node FROM deg ORDER BY d DESC, node ASC LIMIT 1
)"""]
    for i in range(1, X121_HOPS + 1):
        p = i - 1
        parts.append(f""",
r{i} AS MATERIALIZED (
    SELECT DISTINCT node FROM (
        SELECT node FROM r{p}
        UNION ALL
        SELECT e.v AS node FROM edges e JOIN r{p} ON r{p}.node = e.u
    )
)""")
    counts = ", ".join(
        f"(SELECT COUNT(*) FROM r{i}) AS c{i}"
        for i in range(0, X121_HOPS + 1)
    )
    rows = " UNION ALL ".join(
        f"SELECT {i} AS hop, CAST(c{i} AS BIGINT) AS n_reached, "
        f"CAST(c{i} - c{i-1} AS BIGINT) AS n_new, "
        f"(SELECT CAST(node AS BIGINT) FROM r0) AS seed FROM cts"
        for i in range(1, X121_HOPS + 1)
    )
    parts.append(f""",
cts AS (SELECT {counts})
{rows}
ORDER BY hop""")
    return "".join(parts)


_X121_ORACLE = _x121_oracle()


@query("x121_khop_reach", oracle=_X121_ORACLE)
def x121_khop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-tier graph analytics (round 14): bounded-round BFS — the
    k-hop reachability profile from a DETERMINISTIC seed (the node of
    maximum weighted degree, ties to the smaller id) over the
    support-thresholded co-purchase graph. One row per hop 1..{X121_HOPS}
    with cumulative and newly-reached counts — the distance LAYERING
    that x116's component labels cannot give (a component says "same
    island"; the profile says how fast the island is covered — the
    hop-cost estimate a graph-walk planner or a dedup-cluster
    expansion budget needs). Bounded rounds are the oracle contract
    (the x114/x116 pattern): hop i is exactly "reachable within i
    edges", deterministic at every SF, each hop one MATERIALIZED CTE.

    Scale shape: each hop is ONE equi-join of the frontier set into
    the adjacency plus ONE distinct — node-set-sized exchanges only,
    no fan-out past the adjacency list; the reached frame is
    localCheckpointed per hop (the x77 discipline); the seed pick is
    one TakeOrdered over the degree aggregate. The REPORT is
    count-only, so nothing node-sized ever reaches the driver."""
    t = fixtures(spark, sf_dir)
    li = t.lineitem.select("l_orderkey", "l_partkey")
    pairs = _copurchase_pairs(li, support=X115_SUPPORT, keep_support=True)
    return khop_profile(spark, pairs, X121_HOPS)


def khop_profile(
    spark: SparkSession, pairs: DataFrame, hops: int
) -> DataFrame:
    """Core x121 plan over any weighted undirected edge list (u < v
    distinct, weight column ``support``): seed = max weighted degree
    (ties → smaller id), then ``hops`` frontier expansions; returns one
    row per hop — (hop, n_reached, n_new, seed). Driver traffic is one
    scalar count per hop plus the seed id (the x77/x116 discipline)."""
    w = pairs.select("u", "v", F.col("support").alias("w"))
    edges = w.unionAll(
        w.select(F.col("v").alias("u"), F.col("u").alias("v"), "w")
    ).localCheckpoint(eager=False)
    deg = edges.groupBy(F.col("u").alias("node")).agg(
        F.sum("w").cast("long").alias("d")
    )
    seed = deg.orderBy(F.col("d").desc(), F.col("node").asc()).limit(1)
    seed_rows = seed.collect()
    if not seed_rows:
        # ADVICE r14: a support-thresholded graph can be EMPTY at some
        # SF — return the empty profile (schema unchanged) instead of
        # IndexError-ing on the seed collect below.
        return spark.createDataFrame(
            [], "hop INT, n_reached BIGINT, n_new BIGINT, seed BIGINT"
        )
    reached = seed.select("node").localCheckpoint(eager=False)
    counts = [reached.count()]
    for _ in range(hops):
        frontier = edges.join(
            reached.withColumnRenamed("node", "u"), "u"
        ).select(F.col("v").alias("node"))
        reached = (
            reached.unionAll(frontier)
            .distinct()
            .localCheckpoint(eager=False)
        )
        counts.append(reached.count())
    seed_id = seed_rows[0]["node"]
    rows = [
        (i, counts[i], counts[i] - counts[i - 1], seed_id)
        for i in range(1, hops + 1)
    ]
    return spark.createDataFrame(
        rows, "hop INT, n_reached BIGINT, n_new BIGINT, seed BIGINT"
    ).orderBy("hop")


def weighted_lp_labels(pairs: DataFrame, rounds: int) -> DataFrame:
    """Core x118 plan over any weighted undirected edge list
    (u < v distinct, weight column ``support``): ``rounds`` synchronous
    weighted-LP steps; returns (node, lbl). Argmax is expressed as
    ``min(struct(-total_weight, label))`` — a plain map-side-combinable
    aggregate, deliberately NOT a row_number window (no per-node
    partition pivot, no skew hazard on high-degree nodes)."""
    pairs = pairs.select(
        "u", "v", F.col("support").alias("w")
    ).localCheckpoint(eager=False)
    edges = (
        pairs.select("u", "v", "w")
        .unionAll(
            pairs.select(
                F.col("v").alias("u"), F.col("u").alias("v"), "w"
            )
        )
        .localCheckpoint(eager=False)
    )
    labels = (
        pairs.select(F.col("u").alias("node"))
        .union(pairs.select(F.col("v").alias("node")))
        .distinct()
        .withColumn("lbl", F.col("node"))
    )
    for _ in range(rounds):
        scored = (
            edges.join(labels.withColumnRenamed("node", "u"), "u")
            .groupBy(F.col("v").alias("node"), "lbl")
            .agg(F.sum("w").alias("wt"))
        )
        labels = (
            scored.groupBy("node")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("wt")).alias("neg_wt"),
                        F.col("lbl").alias("lbl"),
                    )
                ).alias("best")
            )
            .select("node", F.col("best.lbl").alias("lbl"))
            .localCheckpoint(eager=False)
        )
    return labels
