"""Round-10 closing wave: two more classic decorrelation/agg-reuse
stress shapes the DWH audit tier runs daily — Q2's correlated MIN
across a multi-dim join and Q15's max-of-grouped-aggregate — each one
ANSI text executed verbatim in BOTH engines, so the driver hash
certifies Catalyst's rewrite against DuckDB's.

Reference anchor: these are exactly the ``spark.sql`` report steps the
reference's transform tier ships wholesale (``airflow_etl.py:251``,
README.md:135-150) — the framework's job is to not get them wrong.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dwh_etl_framework_spark.queries.registry import fixtures, query

#: Q2-shaped correlated MIN: for each part, the EUROPE supplier(s)
#: matching the region-wide minimum supply cost for that part. The
#: fixture has no partsupp table, so the supply relation is derived
#: from observed order lines — MIN exact-cents price per (part,
#: supplier) — which keeps every cost an exact BIGINT (no float
#: boundary can flip the correlated equality). The correlated scalar
#: re-reads the SAME CTE through its own dim chain, which is the shape
#: that forces the decorrelate-aggregate-then-join-back rewrite over a
#: multi-join subtree (r16b only correlated against one table).
_R35_SQL = """
WITH supply AS (
    SELECT l_partkey AS partkey, l_suppkey AS suppkey,
           MIN(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS cost_cents
    FROM lineitem
    GROUP BY 1, 2
)
SELECT p.p_partkey AS p_partkey, p.p_type AS p_type, s.s_name AS s_name,
       n.n_name AS n_name, sp.cost_cents AS cost_cents
FROM part p
JOIN supply sp ON sp.partkey = p.p_partkey
JOIN supplier s ON s.s_suppkey = sp.suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'EUROPE'
  AND sp.cost_cents = (
      SELECT MIN(sp2.cost_cents)
      FROM supply sp2
      JOIN supplier s2 ON s2.s_suppkey = sp2.suppkey
      JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
      JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
      WHERE sp2.partkey = p.p_partkey AND r2.r_name = 'EUROPE')
ORDER BY cost_cents, p_partkey, s_name
LIMIT 100
"""


@query("r35_min_cost_supplier", oracle=_R35_SQL)
def r35_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R-tier stress: TPC-H Q2's shape — a correlated scalar MIN whose
    subquery is itself a MULTI-JOIN (supply → supplier → nation →
    region), correlated on the outer part key. Catalyst must
    decorrelate the aggregate over the whole join subtree into a
    per-partkey MIN joined back; DuckDB does its own rewrite; the
    driver hash pins them equal. Completes the correlated-subquery
    triptych: r15c (EXISTS/NOT EXISTS → semi/anti), r16b (scalar agg
    over one table), r35 (scalar agg over a join tree).

    Scale shape: the supply CTE is one (part, supplier)-keyed
    aggregate of the fact; the decorrelated minimum re-aggregates the
    SAME relation per part — both exchanges key on the part key, so
    AQE plans one skew-splittable family; the three dims broadcast
    (plan pinned in tests/test_wave18.py: no cartesian, no window).
    The region filter prunes before either aggregate at 100 TB when
    supply is maintained as a materialized table partitioned by
    region — here it is derived inline because the fixture has no
    partsupp (supply-cost) table."""
    fixtures(spark, sf_dir)
    return spark.sql(_R35_SQL)


#: Q15-shaped aggregate-of-aggregate: suppliers whose exact-cents
#: revenue equals the global maximum of the per-supplier revenue
#: aggregate — the CTE is referenced twice (probe + scalar MAX), the
#: classic shared-subplan report shape. Revenue folds to exact cents
#: through one float product evaluated with identical association in
#: both engines.
_R36_SQL = """
WITH revenue AS (
    SELECT l_suppkey AS suppkey,
           CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS rev_cents
    FROM lineitem
    GROUP BY 1
)
SELECT s.s_suppkey AS s_suppkey, s.s_name AS s_name, n.n_name AS n_name,
       rv.rev_cents AS rev_cents
FROM supplier s
JOIN revenue rv ON rv.suppkey = s.s_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE rv.rev_cents = (SELECT MAX(rev_cents) FROM revenue)
ORDER BY s_suppkey
"""


@query("r36_top_revenue_supplier", oracle=_R36_SQL)
def r36_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R-tier stress: TPC-H Q15's shape — a grouped aggregate consumed
    twice, once as the probe side and once reduced to a scalar MAX
    gating the probe (ties all surface; no LIMIT needed for
    determinism). Exercises shared-CTE planning plus the
    scalar-subquery-of-aggregate path, none of which r15c/r16b/r35
    touch.

    Scale shape: ONE fact aggregate keyed on l_suppkey (supplier-count
    sized output), the MAX is a scalar over that small result, the dim
    joins broadcast. At 100 TB the only heavy exchange is the revenue
    groupBy, map-side partially aggregated (plan pinned in
    tests/test_wave18.py: no cartesian, single fact scan feeding a
    reused CTE or two scans of the same map-side-combined aggregate —
    either is linear)."""
    fixtures(spark, sf_dir)
    return spark.sql(_R36_SQL)


#: PII patterns shared verbatim by both engines. Java regex and RE2
#: agree on everything used here (char classes, bounded repetition,
#: greedy non-overlapping scan, \b) — no lookaround, no backrefs, so
#: the redaction is engine-portable by construction.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+1-\d{3}-\d{4}"

#: The fixture documents carry no digits at all, so the adversarial
#: input is synthesized deterministically from the customer table —
#: IDENTICALLY in both engines — with one email, one phone and one
#: must-NOT-redact account number per row (the negative control).
_X106_SQL = f"""
WITH synth AS (
    SELECT c_custkey AS id,
           'contact ' || lower(replace(c_name, '#', '.'))
               || '@example.com or call +1-555-'
               || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
               || ' re account ' || CAST(c_custkey AS VARCHAR) AS text
    FROM customer
)
SELECT id,
       CAST(len(regexp_extract_all(text, '{PII_EMAIL}')) AS BIGINT)
           AS n_emails,
       CAST(len(regexp_extract_all(text, '{PII_PHONE}')) AS BIGINT)
           AS n_phones,
       regexp_replace(regexp_replace(text, '{PII_EMAIL}', '<EMAIL>', 'g'),
                      '{PII_PHONE}', '<PHONE>', 'g') AS redacted
FROM synth
"""


@query("x106_pii_redaction", oracle=_X106_SQL)
def x106_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3-tier PII detection + redaction — the scrub every LLM training
    pipeline runs before anything else ships (emails, phone numbers;
    the pattern table extends the same way for SSNs/IPs/keys). Counts
    are detected per document and the text is rewritten with typed
    placeholders; the account number survives as the negative control
    (redaction must not eat adjacent non-PII digits).

    Scale shape: map-only — regexp_extract_all/regexp_replace run
    inside whole-stage codegen on the JVM, zero shuffles, zero UDFs;
    at 100 TB this is a pure scan-rewrite pass that composes with
    compaction. The driver hash certifies Java-regex and RE2 semantics
    agree on the shared pattern subset (no lookaround/backrefs).
    ``tests/test_wave18.py`` pins the redacted text is PII-free and
    the control survives."""
    t = fixtures(spark, sf_dir)
    text = F.concat(
        F.lit("contact "),
        F.lower(F.replace(F.col("c_name"), F.lit("#"), F.lit("."))),
        F.lit("@example.com or call +1-555-"),
        F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0"),
        F.lit(" re account "),
        F.col("c_custkey").cast("string"),
    )
    synth = t.customer.select(F.col("c_custkey").alias("id"), text.alias("text"))
    return synth.select(
        "id",
        F.size(F.regexp_extract_all("text", F.lit(PII_EMAIL), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(PII_PHONE), F.lit(0)))
        .cast("long")
        .alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace("text", PII_EMAIL, "<EMAIL>"),
            PII_PHONE,
            "<PHONE>",
        ).alias("redacted"),
    )


#: Q13-shaped double aggregation over a LEFT join with a JOIN-SIDE
#: predicate (the classic custdist report): per-customer count of
#: qualifying orders (pending AND above the price bar — ~10% of
#: customers have none at every SF, so the zero bucket is real),
#: INCLUDING zero-order customers: the left join must not drop them
#: and the predicate must live in the ON clause — in WHERE it would
#: turn the join inner and silently lose the zero bucket.
_R37_SQL = """
SELECT n_orders,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM (
    SELECT c.c_custkey AS c_custkey,
           CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
    FROM customer c
    LEFT JOIN orders o
           ON o.o_custkey = c.c_custkey
          AND o.o_orderstatus = 'P' AND o.o_totalprice > 150000
    GROUP BY c.c_custkey
) dist
GROUP BY n_orders
"""


@query("r37_customer_order_distribution", oracle=_R37_SQL)
def r37_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R-tier stress: TPC-H Q13's shape — aggregate-of-aggregate over a
    LEFT join whose filter sits in the ON clause. Two properties no
    other registry entry pins together: (1) the join-side predicate
    must not collapse the outer join (zero-order customers survive into
    the n_orders=0 bucket — COUNT(o.o_orderkey) counts non-NULLs, not
    rows); (2) the second aggregate keys on the FIRST aggregate's
    output. Same ANSI text in both engines.

    Scale shape: one orderkey-per-customer aggregate (customer-count
    sized output, map-side partial combine on the join exchange), then
    a histogram-sized second aggregate — the classic two-step reduce
    whose second exchange is tiny. At 100 TB the only heavy exchange is
    the first, keyed on the customer key, AQE-skew-splittable (plan
    pinned in tests/test_wave18.py: no cartesian, no window)."""
    fixtures(spark, sf_dir)
    return spark.sql(_R37_SQL)


#: Q8-shaped conditional-aggregate market share: a nation's fraction of
#: yearly supply revenue. Revenue folds to exact BIGINT cents (HUGEINT
#: capped with explicit casts), so both SUMs are exact integers and the
#: final share is ONE double division of identical operands — the only
#: float op in the query, bit-identical across engines.
_R38_SQL = """
WITH rev AS (
    SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS yr,
           n.n_name AS nation,
           CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100)
                AS BIGINT) AS cents
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
)
SELECT yr,
       CAST(SUM(CASE WHEN nation = 'GERMANY' THEN cents ELSE 0 END)
            AS BIGINT) AS germany_cents,
       CAST(SUM(cents) AS BIGINT) AS total_cents,
       CAST(CAST(SUM(CASE WHEN nation = 'GERMANY' THEN cents ELSE 0 END)
                 AS DOUBLE)
            / CAST(SUM(cents) AS DOUBLE) AS DOUBLE) AS germany_share
FROM rev
GROUP BY yr
"""


@query("r38_nation_market_share", oracle=_R38_SQL)
def r38_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R-tier stress: TPC-H Q8's shape — conditional aggregation inside
    a ratio (SUM(CASE)/SUM over the same group), per order year across
    a four-relation join. The numeric discipline is the point: both
    numerator and denominator are exact integer cents, so the one
    double division at the end is bit-identical in both engines — the
    pattern every share/percentage report should follow instead of
    dividing per-row floats and summing.

    Scale shape: one orderkey exchange joins the fact pair, supplier/
    nation broadcast, then a single year-keyed aggregate with map-side
    partial combine (handfuls of groups → tiny exchange). Plan pinned
    cartesian/window-free in tests/test_wave18.py."""
    fixtures(spark, sf_dir)
    return spark.sql(_R38_SQL)


#: Q20-shaped THREE-LEVEL nested correlated subquery: an IN whose
#: subquery's HAVING is gated by a correlated scalar that itself
#: contains a GROUP BY subquery (MAX over per-supplier sums for the
#: correlated part). Quantities are integral doubles, so every sum is
#: exact BIGINT and the top-share equality cannot flip on float order.
#: (A fixed >50%%-share threshold was probed first: empty at every SF —
#: parts have too many suppliers — so the gate is the per-part MAX,
#: which is non-empty by construction.)
_R39_SQL = """
SELECT s.s_suppkey AS s_suppkey, s.s_name AS s_name
FROM supplier s
WHERE s.s_suppkey IN (
    SELECT l.l_suppkey
    FROM lineitem l
    WHERE l.l_partkey IN (
        SELECT p_partkey FROM part WHERE p_type = 'PROMO')
    GROUP BY l.l_suppkey, l.l_partkey
    HAVING SUM(CAST(l.l_quantity AS BIGINT)) = (
        SELECT MAX(sq) FROM (
            SELECT SUM(CAST(l2.l_quantity AS BIGINT)) AS sq
            FROM lineitem l2
            WHERE l2.l_partkey = l.l_partkey
            GROUP BY l2.l_suppkey))
)
ORDER BY s_suppkey
"""


@query("r39_dominant_promo_supplier", oracle=_R39_SQL)
def r39_dominant_promo_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R-tier stress: TPC-H Q20's shape, deepened — a THREE-level nested
    correlated subquery: the outer IN's subquery groups the fact, its
    HAVING compares against a correlated scalar, and that scalar is
    itself a MAX over a GROUP BY subquery (the top per-supplier share
    of the correlated promo part). Catalyst must decorrelate the nested
    grouped aggregate into a per-partkey MAX-of-sums joined back INSIDE
    the IN-subquery, then rewrite the IN to a left-semi — the composed
    path r15c/r16b/r35 each exercise only one level of. Same ANSI text
    in both engines; driver hash certifies the composition.

    Scale shape: the inner decorrelated aggregate and the grouped probe
    both key on l_partkey (one exchange family), the part filter
    broadcasts into both as a semi-join, the final IN is a
    supplier-keyed left-semi — every exchange keyed, no cartesian, no
    window (plan pinned in tests/test_wave18.py)."""
    fixtures(spark, sf_dir)
    return spark.sql(_R39_SQL)
