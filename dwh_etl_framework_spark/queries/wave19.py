"""Round-11 wave: the nine remaining TPC-H report shapes (VERDICT r10
item 2) — Q3, Q7, Q9, Q10, Q12, Q14, Q18, Q19, Q22 — each one ANSI text
executed verbatim in BOTH engines (Spark via ``spark.sql``, DuckDB as
the oracle), so one driver hash certifies the whole optimizer path:
join ordering, decorrelation, conditional aggregation, disjunctive
predicate extraction.

Together with r14b (Q5), r15c (Q21), r16 (Q1), r16b (Q17), r35 (Q2),
r36 (Q15), r37 (Q13), r38 (Q8), r39 (Q20) this completes the TPC-H
shape suite over the fixture schema.

Reference anchor: these are exactly the ``spark.sql`` report steps the
reference's transform tier ships wholesale (``airflow_etl.py:251``,
README.md:135-150).

Fixture adaptations (the driver tables lack some TPC-H columns):

- no ``partsupp`` → Q9's supply cost proxies as 10% of retail price per
  unit (any deterministic per-row expression exercises the same plan);
- no ``l_shipmode`` → Q12 groups by ``l_returnflag`` (same conditional
  CASE-agg over a fact join shape);
- no ``c_phone`` → Q22's country code is the last-two digits of the
  zero-padded ``c_name`` key, and "never ordered" relaxes to "inactive
  since 2000" (the anti-join keeps matches at every SF);
- Q7's nation pair widens to two 3-nation sets so sf0.001 still has
  matching supplier/customer routes.

Exact-cents discipline throughout (registry docstring): every SUM folds
``CAST(floor(double_expr * 100) AS BIGINT)`` — the only doubles that
reach a reduction are already integers — and closing ratios divide two
exact integers once. ``year()`` casts to INT on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dwh_etl_framework_spark.queries.registry import fixtures, query

_CENTS = "CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)"

#: Q3 — shipping priority: top-10 undelivered orders by revenue for one
#: market segment at a cutoff date.
_R40_SQL = f"""
SELECT l.l_orderkey AS o_orderkey,
       CAST(SUM({_CENTS}) AS BIGINT) AS revenue_cents,
       o.o_orderdate AS o_orderdate,
       o.o_orderpriority AS o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15'
  AND l.l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue_cents DESC, o_orderdate, o_orderkey
LIMIT 10
"""


@query("r40_shipping_priority", oracle=_R40_SQL)
def r40_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R-tier stress, TPC-H Q3 shape: segment-filtered 3-table join with
    opposed date predicates on two tables, grouped revenue, total-order
    top-10 (revenue DESC with date+key tiebreaks).

    Scale shape: both date filters and the segment filter push into the
    scans; the orderkey groupBy reuses the lineitem⋈orders exchange key,
    and customer (segment-pruned to ~1/5) broadcasts. Plan pinned
    cartesian-free in tests/test_wave19.py."""
    fixtures(spark, sf_dir)
    return spark.sql(_R40_SQL)


#: Q7 — volume shipping between two nation groups, by direction and year.
_R41_SQL = f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(volume_cents) AS BIGINT) AS revenue_cents
FROM (
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS l_year,
           {_CENTS} AS volume_cents
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
            AND n2.n_name IN ('NATION_4', 'NATION_5', 'NATION_6'))
        OR (n1.n_name IN ('NATION_4', 'NATION_5', 'NATION_6')
            AND n2.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')))
      AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                           AND TIMESTAMP '1997-12-31'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@query("r41_volume_shipping", oracle=_R41_SQL)
def r41_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R-tier stress, TPC-H Q7 shape: the same dimension table (nation)
    joined TWICE under different roles, a disjunctive cross-pair filter
    spanning both copies, then a 3-key rollup by direction and year.

    Scale shape: both nation copies broadcast; the disjunction over the
    two broadcast keys filters before the grouped aggregate, which is
    keyed on low-cardinality (nation, nation, year) — partial aggregation
    collapses it map-side. The only large exchanges are the fact joins
    on their natural keys. Plan pinned cartesian-free."""
    fixtures(spark, sf_dir)
    return spark.sql(_R41_SQL)


#: Q9 — product-type profit by supplier nation and order year; supply
#: cost proxies as 10% of retail per unit (no partsupp in the fixture).
_R42_SQL = f"""
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS INT) AS o_year,
       CAST(SUM({_CENTS}
                - CAST(floor(p.p_retailprice * l.l_quantity * 10) AS BIGINT))
            AS BIGINT) AS profit_cents
FROM part p
JOIN lineitem l ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_name LIKE '%red%'
GROUP BY n.n_name, CAST(year(o.o_orderdate) AS INT)
ORDER BY nation, o_year DESC
"""


@query("r42_product_profit", oracle=_R42_SQL)
def r42_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R-tier stress, TPC-H Q9 shape: a LIKE-filtered part dimension
    gating a five-table join, profit = revenue minus cost folded
    per-row to exact cents, rolled up by (nation, year) with a mixed
    ASC/DESC sort.

    Scale shape: the LIKE filter prunes part BEFORE the fact join (the
    selective dim drives the probe); part/supplier/nation broadcast;
    the (nation, year) aggregate is tiny and partially aggregated
    map-side. The orders join is the one big exchange. Plan pinned
    cartesian-free."""
    fixtures(spark, sf_dir)
    return spark.sql(_R42_SQL)


#: Q10 — returned-item losses per customer for one quarter, top 20.
_R43_SQL = f"""
SELECT c.c_custkey AS c_custkey, c.c_name AS c_name,
       CAST(SUM({_CENTS}) AS BIGINT) AS revenue_cents,
       CAST(floor(c.c_acctbal * 100) AS BIGINT) AS acctbal_cents,
       n.n_name AS n_name
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue_cents DESC, c_custkey
LIMIT 20
"""


@query("r43_returned_items", oracle=_R43_SQL)
def r43_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R-tier stress, TPC-H Q10 shape: quarter-windowed fact join with a
    flag filter, customer-grained aggregation carrying four passthrough
    group keys, revenue top-20.

    Scale shape: the quarter filter prunes orders at the scan; the
    customer-keyed aggregate output is bounded by |customer|; nation
    broadcasts; the top-20 is a TakeOrderedAndProject, never a full
    sort. Plan pinned cartesian-free."""
    fixtures(spark, sf_dir)
    return spark.sql(_R43_SQL)


#: Q12 — conditional priority counts by return class for one year
#: (l_returnflag stands in for the missing l_shipmode).
_R44_SQL = """
SELECT l.l_returnflag AS ship_class,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_linestatus = 'F'
  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l.l_returnflag
ORDER BY ship_class
"""


@query("r44_priority_by_class", oracle=_R44_SQL)
def r44_priority_by_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R-tier stress, TPC-H Q12 shape: fact⋈fact join where the GROUP
    key comes from one side and both CASE aggregates read the OTHER —
    the join must deliver matched pairs before any aggregation can
    fold, yet the 3-row output still partially aggregates after the
    join.

    Scale shape: year+status filters prune lineitem at the scan (the
    selective side), the join keys on orderkey, and the post-join
    aggregate is 3 groups — map-side combine collapses it. Plan pinned
    cartesian-free."""
    fixtures(spark, sf_dir)
    return spark.sql(_R44_SQL)


#: Q14 — promo revenue share for one month: exact integer numerator and
#: denominator plus ONE closing division (the r38 ratio discipline).
_R45_SQL = f"""
SELECT CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%' THEN {_CENTS} ELSE 0 END)
            AS BIGINT) AS promo_cents,
       CAST(SUM({_CENTS}) AS BIGINT) AS total_cents,
       CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%' THEN {_CENTS} ELSE 0 END)
            AS DOUBLE) * 100.0
           / CAST(SUM({_CENTS}) AS DOUBLE) AS promo_share_pct
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
  AND l.l_shipdate < TIMESTAMP '1997-04-01'
"""


@query("r45_promo_share", oracle=_R45_SQL)
def r45_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R-tier stress, TPC-H Q14 shape: a single-row global aggregate
    where the numerator is a CASE-gated copy of the denominator
    expression, closed by one ratio. Both operands stay exact BIGINT
    cents; the one double division is bit-stable across engines.

    Scale shape: the month filter prunes lineitem to ~1.2% at the scan;
    part broadcasts; the aggregate is scalar (all partial). Plan pinned
    cartesian-free."""
    fixtures(spark, sf_dir)
    return spark.sql(_R45_SQL)


#: Q18 — large-volume orders: IN over a HAVING subquery on the same fact.
_R46_SQL = """
SELECT c.c_name AS c_name, c.c_custkey AS c_custkey,
       o.o_orderkey AS o_orderkey, o.o_orderdate AS o_orderdate,
       CAST(floor(o.o_totalprice * 100) AS BIGINT) AS total_cents,
       CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey
    HAVING SUM(CAST(l_quantity AS BIGINT)) > 180)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY total_cents DESC, o_orderkey
LIMIT 100
"""


@query("r46_large_volume_orders", oracle=_R46_SQL)
def r46_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R-tier stress, TPC-H Q18 shape: an IN predicate whose subquery is
    a grouped HAVING over the SAME fact being joined — the aggregate
    must run once as a semi-join build side, then the outer query
    re-aggregates the surviving orders with passthrough keys.

    Scale shape: the HAVING aggregate and the outer join both key on
    orderkey, so one exchange family serves semi-join and final
    aggregate; the quantity sums are exact BIGINT (quantities are
    integral doubles). Top-100 is TakeOrdered. Plan pinned
    cartesian-free."""
    fixtures(spark, sf_dir)
    return spark.sql(_R46_SQL)


#: Q19 — disjunctive multi-clause join predicate: three brand/size/qty
#: bands OR-ed INSIDE the join condition.
_R47_SQL = f"""
SELECT CAST(SUM({_CENTS}) AS BIGINT) AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
   AND ((p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
         AND l.l_quantity BETWEEN 1 AND 11)
     OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
         AND l.l_quantity BETWEEN 10 AND 20)
     OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
         AND l.l_quantity BETWEEN 20 AND 30))
"""


@query("r47_disjunctive_bands", oracle=_R47_SQL)
def r47_disjunctive_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R-tier stress, TPC-H Q19 shape: the equi-key plus a disjunction
    of brand/size/quantity bands in the JOIN condition itself — the
    optimizer must keep the hash join on partkey and evaluate the OR as
    a post-probe residual rather than degrade to a nested loop.

    Scale shape: part broadcasts (dim-sized), the residual runs inside
    the broadcast probe, output is a single row of exact cents. The
    plan probe pins BroadcastHashJoin and no CartesianProduct — the
    exact failure mode this query exists to catch."""
    fixtures(spark, sf_dir)
    return spark.sql(_R47_SQL)


#: Q22 — inactive big-balance customers by "country code" (last two
#: digits of the zero-padded customer name). The average-balance gate is
#: the cross-multiplied INTEGER comparison bal*n > sum — no double
#: average ever materializes, so the boundary cannot flip between
#: engines.
_R48_SQL = """
WITH pool AS (
    SELECT c_custkey, substring(c_name, 17, 2) AS cntrycode,
           CAST(floor(c_acctbal * 100) AS BIGINT) AS bal_cents
    FROM customer
    WHERE substring(c_name, 17, 2)
          IN ('05', '10', '17', '23', '25', '31', '36',
              '41', '48', '59', '62', '74', '88', '93')
),
avg_pos AS (
    SELECT CAST(SUM(bal_cents) AS BIGINT) AS s,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM pool WHERE bal_cents > 0
)
SELECT p.cntrycode AS cntrycode,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(p.bal_cents) AS BIGINT) AS totacctbal_cents
FROM pool p, avg_pos a
WHERE p.bal_cents * a.n > a.s
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = p.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY p.cntrycode
ORDER BY cntrycode
"""


@query("r48_inactive_big_balance", oracle=_R48_SQL)
def r48_inactive_big_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R-tier stress, TPC-H Q22 shape: substring-derived grouping code,
    an aggregate-over-subset gate applied back to the superset, and a
    correlated NOT EXISTS anti-join with its own date predicate. The
    average-balance threshold compares bal*n > sum in exact integers
    (cross-multiplication) instead of materializing a double average —
    the one TPC-H query whose canonical form has a float boundary.

    Scale shape: the code filter prunes customer at the scan; avg_pos
    is a 1-row broadcast; the anti-join keys on custkey against a
    date-pruned orders scan. All exchanges are customer-sized. Plan
    pinned cartesian-free (the 1-row cross join broadcasts)."""
    fixtures(spark, sf_dir)
    return spark.sql(_R48_SQL)


# ---- x107: structured-ID PII with checksum validation ------------------


def _luhn_fold(term: str) -> str:
    """One doubled-digit fold: 2d, minus 9 when 2d > 9."""
    return f"(CASE WHEN {term} >= 5 THEN 2*{term} - 9 ELSE 2*{term} END)"


def luhn_sum_sql(col: str, n: int) -> str:
    """The Luhn sum of an ``n``-digit string column as ONE arithmetic
    SQL expression — no regex, no UDF, pure substring+CASE+add, so it
    runs identically in Spark (whole-stage codegen) and DuckDB and at
    100 TB costs a fixed ~3n scalar ops per row.

    Digit positions are 1-based from the LEFT of the final ID; for a
    16-digit ID the check digit is position 16, and doubling applies to
    every second digit starting from the second-from-right — i.e. the
    ODD left-positions. The same rule holds for the 15-digit payload
    (its digits keep their final positions), so one helper serves both
    generation (check-digit derivation) and validation."""
    terms = []
    for i in range(1, n + 1):
        d = f"CAST(substring({col}, {i}, 1) AS INT)"
        terms.append(_luhn_fold(d) if i % 2 == 1 else d)
    return "(" + " + ".join(terms) + ")"


def luhn_check_digit_sql(payload_col: str, n_payload: int) -> str:
    """The check digit completing ``payload_col`` to a Luhn-valid ID."""
    return f"CAST((10 - {luhn_sum_sql(payload_col, n_payload)} % 10) % 10 AS INT)"


#: x107 — card-number detection with CHECKSUM validation (Luhn, pure
#: arithmetic — regex alone cannot tell a real card number from 16
#: random digits) plus an allowlist column control. The fixture
#: documents carry no digits, so the adversarial input synthesizes one
#: 16-digit candidate per customer IDENTICALLY in both engines: even
#: keys get a correct check digit (true PII), odd keys a corrupted one
#: (the checksum negative control), and every 7th row is allowlisted
#: (the governance negative control: a valid ID that must survive, e.g.
#: a documented test card).
_X107_SQL = f"""
WITH synth AS (
    SELECT c_custkey AS id,
           lpad(CAST((c_custkey * 7919 + 12345) % 1000000000000000
                     AS STRING), 15, '0') AS payload,
           c_custkey % 2 = 0 AS mk_valid,
           c_custkey % 7 = 0 AS allowlisted
    FROM customer
),
carded AS (
    SELECT id, allowlisted,
           payload || CAST(CASE WHEN mk_valid
                                THEN {luhn_check_digit_sql("payload", 15)}
                                ELSE ({luhn_check_digit_sql("payload", 15)}
                                      + 5) % 10
                           END AS STRING) AS card
    FROM synth
),
texted AS (
    SELECT id, allowlisted,
           'card ' || card || ' ref ' || CAST(id AS STRING) AS text
    FROM carded
),
scored AS (
    SELECT id, allowlisted, text,
           regexp_extract(text, '[0-9]{{16}}', 0) AS candidate
    FROM texted
)
SELECT id,
       CAST(CASE WHEN candidate <> '' THEN 1 ELSE 0 END AS BIGINT)
           AS n_candidates,
       CAST(CASE WHEN candidate = '' THEN 0
                 WHEN {luhn_sum_sql("candidate", 16)} % 10 = 0 THEN 1
                 ELSE 0 END AS BIGINT) AS luhn_valid,
       allowlisted,
       CASE WHEN candidate = '' THEN text
            WHEN {luhn_sum_sql("candidate", 16)} % 10 = 0
                 AND NOT allowlisted
            THEN replace(text, candidate, '<CARD>')
            ELSE text END AS redacted
FROM scored
"""
# NOTE (review r11): the Luhn fold is guarded by a CASE *branch*, never a
# bare AND conjunct — SQL engines may evaluate conjuncts vectorized
# (non-lazily), and DuckDB's CAST(substring('', i, 1) AS INT) errors on
# the rows with no 16-digit candidate; CASE is the portable lazy guard.


@query("x107_pii_luhn_redaction", oracle=_X107_SQL)
def x107_pii_luhn_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3-tier PII depth (VERDICT r10 item 7): structured-ID detection
    where the regex only NOMINATES candidates and a checksum VALIDATES
    them — the Luhn digit fold as pure arithmetic expressions
    (:func:`luhn_sum_sql`), because 16 digits that fail the checksum
    are not a card number and redacting them is data loss. An
    allowlist column exempts documented test IDs from redaction (the
    governance control every production scrub pass needs).

    Three outcomes per row, all pinned by the driver hash and
    ``tests/test_wave19.py``: checksum-valid + not allowlisted →
    redacted to ``<CARD>``; checksum-INVALID → text survives verbatim;
    valid but allowlisted → survives verbatim.

    Scale shape: map-only like x106 — substring/CASE arithmetic inside
    whole-stage codegen, zero shuffles, zero UDFs, fixed cost per row.
    The Java∩RE2 pattern subset keeps the one regex engine-portable;
    everything semantic runs in arithmetic both engines define
    identically."""
    fixtures(spark, sf_dir)
    return spark.sql(_X107_SQL)
