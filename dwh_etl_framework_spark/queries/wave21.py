"""Round-12 env-probe productization: the standing re-probe found TWO
new engine surfaces live in this Spark build — SQL UDFs (scalar AND
table-valued ``CREATE FUNCTION ... RETURN``) and SQL scripting
(``BEGIN … DECLARE … SET … END``) — and, per the r34/f37/r49-r52
precedent, each becomes an oracled registry entry the same round it is
found.

The oracles run the CLASSIC inlined SQL in DuckDB (the UDF body
substituted at the call site; the script's variable replaced by a
scalar subquery), so the driver hash certifies the new surface against
the portable semantics it claims to implement.

Reference anchor: the reference's transform tier is raw ``spark.sql``
(``airflow_etl.py:251``) — user-authored SQL abstractions (shared
business expressions, parameterized scripts) are exactly what its
config-driven SQL steps accumulate as copy-paste today.

Still blocked (re-probed 2026-08-15, round 12): ``bloom_filter_agg``
(not on the builtin search path — the hand-rolled x72 bloom tier
stands), ``google.protobuf`` (transformWithStateInPandas runtime).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dwh_etl_framework_spark.queries.registry import fixtures, query

#: r53 — SQL UDFs: a scalar function (exact-cents discounted revenue,
#: the shared business expression every report re-derives) and a
#: table-valued function (per-bracket order slices) defined ONCE in
#: SQL and reused. Catalyst inlines the bodies at plan time — the
#: optimized plan is identical to the hand-inlined query, so the
#: abstraction costs nothing at 100 TB (no per-row UDF boundary; the
#: scan filter still pushes down). Pinned in tests/test_wave21.py.
_R53_SPARK_FN_SCALAR = """
CREATE OR REPLACE TEMPORARY FUNCTION revenue_cents(
    price DOUBLE, discount DOUBLE)
RETURNS BIGINT
RETURN CAST(floor(price * (1 - discount) * 100) AS BIGINT)
"""

_R53_SPARK_FN_TABLE = """
CREATE OR REPLACE TEMPORARY FUNCTION flagged_lines(flag STRING)
RETURNS TABLE(l_orderkey BIGINT, l_extendedprice DOUBLE,
              l_discount DOUBLE, l_shipdate DATE)
RETURN SELECT l_orderkey, l_extendedprice, l_discount, l_shipdate
       FROM lineitem WHERE l_returnflag = flag
"""

_R53_SPARK = """
SELECT year(l_shipdate) AS ship_year,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(revenue_cents(l_extendedprice, l_discount)) AS BIGINT)
           AS revenue_cents
FROM flagged_lines('R')
GROUP BY year(l_shipdate)
ORDER BY ship_year
"""

_R53_ORACLE = """
SELECT CAST(year(l_shipdate) AS INT) AS ship_year,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem
WHERE l_returnflag = 'R'
GROUP BY year(l_shipdate)
ORDER BY ship_year
"""


@query("r53_sql_udf", oracle=_R53_ORACLE)
def r53_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R-tier, NEW engine surface (round-12 probe): SQL UDFs — a scalar
    ``CREATE FUNCTION … RETURN <expr>`` (the exact-cents revenue rule)
    and a table-valued ``RETURNS TABLE`` function (the flagged-lines
    slice) composed in one aggregate. The oracle is the fully inlined
    classic SQL, so the hash certifies Catalyst's UDF inlining
    reproduces the hand-written query exactly.

    Scale shape: SQL UDFs are plan-time macros, not runtime calls —
    the optimized plan carries no function boundary, the
    ``l_returnflag = 'R'`` predicate still reaches the parquet scan
    (pushdown pinned in tests/test_wave21.py), and whole-stage codegen
    spans the whole aggregate. Business logic gets named and shared
    without the per-row cost a Python UDF would pay at 100 TB."""
    fixtures(spark, sf_dir)
    spark.sql(_R53_SPARK_FN_SCALAR)
    spark.sql(_R53_SPARK_FN_TABLE)
    return spark.sql(_R53_SPARK)


#: r54 — SQL scripting: a data-derived parameter (the average order
#: value) computed into a session variable, then consumed by the
#: report query — the two-phase "compute threshold, then filter by it"
#: pattern every parameterized ETL config reimplements driver-side
#: (the reference templates it through Python string substitution,
#: airflow_etl.py:251; here the ENGINE owns the dataflow).
_R54_SPARK = """
BEGIN
  DECLARE avg_price DECIMAL(18,6);
  SET avg_price = (SELECT avg(o_totalprice) FROM orders);
  SELECT o_orderpriority,
         CAST(COUNT(*) AS BIGINT) AS n_above,
         CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents_above
  FROM orders
  WHERE o_totalprice > avg_price
  GROUP BY o_orderpriority
  ORDER BY o_orderpriority;
END
"""

_R54_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_above,
       CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents_above
FROM orders
WHERE o_totalprice > (
    SELECT CAST(avg(o_totalprice) AS DECIMAL(18,6)) FROM orders
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("r54_scripted_threshold", oracle=_R54_ORACLE)
def r54_scripted_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R-tier, NEW engine surface (round-12 probe): SQL scripting —
    ``BEGIN``/``DECLARE``/``SET`` computes a data-derived threshold
    into a session variable, and the script's final statement is the
    report that consumes it. The oracle inlines the variable as a
    scalar subquery; the DECIMAL(18,6) cast pins the comparison type
    on both engines.

    Scale shape: the scalar phase is one partial-agg pass collected to
    a variable (bytes of driver traffic); the report phase is an
    ordinary pushed-down scan+agg. Same plan a hand-rolled two-step
    pipeline gets — but the sequencing lives in the engine, surviving
    retries as one unit, instead of in driver-side Python."""
    fixtures(spark, sf_dir)
    return spark.sql(_R54_SPARK)


#: r49b — the STORED-variant shape r49's docstring claims (VERDICT r11
#: #7): pay parse_json ONCE at ingest (a parquet landing of the binary
#: variant column), then every query does typed ``variant_get`` access
#: against the stored encoding — no per-query JSON re-parse. The store
#: materializes once per (session, sf_dir); repeat queries (the bench's
#: warm runs) measure pure stored access, which is the A/B against
#: r49's cold parse recorded in PLANS.md.
_R49B_STORE: dict[tuple[str, str], str] = {}

_R49B_INGEST = """
SELECT o_orderkey AS id,
       parse_json(
           '{"status":"' || o_orderstatus || '","cents":'
           || CAST(CAST(floor(o_totalprice * 100) AS BIGINT) AS STRING)
           || ',"pri":"' || o_orderpriority || '"}'
       ) AS var
FROM orders
"""

_R49B_SPARK = """
SELECT variant_get(var, '$.status', 'string') AS status,
       variant_get(var, '$.pri', 'string') AS pri,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(variant_get(var, '$.cents', 'long')) AS BIGINT) AS cents
FROM orders_variant_store
GROUP BY 1, 2
ORDER BY status, pri
"""


# identical result to the cold-parse r49 — certify the store against
# the same classic-JSON semantics
from dwh_etl_framework_spark.queries.wave20 import _R49_ORACLE as _R49B_ORACLE


def _variant_store(spark: SparkSession, sf_dir: str) -> str:
    """Land the variant-encoded orders once per (session, sf_dir) —
    path isolated like f38's landing so a concurrent parity sweep at
    another scale factor can't clobber the store mid-read."""
    import hashlib
    import tempfile

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _R49B_STORE:
        tag = hashlib.md5(
            f"{sf_dir}:{spark.sparkContext.applicationId}".encode()
        ).hexdigest()[:12]
        base = f"{tempfile.gettempdir()}/dwh_etl_framework_spark_r49b_{tag}"
        fixtures(spark, sf_dir)
        spark.sql(_R49B_INGEST).write.mode("overwrite").parquet(base)
        _R49B_STORE[key] = base
    return _R49B_STORE[key]


@query("r49b_variant_stored", oracle=_R49B_ORACLE)
def r49b_variant_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R26/VARIANT, the stored shape: same report as r49 but over a
    PERSISTED variant column — parse_json ran once at ingest, the query
    does only typed ``variant_get`` access against the parquet-stored
    binary encoding. The oracle is r49's classic-JSON SQL (identical
    result), so the driver hash certifies the store+read path loses
    nothing vs parsing fresh.

    Scale shape: this is the open-schema ingestion answer at 100 TB —
    the parse cost is paid once per ingested row, not once per query
    per row; the report is a map-side typed access + one ≤15-group
    exchange. The measured cold-parse vs stored-access A/B lives in
    PLANS.md (round 12)."""
    store = _variant_store(spark, sf_dir)
    spark.read.parquet(store).createOrReplaceTempView(
        "orders_variant_store"
    )
    return spark.sql(_R49B_SPARK)
