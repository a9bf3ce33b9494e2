"""Round-7 wave: time-sliced corpus health.

**x89_drift_timeline** is the time axis VERDICT r6 asked for on the x65
drift monitor: per-(source, month) total-variation distance between each
ingest slice's token distribution and that source's full-history
distribution. The fixture has no date column, so the slice key is a
deterministic pseudo-date derived from doc_id (``doc_id % 365`` days
from 2024-01-01) — the derivation is part of the query text in BOTH
engines, so the oracle checks the whole pipeline including the axis.
A real deployment swaps the derivation for its ingest date column; the
rest of the plan is unchanged.

This is the monitor a curation team runs per ingest batch: a (source,
month) whose tv_ppm jumps against the source's own history means the
source changed its content mix mid-stream (scraper drift, upstream
format change, injected spam) even when the source's aggregate drift
vs the corpus (x65) still looks flat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dwh_etl_framework_spark.queries.registry import fixtures, query

#: pseudo-date: documents carry no timestamp, so slices derive from
#: doc_id — deterministic, uniform across a year, identical SQL text in
#: both engines modulo the date-format call.
SPARK_MONTH = (
    "date_format(date_add(DATE '2024-01-01', "
    "CAST(doc_id % 365 AS INT)), 'yyyy-MM')"
)
DUCK_MONTH = (
    "strftime(DATE '2024-01-01' + CAST(doc_id % 365 AS INT), '%Y-%m')"
)


@query(
    "x89_drift_timeline",
    oracle=f"""
    WITH st AS (
        SELECT source, {DUCK_MONTH} AS month,
               unnest(string_split(text, ' ')) AS token
        FROM documents
    ),
    c AS (
        SELECT source, month, token, CAST(COUNT(*) AS BIGINT) AS c_smt
        FROM st GROUP BY source, month, token
    ),
    n_sm AS (
        SELECT source, month, CAST(SUM(c_smt) AS BIGINT) AS n_slice
        FROM c GROUP BY source, month
    ),
    cs AS (
        SELECT source, token, CAST(SUM(c_smt) AS BIGINT) AS c_st
        FROM c GROUP BY source, token
    ),
    ns AS (
        SELECT source, CAST(SUM(c_st) AS BIGINT) AS n_s FROM cs GROUP BY source
    ),
    q AS (
        SELECT cs.source, cs.token,
               CAST(cs.c_st * 1000000 // ns.n_s AS BIGINT) AS q_ppm
        FROM cs JOIN ns ON ns.source = cs.source
    ),
    qtot AS (
        SELECT source, CAST(SUM(q_ppm) AS BIGINT) AS q_total
        FROM q GROUP BY source
    ),
    p AS (
        SELECT c.source, c.month, c.token,
               CAST(c.c_smt * 1000000 // n_sm.n_slice AS BIGINT) AS p_ppm
        FROM c JOIN n_sm ON n_sm.source = c.source AND n_sm.month = c.month
    ),
    per AS (
        SELECT p.source, p.month,
               CAST(SUM(abs(p.p_ppm - q.q_ppm)) AS BIGINT) AS present_diff,
               CAST(SUM(q.q_ppm) AS BIGINT) AS q_present
        FROM p JOIN q ON q.source = p.source AND q.token = p.token
        GROUP BY p.source, p.month
    )
    SELECT per.source, per.month, n_sm.n_slice AS n_tokens,
           CAST((per.present_diff + qtot.q_total - per.q_present) // 2
                AS BIGINT) AS tv_ppm
    FROM per
    JOIN n_sm ON n_sm.source = per.source AND n_sm.month = per.month
    JOIN qtot ON qtot.source = per.source
    """,
)
def x89_drift_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 drift over TIME: per-(source, month) TV distance vs the source's

    own full-history token distribution, exact integer ppm. Same log-free
    ½·Σ|p−q| decomposition as x65 — Σ_present|p−q| + (Q_total −
    Σ_present q) charges tokens the slice never emits without a
    |slices|×|vocab| cross product. Against the source's OWN history
    rather than the corpus: a per-ingest mix change is visible even when
    the source's aggregate x65 drift stays flat.

    Scale shape: ONE corpus-proportional exchange — the (source, month,
    token) count, map-side combined, then localCheckpoint'd (the x65
    lineage-cut rule): the slice totals, the source-level rollup, and the
    p⋈q join all read the materialized vocabulary×months table instead
    of re-running the explode over the corpus. The source-level q table
    derives from that SAME table by a second (vocab-sized, not
    corpus-sized) aggregate. Per-source scalar totals ride a broadcast
    join. Corpus text is scanned once; nothing wider than
    (source, month, token) ever shuffles."""
    t = fixtures(spark, sf_dir)
    c = (
        t.documents.select(
            "source",
            F.expr(SPARK_MONTH).alias("month"),
            F.explode(F.split("text", " ")).alias("token"),
        )
        .groupBy("source", "month", "token")
        .agg(F.count(F.lit(1)).alias("c_smt"))
        # lazy: the corpus scan lands inside the timed action (bench rule)
        .localCheckpoint(eager=False)
    )
    n_sm = c.groupBy("source", "month").agg(F.sum("c_smt").alias("n_slice"))
    cs = c.groupBy("source", "token").agg(F.sum("c_smt").alias("c_st"))
    ns = cs.groupBy("source").agg(F.sum("c_st").alias("n_s"))
    q = cs.join(ns, "source").select(
        "source",
        "token",
        F.expr("CAST(c_st * 1000000 div n_s AS BIGINT)").alias("q_ppm"),
    )
    qtot = F.broadcast(q.groupBy("source").agg(F.sum("q_ppm").alias("q_total")))
    p = c.join(n_sm, ["source", "month"]).select(
        "source",
        "month",
        "token",
        F.expr("CAST(c_smt * 1000000 div n_slice AS BIGINT)").alias("p_ppm"),
    )
    per = (
        p.join(q, ["source", "token"])
        .groupBy("source", "month")
        .agg(
            F.sum(F.abs(F.col("p_ppm") - F.col("q_ppm"))).alias(
                "present_diff"
            ),
            F.sum("q_ppm").alias("q_present"),
        )
    )
    return (
        per.join(n_sm, ["source", "month"])
        .join(qtot, "source")
        .select(
            "source",
            "month",
            F.col("n_slice").cast("long").alias("n_tokens"),
            F.expr(
                "CAST((present_diff + q_total - q_present) div 2 AS BIGINT)"
            ).alias("tv_ppm"),
        )
    )


#: f30: 60-bit row hash (15 md5 nibbles) — BIGINT-safe in both engines;
#: the XOR and HUGEINT/DECIMAL sums are order-independent, so two systems
#: can compare fingerprints without sorting or co-partitioning anything.
_F30_PAYLOAD_SPARK = (
    "concat_ws('|', o_orderkey, o_custkey, o_orderstatus, "
    "CAST(floor(o_totalprice * 100) AS BIGINT), "
    "CAST(CAST(o_orderdate AS DATE) AS STRING), o_orderpriority)"
)
_F30_PAYLOAD_DUCK = (
    "concat_ws('|', o_orderkey, o_custkey, o_orderstatus, "
    "CAST(floor(o_totalprice * 100) AS BIGINT), "
    "CAST(CAST(o_orderdate AS DATE) AS VARCHAR), o_orderpriority)"
)


@query(
    "f30_table_checksum",
    oracle=f"""
    WITH hashed AS (
        SELECT o_orderstatus,
               CAST(('0x' || substr(md5({_F30_PAYLOAD_DUCK}), 1, 15))
                    AS BIGINT) AS h
        FROM orders
    )
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(bit_xor(h) AS BIGINT) AS xor_fp,
           CAST(CAST(SUM(h) AS DECIMAL(38,0)) AS VARCHAR) AS sum_fp
    FROM hashed GROUP BY o_orderstatus
    """,
)
def f30_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent table fingerprint — the cross-system

    reconciliation check a DWH runs after any replication/migration (the
    reference's Greenplum→lake copies have no post-copy verification;
    this is the audit they need). Each row hashes to a 60-bit integer
    (15 md5 hex nibbles — BIGINT-safe, engine-portable); per status
    group the XOR and the exact DECIMAL sum of row hashes are both
    ORDER-INDEPENDENT and partition-mergeable, so two systems compute
    fingerprints independently — no sorting, no co-partitioning, no row
    shipping — and compare |statuses| rows. XOR alone misses duplicated+
    dropped row pairs; the sum catches multiplicity changes.

    Scale shape: map-side partial aggregate reduces every partition to
    ≤|statuses| fingerprint rows before the one tiny exchange — the same
    counters-not-values rule as the sketch family (x84/x86)."""
    t = fixtures(spark, sf_dir)
    return table_checksum(t.orders)


def table_checksum(orders: DataFrame) -> DataFrame:
    """Core f30 fingerprint over any orders-shaped frame — split out so
    the mergeability and mutation-detection tests drive it on slices."""
    h = F.expr(
        f"CAST(conv(substring(md5({_F30_PAYLOAD_SPARK}), 1, 15), 16, 10) "
        "AS BIGINT)"
    )
    return (
        orders.select("o_orderstatus", h.alias("h"))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.expr("bit_xor(h)").cast("long").alias("xor_fp"),
            F.sum(F.col("h").cast("decimal(38,0)"))
            .cast("string")
            .alias("sum_fp"),  # exact integer rendered as string: the
            # registry bans DECIMAL in final schemas (canonicalizer rule)
        )
    )


#: x91: numeric columns are zero-padded to 14 so lexicographic MIN/MAX
#: equals numeric MIN/MAX (documented; all profiled numerics are
#: non-negative in the fixture).
_X91_COLS_SPARK = """stack(6,
    'o_orderkey',      lpad(CAST(o_orderkey AS STRING), 14, '0'),
    'o_custkey',       lpad(CAST(o_custkey AS STRING), 14, '0'),
    'o_orderstatus',   o_orderstatus,
    'o_orderpriority', o_orderpriority,
    'order_date',      CAST(CAST(o_orderdate AS DATE) AS STRING),
    'price_cents',     lpad(CAST(CAST(floor(o_totalprice * 100) AS BIGINT)
                                AS STRING), 14, '0')
) AS (col_name, val)"""

_X91_COLS_DUCK = """
    SELECT 'o_orderkey' AS col_name,
           lpad(CAST(o_orderkey AS VARCHAR), 14, '0') AS val FROM orders
    UNION ALL SELECT 'o_custkey',
           lpad(CAST(o_custkey AS VARCHAR), 14, '0') FROM orders
    UNION ALL SELECT 'o_orderstatus', o_orderstatus FROM orders
    UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM orders
    UNION ALL SELECT 'order_date',
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) FROM orders
    UNION ALL SELECT 'price_cents',
           lpad(CAST(CAST(floor(o_totalprice * 100) AS BIGINT) AS VARCHAR),
                14, '0') FROM orders
"""


@query(
    "x91_column_profile",
    oracle=f"""
    WITH tall AS ({_X91_COLS_DUCK})
    SELECT col_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN val IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_nulls,
           CAST(COUNT(DISTINCT val) AS BIGINT) AS n_distinct,
           MIN(val) AS min_val,
           MAX(val) AS max_val
    FROM tall GROUP BY col_name
    """,
)
def x91_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level data profiling — null counts, exact distinct
    cardinality, min/max per column as one tall report (the
    SELECT-star-profile every warehouse migration starts with; the
    introspection step the reference reads from Greenplum catalogs,
    computed here from the data itself). Numerics are zero-padded so
    string MIN/MAX equals numeric MIN/MAX; dates render ISO.

    Scale shape: the stack() unpivot is map-side (rows × 6 narrow
    strings); one (col_name, val)-keyed exchange feeds the per-column
    aggregate. At petabyte scale swap COUNT(DISTINCT) for the x84 HLL
    registers per column — same plan shape, bounded shuffle."""
    t = fixtures(spark, sf_dir)
    return column_profile(t.orders)


def column_profile(orders: DataFrame) -> DataFrame:
    """Core x91 profile over any orders-shaped frame (testable on
    mutated slices — the registry fixture cache pins temp views)."""
    tall = orders.selectExpr(_X91_COLS_SPARK)
    return tall.groupBy("col_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.col("val").isNull().cast("long")).cast("long").alias("n_nulls"),
        F.countDistinct("val").cast("long").alias("n_distinct"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
    )


@query(
    "x92_vocab_novelty",
    oracle=f"""
    WITH st AS (
        SELECT DISTINCT source, {DUCK_MONTH} AS month,
               unnest(string_split(text, ' ')) AS token
        FROM documents
    ),
    first_seen AS (
        SELECT source, token, MIN(month) AS m0
        FROM st GROUP BY source, token
    )
    SELECT st.source, st.month,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_tokens,
           CAST(SUM(CASE WHEN st.month = f.m0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_new_tokens,
           CAST(SUM(CASE WHEN st.month = f.m0 THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS novelty_ppm
    FROM st
    JOIN first_seen f ON f.source = st.source AND f.token = st.token
    GROUP BY st.source, st.month
    """,
)
def x92_vocab_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 vocabulary novelty over TIME: per (source, month), how many of

    the month's distinct tokens appear in that source for the FIRST time
    — the complement of x89's distributional drift. A scraper suddenly
    emitting new vocabulary (novelty_ppm spike) signals a content-mix or
    encoding change even when frequency drift stays small; novelty
    decaying to ~0 signals a stale/looping source. Months derive from
    the same deterministic doc_id pseudo-date as x89.

    Scale shape: one corpus explode reduced map-side to distinct
    (source, month, token) — localCheckpoint'd (x65 rule) because the
    first-seen aggregate AND the join-back both consume it; everything
    downstream is vocabulary×months-sized. Integer ppm, log-free."""
    t = fixtures(spark, sf_dir)
    st = (
        t.documents.select(
            "source",
            F.expr(SPARK_MONTH).alias("month"),
            F.explode(F.split("text", " ")).alias("token"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    first_seen = st.groupBy("source", "token").agg(F.min("month").alias("m0"))
    new_flag = F.sum((F.col("month") == F.col("m0")).cast("long"))
    return (
        st.join(first_seen, ["source", "token"])
        .groupBy("source", "month")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_distinct_tokens"),
            new_flag.cast("long").alias("n_new_tokens"),
            F.expr(
                "CAST(SUM(CAST(month = m0 AS BIGINT)) * 1000000 "
                "div COUNT(1) AS BIGINT)"
            ).alias("novelty_ppm"),
        )
    )


#: x93: month index within the pseudo-year (0-11); consecutive-month
#: pairs are (idx-1 -> idx) for idx in 1..11.
SPARK_MIDX = "CAST(doc_id % 365 AS INT) DIV 31"
DUCK_MIDX = "CAST(doc_id % 365 AS INT) // 31"
# NOTE: month INDEX here is day//31 (uniform ~31-day slices), not the
# calendar month of x89 — the changepoint math only needs an ordered,
# deterministic slicing, and //31 keeps the index arithmetic identical
# in both engines with no date functions in the hot path.


@query(
    "x93_drift_changepoint",
    oracle=f"""
    WITH c AS MATERIALIZED (
        SELECT source, {DUCK_MIDX} AS idx,
               token, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM (SELECT source, doc_id,
                     unnest(string_split(text, ' ')) AS token
              FROM documents)
        GROUP BY 1, 2, 3
    ),
    n AS (
        SELECT source, idx, CAST(SUM(cnt) AS BIGINT) AS n_tok
        FROM c GROUP BY source, idx
    ),
    p AS (
        SELECT c.source, c.idx, c.token,
               CAST(c.cnt * 1000000 // n.n_tok AS BIGINT) AS p_ppm
        FROM c JOIN n ON n.source = c.source AND n.idx = c.idx
    ),
    contrib AS (
        SELECT source, idx AS pair, token, p_ppm AS cur, 0 AS prev
        FROM p WHERE idx >= 1
        UNION ALL
        SELECT source, idx + 1 AS pair, token, 0 AS cur, p_ppm AS prev
        FROM p WHERE idx + 1 <= 11
    ),
    per_tok AS (
        SELECT source, pair, token,
               CAST(SUM(cur) AS BIGINT) AS cur, CAST(SUM(prev) AS BIGINT) AS prev
        FROM contrib GROUP BY 1, 2, 3
    ),
    tv AS (
        SELECT source, pair,
               CAST(SUM(abs(cur - prev)) // 2 AS BIGINT) AS mom_tv_ppm
        FROM per_tok GROUP BY source, pair
    ),
    stats AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(mom_tv_ppm) AS BIGINT) AS sum_tv
        FROM tv GROUP BY source
    )
    SELECT tv.source, CAST(tv.pair AS INTEGER) AS month_idx,
           tv.mom_tv_ppm,
           tv.mom_tv_ppm * stats.n_pairs * 10 > stats.sum_tv * 15 AS is_spike
    FROM tv JOIN stats ON stats.source = tv.source
    """,
)
def x93_drift_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 drift changepoint detection: month-over-month total-variation

    between CONSECUTIVE slices of each source (x89 compares each slice to
    the source's whole history; this compares neighbors, which localizes
    WHEN the mix changed), with a spike flag when a month's delta exceeds
    1.5x the source's mean delta — all integer arithmetic (the flag
    cross-multiplies: tv·n_pairs·10 > Σtv·15, no division, no floats).

    The consecutive-month pairing uses no self-join: every (source, idx,
    token) probability row is emitted into TWO pair slots (as ``cur`` of
    pair idx, as ``prev`` of pair idx+1) and one aggregate per
    (source, pair, token) reunites the sides — absent tokens contribute
    their full mass through the zero-filled other column. One corpus
    explode, then everything is vocabulary x months-sized.

    Scale shape: the (source, idx, token) count is the single
    corpus-proportional exchange, localCheckpoint'd (x65 rule) for its
    two consumers (slice totals + the probability table); the
    contribution union doubles only the VOCAB-sized table, not the
    corpus; per-source stats ride a broadcast join."""
    t = fixtures(spark, sf_dir)
    c = (
        t.documents.select(
            "source",
            F.expr(SPARK_MIDX).alias("idx"),
            F.explode(F.split("text", " ")).alias("token"),
        )
        .groupBy("source", "idx", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
    n = c.groupBy("source", "idx").agg(F.sum("cnt").alias("n_tok"))
    p = c.join(n, ["source", "idx"]).select(
        "source",
        "idx",
        "token",
        F.expr("CAST(cnt * 1000000 div n_tok AS BIGINT)").alias("p_ppm"),
    )
    cur = p.filter(F.col("idx") >= 1).select(
        "source",
        F.col("idx").alias("pair"),
        "token",
        F.col("p_ppm").alias("cur"),
        F.lit(0).cast("bigint").alias("prev"),
    )
    prev = p.filter(F.col("idx") + 1 <= 11).select(
        "source",
        (F.col("idx") + 1).alias("pair"),
        "token",
        F.lit(0).cast("bigint").alias("cur"),
        F.col("p_ppm").alias("prev"),
    )
    per_tok = (
        cur.unionByName(prev)
        .groupBy("source", "pair", "token")
        .agg(F.sum("cur").alias("c2"), F.sum("prev").alias("p2"))
    )
    tv = per_tok.groupBy("source", "pair").agg(
        F.expr("CAST(SUM(abs(c2 - p2)) div 2 AS BIGINT)").alias("mom_tv_ppm")
    )
    stats = F.broadcast(
        tv.groupBy("source").agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("mom_tv_ppm").cast("long").alias("sum_tv"),
        )
    )
    return tv.join(stats, "source").select(
        "source",
        F.col("pair").cast("int").alias("month_idx"),
        "mom_tv_ppm",
        (
            F.col("mom_tv_ppm") * F.col("n_pairs") * 10
            > F.col("sum_tv") * 15
        ).alias("is_spike"),
    )
