"""Round-12 data-layout tier: zone-map pruned scans and Z-order clustering.

Two oracled entries certify the whole layout pipeline end to end:

- ``f41_zonemap_pruned_scan`` — F17 composition: land a table fragmented by
  a date-range layout WITH per-fragment min/max metadata
  (``sources/zonemaps.py``), serve an interval query through the pruned
  reader, and report how many fragments the metadata kept. The oracle
  recomputes the fragment assignment, the per-fragment min/max, the overlap
  count, AND the query answer from the raw table — one hash certifies the
  landed zone map equals ground truth and pruning lost no rows.
- ``x111_zorder_pruning_gain`` — the layout AUDIT: the same table landed
  twice (single-column range layout vs 2-D Z-order,
  ``operators/layout.py``), then three predicate shapes (2-D box, date-only,
  amount-only) pruned against BOTH layouts' landed metadata. The output
  pins the honest tradeoff: Z-order keeps O(area) fragments on the box and
  prunes on EITHER column, while the range layout is perfect on its own
  column and useless on the other. Row values double as a superset check —
  both layouts must produce identical exact answers per predicate.

All fragment arithmetic is generated once as portable SQL text
(``operators/layout.py`` docstring) and evaluated by BOTH engines, the
``luhn_sum_sql`` precedent: nothing is compared that either side could
have computed differently by construction.

Scale shape (the reason this tier exists): at 100 TB a pruned scan's
decision costs one metadata read of ~fragments rows — the skipped
fragments are never listed, opened, or footer-read. Layout constants are
fixed design-time bounds; out-of-range values clamp into edge fragments,
so correctness never depends on them (``norm_sql`` docstring).
"""

from __future__ import annotations

import functools
import hashlib
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dwh_etl_framework_spark.operators.layout import (
    daynum_sql,
    interleave2_sql,
    norm_sql,
    range_fragment_sql,
    zorder_fragment_sql,
)
from dwh_etl_framework_spark.queries.registry import fixtures, query
from dwh_etl_framework_spark.sources.zonemaps import (
    read_table_pruned,
    write_table_with_zonemaps,
)

# ---- shared layout constants (fixed design-time bounds; see norm_sql) ----

#: orders span 1995-01-01..2001-08-01 at every SF (TESTDATA.md fixtures);
#: daynum = y*512 + m*32 + d ⇒ lo = 1995*512+1*32+1, span padded past
#: 2001-08-01. Out-of-range dates clamp — quality, not correctness.
DAY_LO = 1021473
DAY_SPAN = 3300
#: o_totalprice ~ 1000..500000 at every SF, carried as exact cents.
CENTS_LO = 100_000
CENTS_SPAN = 49_900_000
BITS = 8  # 256 grid cells per dimension

_DAYNUM = daynum_sql("o_orderdate")
_CENTS = "CAST(FLOOR(o_totalprice * 100) AS BIGINT)"
_ND = norm_sql("daynum", DAY_LO, DAY_SPAN, 2**BITS)
_NC = norm_sql("cents", CENTS_LO, CENTS_SPAN, 2**BITS)

#: base projection both engines start from (raw orders → stats columns).
_BASE = (
    "SELECT o_orderpriority AS priority, "
    f"{_DAYNUM} AS daynum, {_CENTS} AS cents FROM orders"
)

# ---- f41: zone-map pruned scan ------------------------------------------

F41_FRAG_BITS = 4  # 16 date-range fragments
#: query intervals: 1997-03-01..1997-11-30 and 50 000.00..200 000.00
F41_D1, F41_D2 = 1997 * 512 + 3 * 32 + 1, 1997 * 512 + 11 * 32 + 30
F41_C1, F41_C2 = 5_000_000, 20_000_000

_F41_FRAG = range_fragment_sql("nd", BITS, F41_FRAG_BITS)

_F41_ORACLE = f"""
WITH base AS ({_BASE}),
grid AS (SELECT *, {_ND} AS nd FROM base),
frag AS (SELECT *, {_F41_FRAG} AS fragment FROM grid),
zm AS (
    SELECT fragment,
           MIN(daynum) AS dmin, MAX(daynum) AS dmax,
           MIN(cents) AS cmin, MAX(cents) AS cmax
    FROM frag GROUP BY fragment
),
counts AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS fragments_total,
           CAST(SUM(CASE WHEN dmax >= {F41_D1} AND dmin <= {F41_D2}
                          AND cmax >= {F41_C1} AND cmin <= {F41_C2}
                     THEN 1 ELSE 0 END) AS BIGINT) AS fragments_kept
    FROM zm
),
agg AS (
    SELECT priority, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS cents_sum
    FROM base
    WHERE daynum BETWEEN {F41_D1} AND {F41_D2}
      AND cents BETWEEN {F41_C1} AND {F41_C2}
    GROUP BY priority
)
SELECT a.priority, a.n_orders, a.cents_sum,
       c.fragments_total, c.fragments_kept
FROM agg a CROSS JOIN counts c
ORDER BY a.priority
"""


def _temp_base(spark: SparkSession, sf_dir: str, tag: str) -> str:
    """Landing path isolated per (sf_dir, session) — the f38 rule: a
    concurrent run at another scale factor must not overwrite these
    fragments mid-read (wave20.py:255-259)."""
    h = hashlib.md5(
        f"{sf_dir}:{spark.sparkContext.applicationId}".encode()
    ).hexdigest()[:12]
    return f"{tempfile.gettempdir()}/dwh_etl_framework_spark_{tag}_{h}"


#: landings memoized per (session, sf) like f39/r49b: the fragmented
#: landing is one-time daily-ingest work, not per-query work — warm bench
#: runs then measure what production pays per query: the metadata-read
#: pruning decision + the pruned scan itself.
_F41_LANDED: dict[tuple[str, str], str] = {}
_X111_LANDED: dict[tuple[str, str], dict] = {}


def _f41_landing(spark: SparkSession, sf_dir: str) -> str:
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _F41_LANDED:
        fixtures(spark, sf_dir)
        base = spark.sql(
            f"SELECT *, {_F41_FRAG} AS __fragment FROM "
            f"(SELECT *, {_ND} AS nd FROM ({_BASE}))"
        ).drop("nd")
        path = f"{_temp_base(spark, sf_dir, 'f41')}/orders_daylayout"
        write_table_with_zonemaps(base, path, ["daynum", "cents"])
        _F41_LANDED[key] = path
    return _F41_LANDED[key]


def _x111_landing(spark: SparkSession, sf_dir: str) -> dict:
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _X111_LANDED:
        fixtures(spark, sf_dir)
        grid = spark.sql(f"SELECT *, {_ND} AS nd, {_NC} AS nc FROM ({_BASE})")
        grid.createOrReplaceTempView("x111_grid")
        linear = spark.sql(
            f"SELECT priority, daynum, cents, {_X111_LINEAR} AS __fragment "
            "FROM x111_grid"
        )
        zed = spark.sql(
            f"SELECT priority, daynum, cents, {_X111_Z} AS __fragment "
            f"FROM (SELECT *, {_ZVAL} AS zval FROM x111_grid)"
        )
        base = _temp_base(spark, sf_dir, "x111")
        paths = {"linear": f"{base}/linear", "zorder": f"{base}/zorder"}
        write_table_with_zonemaps(linear, paths["linear"], ["daynum", "cents"])
        write_table_with_zonemaps(zed, paths["zorder"], ["daynum", "cents"])
        _X111_LANDED[key] = paths
    return _X111_LANDED[key]


@query("f41_zonemap_pruned_scan", oracle=_F41_ORACLE)
def f41_zonemap_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F17+scan composition: land orders under a 16-fragment date-range
    layout with zone-map metadata, then answer a date+amount interval
    query through :func:`read_table_pruned` — only fragments whose landed
    min/max overlap BOTH intervals are opened, and the result carries the
    actual (fragments_total, fragments_kept) the metadata decided.

    The oracle recomputes fragment assignment, per-fragment min/max, the
    overlap count, and the aggregate from raw orders, so one driver hash
    certifies: the landed map equals ground truth (no fragment lost or
    double-counted), pruning kept a superset (identical aggregates), and
    the decision arithmetic matches the portable spec.

    Scale shape: the landing is one shuffle keyed by fragment (one file
    per fragment, F17 file-size rule), memoized per (session, sf) like
    f39/r49b — one-time ingest work, so warm runs measure the production
    per-query price: a ~16-row metadata read + the pruned scan. At
    100 TB, skipped fragments are never listed. The exact predicate
    still applies AFTER pruning (superset contract), and parquet
    row-group min/max pushdown applies inside kept fragments.
    """
    path = _f41_landing(spark, sf_dir)
    pruned, info = read_table_pruned(
        spark,
        path,
        {"daynum": (F41_D1, F41_D2), "cents": (F41_C1, F41_C2)},
    )
    return (
        pruned.where(
            F.col("daynum").between(F41_D1, F41_D2)
            & F.col("cents").between(F41_C1, F41_C2)
        )
        .groupBy("priority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("cents").cast("bigint").alias("cents_sum"),
        )
        .withColumn("fragments_total", F.lit(info["fragments_total"]).cast("bigint"))
        .withColumn("fragments_kept", F.lit(info["fragments_kept"]).cast("bigint"))
        .orderBy("priority")
    )


# ---- x111: Z-order vs range layout pruning audit -------------------------

X111_FRAG_BITS = 6  # 64 fragments in both layouts (top bits of the key)
_X111_LINEAR = range_fragment_sql("nd", BITS, X111_FRAG_BITS)
_X111_Z = zorder_fragment_sql("zval", BITS, X111_FRAG_BITS)
_ZVAL = interleave2_sql("nd", "nc", BITS)

#: three predicate shapes over the same two stats columns:
#: 2-D box 1996-01-01..1997-12-31 × 50 000.00..100 000.00, then each
#: dimension alone (bounds wide open on the other axis).
X111_D1, X111_D2 = 1996 * 512 + 1 * 32 + 1, 1997 * 512 + 12 * 32 + 31
X111_C1, X111_C2 = 5_000_000, 10_000_000
_WIDE_D = (0, 2**62)
_WIDE_C = (0, 2**62)
X111_PREDICATES: list[tuple[str, tuple, tuple]] = [
    ("box_2d", (X111_D1, X111_D2), (X111_C1, X111_C2)),
    ("date_only", (X111_D1, X111_D2), _WIDE_C),
    ("amount_only", _WIDE_D, (X111_C1, X111_C2)),
]


def _x111_oracle() -> str:
    frag_union = (
        f"SELECT 'linear' AS layout, {_X111_LINEAR} AS fragment, "
        "daynum, cents FROM grid "
        f"UNION ALL SELECT 'zorder', {_X111_Z}, daynum, cents FROM zed"
    )
    pred_rows = []
    for name, (d1, d2), (c1, c2) in X111_PREDICATES:
        pred_rows.append(
            f"""SELECT '{name}' AS predicate, zm.layout,
       CAST(COUNT(*) AS BIGINT) AS fragments_total,
       CAST(SUM(CASE WHEN dmax >= {d1} AND dmin <= {d2}
                      AND cmax >= {c1} AND cmin <= {c2}
                THEN 1 ELSE 0 END) AS BIGINT) AS fragments_kept,
       ans.n_rows, ans.cents_sum
FROM zm CROSS JOIN (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COALESCE(SUM(cents), 0) AS BIGINT) AS cents_sum
    FROM base
    WHERE daynum BETWEEN {d1} AND {d2} AND cents BETWEEN {c1} AND {c2}
) ans
GROUP BY zm.layout, ans.n_rows, ans.cents_sum"""
        )
    preds = "\nUNION ALL\n".join(pred_rows)
    return f"""
WITH base AS ({_BASE}),
grid AS (SELECT *, {_ND} AS nd, {_NC} AS nc FROM base),
zed AS (SELECT *, {_ZVAL} AS zval FROM grid),
frag AS ({frag_union}),
zm AS (
    SELECT layout, fragment,
           MIN(daynum) AS dmin, MAX(daynum) AS dmax,
           MIN(cents) AS cmin, MAX(cents) AS cmax
    FROM frag GROUP BY layout, fragment
)
SELECT * FROM ({preds})
ORDER BY predicate, layout
"""


@query("x111_zorder_pruning_gain", oracle=_x111_oracle())
def x111_zorder_pruning_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layout audit: the same orders projection landed under a
    single-column date-range layout AND a 2-D Z-order layout (64
    fragments each), then three predicate shapes pruned against both
    landings' zone maps. Output (predicate, layout) → fragments kept +
    the exact answer computed from the pruned read.

    What the single hash pins, per (predicate, layout): the landed
    min/max metadata equals ground truth; the pruned read is a superset
    (identical n_rows/cents_sum across layouts for each predicate); and
    the honest tradeoff — Z-order keeps O(box area) fragments on the 2-D
    box and prunes on EITHER dimension alone, while the range layout is
    perfect on its own column and keeps EVERY fragment on the other.
    That asymmetry is the public rationale for multi-dimensional
    clustering (Morton 1966 / Orenstein-Merrett 1984; Delta's OPTIMIZE
    ZORDER BY): choose it when queries filter on more than one column.

    Scale shape: two landings (one fragment-keyed shuffle each,
    memoized per (session, sf) — one-time ingest work), then six pruning
    decisions costing one ≤64-row metadata read each — no data file is
    opened for the decision; only kept fragments are scanned for the
    answers."""
    paths = _x111_landing(spark, sf_dir)
    rows = []
    for pred_name, dint, cint in X111_PREDICATES:
        for layout in ("linear", "zorder"):
            pruned, info = read_table_pruned(
                spark, paths[layout], {"daynum": dint, "cents": cint}
            )
            ans = pruned.where(
                F.col("daynum").between(*dint) & F.col("cents").between(*cint)
            ).agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.coalesce(F.sum("cents"), F.lit(0))
                .cast("bigint")
                .alias("cents_sum"),
            )
            rows.append(
                ans.select(
                    F.lit(pred_name).alias("predicate"),
                    F.lit(layout).alias("layout"),
                    F.lit(info["fragments_total"])
                    .cast("bigint")
                    .alias("fragments_total"),
                    F.lit(info["fragments_kept"])
                    .cast("bigint")
                    .alias("fragments_kept"),
                    F.col("n_rows"),
                    F.col("cents_sum"),
                )
            )
    return functools.reduce(DataFrame.unionByName, rows).orderBy(
        "predicate", "layout"
    )
