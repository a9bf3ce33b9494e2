"""Data-layout operators: multi-dimensional clustering for scan pruning.

At 100 TB the fastest scan is the one that never opens the file. The two
tools here make that happen from PLAIN parquet, no table format required:

- **Zone maps** (:mod:`dwh_etl_framework_spark.sources.zonemaps`): the sink
  records per-fragment min/max for chosen columns in a hidden metadata dir;
  a pruned read intersects the query's intervals with that metadata and
  opens only overlapping fragments. This is the data-skipping design Delta
  and Iceberg standardized (public docs/spec), re-expressed on bare parquet
  the same way the ``_sketches/`` tier serves join planning
  (``sources/sinks.py``).
- **Z-order layout** (this module): zone maps only prune well when the
  layout CLUSTERS the stats columns. A single-column range layout gives
  perfect pruning on that column and none on any other; interleaving the
  bits of two columns (the Z-order / Morton curve, Orenstein & Merrett 1984,
  and the layout behind Delta's ``OPTIMIZE ZORDER BY``) makes every fragment
  a small hyper-rectangle in BOTH dimensions, so a 2-D box predicate keeps
  O(box area) fragments instead of O(box side).

Everything is generated as PORTABLE SQL text — the same string evaluates
identically in Spark SQL and DuckDB (the ``luhn_sum_sql`` precedent,
``queries/wave19.py``), so a driver hash can certify the whole layout
pipeline: normalization, bit interleaving, fragment assignment, the landed
zone-map contents, and the pruning arithmetic, all against an oracle that
recomputes them from the raw table.

Arithmetic portability rules (why the generated text looks the way it does):

- No ``&``/``<<``/``>>`` — bit ops spell differently across engines. A bit
  test is ``CAST(FLOOR(x / 2^i) AS BIGINT) % 2`` and a shift is a multiply;
  for x < 2^53 double division is exact, and identical IEEE expressions
  evaluate identically in both engines (registry determinism rules).
- ``EXTRACT(YEAR/MONTH/DAY FROM ts)`` is the only date surface used — both
  engines accept it on timestamps; ``datediff`` argument orders differ.
- All boundaries go through ``FLOOR(... * m / span)`` on doubles, clamped
  with ``LEAST/GREATEST`` — same text, same result, both engines.

Reference anchor: the reference lands unpartitioned dirs and always scans
them whole (``airflow_etl.py:433-450``); this tier is the missing pruning
story its Hudi bulk_insert never delivered.
"""

from __future__ import annotations

__all__ = [
    "daynum_sql",
    "norm_sql",
    "interleave2_sql",
    "range_fragment_sql",
    "zorder_fragment_sql",
    "zvalue_py",
]


def daynum_sql(col: str) -> str:
    """Monotone day number for a timestamp/date column, portable text.

    ``year*512 + month*32 + day`` is strictly increasing in (y, m, d)
    (month ≤ 12 < 16 ⇒ month*32 ≤ 384 < 512; day ≤ 31 < 32), so interval
    predicates on the date map to interval predicates on the day number —
    which is all a zone map needs. Not dense (gaps at month ends) and not
    a day count; monotonicity is the only property used.
    """
    return (
        f"CAST(EXTRACT(YEAR FROM {col}) * 512 "
        f"+ EXTRACT(MONTH FROM {col}) * 32 "
        f"+ EXTRACT(DAY FROM {col}) AS BIGINT)"
    )


def norm_sql(expr: str, lo: int, span: int, m: int) -> str:
    """Normalize a BIGINT expression into a grid cell in ``[0, m)``.

    ``floor((x - lo) * m / span)`` clamped into range: out-of-bounds values
    pile into the edge cells (correctness never depends on the constants —
    only pruning quality does), so the constants can be fixed design-time
    bounds rather than exact data min/max.
    """
    return (
        f"LEAST({m - 1}, GREATEST(0, "
        f"CAST(FLOOR(({expr} - {lo}) * {float(m)} / {span}) AS BIGINT)))"
    )


def interleave2_sql(x_col: str, y_col: str, bits: int) -> str:
    """Z-value (Morton code) of two grid coordinates as portable SQL.

    Interleaves the low ``bits`` bits of the two (already normalized)
    integer columns — x into the odd bit positions, y into the even ones:
    ``z = Σ_i  bit_i(x)·2^(2i+1) + bit_i(y)·2^(2i)``. Pass simple column
    names (alias the normalization in a preceding CTE) — the expression
    references each input ``bits`` times.
    """
    terms = []
    for i in range(bits):
        terms.append(
            f"(CAST(FLOOR({x_col} / {2 ** i}) AS BIGINT) % 2) * {2 ** (2 * i + 1)}"
        )
        terms.append(
            f"(CAST(FLOOR({y_col} / {2 ** i}) AS BIGINT) % 2) * {2 ** (2 * i)}"
        )
    return "(" + " + ".join(terms) + ")"


def range_fragment_sql(norm_col: str, bits: int, frag_bits: int) -> str:
    """Fragment id for a single-column range layout: the top ``frag_bits``
    bits of a ``[0, 2^bits)`` grid coordinate — ``2^frag_bits`` contiguous
    equal-width ranges."""
    if frag_bits > bits:
        raise ValueError(f"frag_bits {frag_bits} > bits {bits}")
    return f"CAST(FLOOR({norm_col} / {2 ** (bits - frag_bits)}) AS BIGINT)"


def zorder_fragment_sql(z_col: str, bits: int, frag_bits: int) -> str:
    """Fragment id for a 2-D Z-order layout: the top ``frag_bits`` bits of
    a ``2*bits``-bit z-value. Each fragment is then an axis-aligned block
    of grid cells (a square when ``frag_bits`` is even), which is what
    bounds a box predicate's kept-fragment count by the box AREA."""
    if frag_bits > 2 * bits:
        raise ValueError(f"frag_bits {frag_bits} > 2*bits {2 * bits}")
    return f"CAST(FLOOR({z_col} / {2 ** (2 * bits - frag_bits)}) AS BIGINT)"


def zvalue_py(x: int, y: int, bits: int) -> int:
    """Pure-Python reference interleave for property tests: must equal
    :func:`interleave2_sql` evaluated by either engine on the same pair."""
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i + 1)
        z |= ((y >> i) & 1) << (2 * i)
    return z
