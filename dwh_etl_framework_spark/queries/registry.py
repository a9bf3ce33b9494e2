"""Registry plumbing for the correctness/bench query surface.

Each entry is one operator from SURVEY.md §2 (R*/F*/X* numbering), with:
- a Spark implementation ``(spark, sf_dir) -> DataFrame``,
- optionally an ANSI-SQL oracle string DuckDB runs over the same parquet
  (``oracle=None`` ⇒ genuinely non-SQL-expressible ⇒ rows-only check).

Determinism rules every query here follows (so the driver's
order-insensitive value-hash matches bit-for-bit):

- **Aggregate through DECIMAL, never DOUBLE.** Double sums are
  association-order-dependent and Spark/DuckDB reduce in different orders;
  decimal arithmetic is exact. Row-level double arithmetic (no reduction)
  is IEEE-deterministic and stays double.
- **Averages** = CAST(decimal_sum AS DOUBLE)/count — one deterministic
  double division at the end.
- **Alias every computed column identically on both sides** (driver hashes
  with columns sorted by name).
- **Every window/top-k has a total order** (unique tiebreak column).
- **Cast type-system mismatches explicitly** (e.g. DuckDB year()→BIGINT vs
  Spark year()→INT ⇒ both cast to INT).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass
from types import SimpleNamespace

from pyspark.sql import DataFrame, SparkSession

from dwh_etl_framework_spark.session import apply_runtime_confs
from dwh_etl_framework_spark.sources.registry import register_fixture_tables


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


QUERIES: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None):
    """Register one (Spark impl, DuckDB oracle) pair."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = QueryDef(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


#: (session key, sf_dir) → registered DataFrames. Re-registering 10 parquet
#: sources costs ~0.5 s of footer reads per query call; the driver runs ~80
#: queries back-to-back on one session, so caching saves ~40 s of its
#: wall-clock. Keyed by session identity: a new session (or a different
#: sf_dir on the same session) re-registers and re-binds the temp views.
_FIXTURE_CACHE: dict[tuple[int, str, str], dict] = {}


def _session_key(spark: SparkSession) -> tuple[int, str]:
    """Identity key for one live session. ``id()`` alone is unsafe (CPython
    reuses addresses after GC, so a new session could false-hit a dead one's
    cache); pairing it with the context's applicationId disambiguates — a
    replacement session gets a fresh applicationId, while sibling
    ``newSession()`` clones (same appId, separate temp-view catalogs) still
    differ by ``id``."""
    return (id(spark), spark.sparkContext.applicationId)


def fixtures(spark: SparkSession, sf_dir: str) -> SimpleNamespace:
    """Register the driver fixtures as temp views and return them as attrs.

    Also pins runtime confs (UTC, AQE) on the caller-owned session so
    semantics don't depend on how the driver built it.
    """
    apply_runtime_confs(spark)
    skey = _session_key(spark)
    key = (*skey, sf_dir)
    cached = _FIXTURE_CACHE.get(key)
    if cached is None:
        cached = register_fixture_tables(spark, sf_dir)
        # evict other sf_dirs for this session: their temp views were just
        # rebound to this sf_dir's data
        for other in [k for k in _FIXTURE_CACHE if k[:2] == skey]:
            del _FIXTURE_CACHE[other]
        _FIXTURE_CACHE[key] = cached
    else:
        # views may have been rebound by someone else only through this same
        # function, which maintains the cache — safe to reuse, but re-bind
        # the temp views cheaply in case the session catalog was reset
        for name, df in cached.items():
            df.createOrReplaceTempView(name)
    return SimpleNamespace(**cached)
