"""ACID-table MERGE fast path for the journal delta merge (F20).

The reference lands datalake extracts as Hudi ``bulk_insert``
(``airflow_etl.py:441-450``) and runs the delta merge as generated
DELETE+INSERT SQL inside Greenplum (``airflow_etl.py:179-214``). On a lake
backed by an ACID table format (Delta Lake / Iceberg / Hudi) that pair
lowers to a single ``MERGE INTO`` statement, letting the format's
transaction log and file-level conflict detection replace the
read-modify-rewrite of the parquet fallback — at 100 TB this rewrites only
the files containing matched PKs instead of the whole master.

This container ships no format jars, so the fast path is gated behind a
runtime capability probe and a feature flag:

- ``acid_capability(spark)`` reports which (if any) ACID format the live
  session can actually execute, by checking registered SQL extensions and
  JVM classpath — never by import side effects.
- ``merge_delta_acid`` lowers F20 to ``MERGE INTO`` (requires capability).
- ``merge_delta_auto`` is the flagged dispatcher: flag off (default) or no
  capability → EXACTLY ``operators.merge.merge_delta`` (same function, same
  plan); flag on + capability → the MERGE fast path against a named table.

Semantics parity: the reference's delta merge deletes master rows whose PK
appears among Active journal rows, then inserts the latest Active row per
such PK. After ``latest_per_key`` there is exactly one source row per PK,
so DELETE+INSERT degenerates to upsert — ``WHEN MATCHED THEN UPDATE SET *
WHEN NOT MATCHED THEN INSERT *`` — which is what MERGE INTO expresses.
"""

from __future__ import annotations

import uuid
import warnings

from pyspark.sql import DataFrame, SparkSession

from dwh_etl_framework_spark.operators.merge import (
    STATE_COL,
    JournalSpec,
    latest_per_key,
    merge_delta,
)

from pyspark.sql import functions as F


class AcidUnavailableError(RuntimeError):
    """Raised when the MERGE fast path is requested but no ACID table

    format is executable in the live session."""


class AcidFallbackWarning(UserWarning):
    """``merge_delta_auto`` was asked for the ACID fast path but took the

    DataFrame fallback. The fallback computes from the caller-supplied
    ``master`` DataFrame, NOT the named ACID table — if the two have
    drifted, results are silently stale, so the skip must be observable
    (operators alert on this warning to catch capability regressions)."""


#: probe order + evidence: (name, session-extension marker, JVM class)
_CAPABILITIES: tuple[tuple[str, str, str], ...] = (
    (
        "delta",
        "io.delta.sql.DeltaSparkSessionExtension",
        "org.apache.spark.sql.delta.DeltaLog",
    ),
    (
        "iceberg",
        "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        "org.apache.iceberg.spark.SparkCatalog",
    ),
    (
        "hudi",
        "org.apache.spark.sql.hudi.HoodieSparkSessionExtension",
        "org.apache.hudi.DataSourceReadOptions",
    ),
)


def _jvm_class_present(spark: SparkSession, cls: str) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(cls)  # type: ignore[union-attr]
        return True
    except Exception:
        return False


def acid_capability(spark: SparkSession) -> str | None:
    """Which ACID format can this session's SQL engine execute MERGE INTO

    against? Requires BOTH the session extension to be registered (MERGE
    resolution rules live there for delta/hudi) and the format's engine
    class on the JVM classpath. Returns 'delta' | 'iceberg' | 'hudi' |
    None. Purely observational — no imports, no side effects."""
    try:
        extensions = spark.conf.get("spark.sql.extensions", "") or ""
    except Exception:
        extensions = ""
    for name, ext_marker, jvm_cls in _CAPABILITIES:
        if ext_marker in extensions and _jvm_class_present(spark, jvm_cls):
            return name
    return None


def acid_upserts(journal: DataFrame, spec: JournalSpec) -> DataFrame:
    """The MERGE source: latest Active journal row per changed PK

    (``airflow_etl.py:198-214``) with system columns dropped — one row per
    PK by construction."""
    return latest_per_key(journal.filter(F.col(STATE_COL) == "A"), spec)


def merge_delta_acid(
    spark: SparkSession,
    target_table: str,
    journal: DataFrame,
    spec: JournalSpec,
    capability: str | None = None,
) -> None:
    """F20 lowered to one ``MERGE INTO`` against an ACID table.

    ``target_table`` is a saved table / path reference valid in SQL (e.g.
    ``delta.`/lake/master```). Executes in-place; read the table back for
    the new master. PK columns are non-null by journal protocol, so plain
    ``=`` join keys are exact."""
    cap = capability or acid_capability(spark)
    if cap is None:
        raise AcidUnavailableError(
            "no ACID table format (delta/iceberg/hudi) executable in this "
            "session; use operators.merge.merge_delta (parquet fallback)"
        )
    pk = list(spec.primary_key)
    source_view = f"__acid_upserts_{uuid.uuid4().hex}"
    acid_upserts(journal, spec).createOrReplaceTempView(source_view)
    try:
        on = " AND ".join(f"t.{c} = s.{c}" for c in pk)
        spark.sql(
            f"MERGE INTO {target_table} t USING {source_view} s ON {on} "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *"
        )
    finally:
        spark.catalog.dropTempView(source_view)


def merge_delta_auto(
    spark: SparkSession,
    master: DataFrame,
    journal: DataFrame,
    spec: JournalSpec,
    use_acid_merge: bool = False,
    acid_target_table: str | None = None,
) -> DataFrame:
    """Flagged F20 dispatcher.

    Default (flag off, or no capability, or no named target): delegates to
    ``operators.merge.merge_delta`` — the identical DataFrame plan as
    before the flag existed. Flag on with an executable format and a named
    target: runs ``merge_delta_acid`` and returns the refreshed table.

    When the flag is ON but the fallback is taken anyway, an
    ``AcidFallbackWarning`` is emitted: the fallback reads the
    caller-supplied ``master`` DataFrame rather than the named table, so a
    silent skip could return stale results if the two sources drifted."""
    if use_acid_merge:
        if acid_target_table is None:
            warnings.warn(
                "use_acid_merge=True but acid_target_table is None — "
                "taking the DataFrame fallback (reads `master`, not an "
                "ACID table)",
                AcidFallbackWarning,
                stacklevel=2,
            )
        else:
            cap = acid_capability(spark)
            if cap is not None:
                merge_delta_acid(
                    spark, acid_target_table, journal, spec, capability=cap
                )
                return spark.read.table(acid_target_table)
            warnings.warn(
                f"use_acid_merge=True but no ACID format is executable in "
                f"this session (probe: delta/iceberg/hudi all absent) — "
                f"falling back to the DataFrame merge of `master`, NOT "
                f"table {acid_target_table!r}; results are stale if the "
                f"two have drifted",
                AcidFallbackWarning,
                stacklevel=2,
            )
    return merge_delta(master, journal, spec)
