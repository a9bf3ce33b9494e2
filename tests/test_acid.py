"""ACID MERGE fast path (F20 / VERDICT r2 item 8).

The container ships no Delta/Iceberg/Hudi jars, so these tests pin the
flag-off contract (byte-identical delegation to the DataFrame merge), the
capability probe's honesty (None here), and the fail-fast. The flag-on
MERGE INTO roundtrip is a conditional test that runs wherever delta-spark
is installed and skips here — the probe, not the test, is what guards
production behavior.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dwh_etl_framework_spark.operators.acid import (
    AcidFallbackWarning,
    AcidUnavailableError,
    acid_capability,
    acid_upserts,
    merge_delta_acid,
    merge_delta_auto,
)
from dwh_etl_framework_spark.operators.merge import (
    JournalSpec,
    merge_delta,
    stamp_journal_columns,
)

SPEC = JournalSpec(primary_key=("k",))


def _fixture(spark):
    master = spark.createDataFrame(
        [(1, "old-1"), (2, "old-2"), (3, "old-3")], "k int, v string"
    )
    j1 = stamp_journal_columns(
        spark.createDataFrame([(2, "new-2"), (4, "new-4")], "k int, v string"),
        transform_dt="2024-01-02 00:00:00",
        load_dt="2024-01-02 00:00:00",
    )
    j2 = stamp_journal_columns(
        spark.createDataFrame([(2, "newer-2")], "k int, v string"),
        transform_dt="2024-01-03 00:00:00",
        load_dt="2024-01-03 00:00:00",
    )
    return master, j1.unionByName(j2)


def test_capability_probe_reports_none_in_this_container(spark):
    # honest probe: no format jars are on this classpath
    assert acid_capability(spark) is None


def test_merge_delta_acid_fails_fast_without_capability(spark):
    master, journal = _fixture(spark)
    with pytest.raises(AcidUnavailableError, match="parquet fallback"):
        merge_delta_acid(spark, "some_table", journal, SPEC)


def test_flag_off_is_the_identical_dataframe_plan(spark):
    master, journal = _fixture(spark)
    auto = merge_delta_auto(spark, master, journal, SPEC, use_acid_merge=False)
    direct = merge_delta(master, journal, SPEC)
    # same analyzed plan modulo expr ids => Catalyst sees exactly what it
    # saw pre-flag
    assert auto.sameSemantics(direct)
    assert sorted(auto.collect()) == sorted(direct.collect())


def test_flag_on_without_capability_falls_back_to_dataframe_merge(spark):
    """ADVICE r4: the fallback must be observable — it reads the caller's
    `master` DataFrame, not the named table, so a silent skip could
    return stale results after a capability regression."""
    master, journal = _fixture(spark)
    with pytest.warns(AcidFallbackWarning, match="no ACID format"):
        out = merge_delta_auto(
            spark,
            master,
            journal,
            SPEC,
            use_acid_merge=True,
            acid_target_table="delta.`/nonexistent`",
        )
    rows = {r.k: r.v for r in out.collect()}
    assert rows == {1: "old-1", 2: "newer-2", 3: "old-3", 4: "new-4"}


def test_flag_on_without_target_table_warns(spark):
    master, journal = _fixture(spark)
    with pytest.warns(AcidFallbackWarning, match="acid_target_table is None"):
        merge_delta_auto(spark, master, journal, SPEC, use_acid_merge=True)


def test_flag_off_emits_no_warning(spark):
    import warnings

    master, journal = _fixture(spark)
    with warnings.catch_warnings():
        warnings.simplefilter("error", AcidFallbackWarning)
        merge_delta_auto(spark, master, journal, SPEC, use_acid_merge=False)


def test_acid_upserts_is_one_latest_active_row_per_pk(spark):
    _, journal = _fixture(spark)
    # mark one journal row historic: it must not surface as an upsert
    journal = journal.withColumn(
        "__record_state",
        F.when(F.col("k") == 4, F.lit("H")).otherwise(F.col("__record_state")),
    )
    ups = acid_upserts(journal, SPEC)
    rows = {r.k: r.v for r in ups.collect()}
    assert rows == {2: "newer-2"}
    assert ups.columns == ["k", "v"]  # system columns dropped for SET */INSERT *


def test_merge_into_roundtrip_with_delta_when_available(tmp_path):
    """Runs only where delta-spark + jars exist; skips in this container."""
    delta = pytest.importorskip("delta")
    from dwh_etl_framework_spark.session import SessionFactory

    builder = SessionFactory(
        app_name="acid-delta-test",
        extra_confs={
            "spark.sql.extensions": "io.delta.sql.DeltaSparkSessionExtension",
            "spark.sql.catalog.spark_catalog": (
                "org.apache.spark.sql.delta.catalog.DeltaCatalog"
            ),
        },
    )
    spark = builder.build()
    try:
        assert acid_capability(spark) == "delta"
        master, journal = _fixture(spark)
        target = str(tmp_path / "master")
        master.write.format("delta").save(target)
        merge_delta_acid(spark, f"delta.`{target}`", journal, SPEC)
        out = {r.k: r.v for r in spark.read.format("delta").load(target).collect()}
        expected = {
            r.k: r.v for r in merge_delta(master, journal, SPEC).collect()
        }
        assert out == expected
    finally:
        spark.stop()
