"""Schema evolution on the datalake: new columns appear mid-history and

older files must still read (mergeSchema) — unavoidable at 100 TB where a
table's lifetime spans many pipeline versions."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_merge_schema_read(spark, tmp_path):
    path = str(tmp_path / "t")
    v1 = spark.range(5).select(F.col("id").alias("k"), F.lit("a").alias("v"))
    v1.write.mode("append").parquet(path)
    # pipeline v2 adds a column
    v2 = spark.range(5, 10).select(
        F.col("id").alias("k"), F.lit("b").alias("v"), F.lit(1.5).alias("score")
    )
    v2.write.mode("append").parquet(path)

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"k", "v", "score"}
    assert merged.count() == 10
    # old rows surface NULL for the new column; new rows carry it
    nulls = merged.filter(F.col("score").isNull()).count()
    assert nulls == 5
    assert merged.filter(F.col("score") == 1.5).count() == 5


def test_journal_survives_added_business_column(spark, tmp_path):
    """The merge protocol tolerates schema evolution in the journal: new

    business columns join the ranking untouched (system columns drive it)."""
    from datetime import datetime

    from pyspark.sql import Row

    from dwh_etl_framework_spark.operators.merge import JournalSpec, merge_full

    spec = JournalSpec(primary_key=("k",))
    t0 = datetime(2024, 1, 1)
    old = [Row(k=1, v="old", __transform_dt=t0, __load_dt=t0, __seqno=1,
               __record_state="A")]
    new = [Row(k=1, v="new", extra=42, __transform_dt=datetime(2024, 2, 1),
               __load_dt=t0, __seqno=2, __record_state="A")]
    j = spark.createDataFrame(old).unionByName(
        spark.createDataFrame(new), allowMissingColumns=True
    )
    got = merge_full(j, spec).collect()
    assert len(got) == 1
    assert got[0].v == "new" and got[0].extra == 42
