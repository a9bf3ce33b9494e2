"""Shared re-delivery guard (streaming/guard.py) — ADVICE r9 #4.

A fold-state table carrying ``__last_batch_id`` but a missing or NULL
``__run_id`` is guard-unknown: the old copy-pasted checks compared
``None == run_id`` → False and silently re-applied the batch (double-
counting SUM folds). The shared helper must refuse loudly instead.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from dwh_etl_framework_spark.streaming.guard import (
    GuardStateError,
    check_batch_guard,
    stamp_guard,
)


def _state(spark, rows):
    return spark.createDataFrame(rows)


def test_first_run_passes_through(spark):
    skip, counters = check_batch_guard(None, 0, "run-a")
    assert skip is False and counters is None


def test_unguarded_state_passes_through(spark):
    df = _state(spark, [Row(k="a", n=1)])
    skip, counters = check_batch_guard(df, 0, "run-a")
    assert skip is False
    assert counters.columns == ["k", "n"]


def test_same_run_redelivery_is_skipped(spark):
    df = stamp_guard(_state(spark, [Row(k="a", n=1)]), batch_id=3, run_id="r1")
    skip, _ = check_batch_guard(df, 3, "r1")
    assert skip is True
    skip, _ = check_batch_guard(df, 2, "r1")
    assert skip is True
    skip, counters = check_batch_guard(df, 4, "r1")
    assert skip is False
    assert set(counters.columns) == {"k", "n"}


def test_fresh_checkpoint_new_run_id_accepts_batch_zero(spark):
    df = stamp_guard(_state(spark, [Row(k="a", n=1)]), batch_id=7, run_id="r1")
    skip, _ = check_batch_guard(df, 0, "r2")
    assert skip is False


def test_missing_run_id_column_refuses(spark):
    from pyspark.sql import functions as F

    df = _state(spark, [Row(k="a", n=1)]).withColumn(
        "__last_batch_id", F.lit(3)
    )
    with pytest.raises(GuardStateError, match="__run_id"):
        check_batch_guard(df, 3, "r1")


def test_null_run_id_refuses(spark):
    from pyspark.sql import functions as F

    df = (
        _state(spark, [Row(k="a", n=1)])
        .withColumn("__last_batch_id", F.lit(3))
        .withColumn("__run_id", F.lit(None).cast("string"))
    )
    with pytest.raises(GuardStateError, match="guard-unknown"):
        check_batch_guard(df, 3, "r1")


def test_cms_fold_refuses_guard_unknown_state(spark, tmp_path):
    """End-to-end: a manually repaired CMS state (batch id, no run id)
    makes the fold raise instead of silently double-summing."""
    from pyspark.sql import functions as F

    from dwh_etl_framework_spark.streaming.distinct import fold_cms_batch
    from dwh_etl_framework_spark.streaming.merge import StreamMasterState

    state = StreamMasterState(spark, str(tmp_path / "cms"))
    batch = spark.createDataFrame([Row(v="x"), Row(v="y")])
    assert fold_cms_batch(state, batch, 0, "v", run_id="r1")
    # simulate the older-writer state: strip __run_id, republish
    broken = state.read().drop("__run_id")
    state.write(broken)
    with pytest.raises(GuardStateError):
        fold_cms_batch(state, batch, 0, "v", run_id="r1")
