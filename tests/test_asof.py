"""As-of join (R28) vs pandas.merge_asof ground truth, including

exact-match exclusion and forward direction."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import Row

from dwh_etl_framework_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    left_rows = [
        Row(key="a", t=1.0, lv=10),
        Row(key="a", t=3.0, lv=11),
        Row(key="a", t=5.0, lv=12),
        Row(key="b", t=2.0, lv=20),
        Row(key="c", t=9.0, lv=30),  # key with no right rows
    ]
    right_rows = [
        Row(key="a", rt=1.0, payload=100.0),
        Row(key="a", rt=4.0, payload=101.0),
        Row(key="b", rt=1.0, payload=200.0),
        Row(key="b", rt=3.0, payload=201.0),
    ]
    return (
        spark.createDataFrame(left_rows),
        spark.createDataFrame(right_rows),
        pd.DataFrame([r.asDict() for r in left_rows]),
        pd.DataFrame([r.asDict() for r in right_rows]),
    )


def _expected(pl, pr, **kw):
    out = pd.merge_asof(
        pl.sort_values("t"), pr.sort_values("rt"),
        left_on="t", right_on="rt", by="key", **kw,
    )
    return {
        (r.key, r.t): (None if pd.isna(r.payload) else r.payload)
        for r in out.itertuples()
    }


def _got(df):
    return {(r.key, r.t): r.payload for r in df.collect()}


def test_asof_backward(spark, frames):
    left, right, pl, pr = frames
    got = _got(asof_join(left, right, on=["key"], left_time="t", right_time="rt"))
    assert got == _expected(pl, pr)


def test_asof_backward_no_exact(spark, frames):
    left, right, pl, pr = frames
    got = _got(
        asof_join(left, right, on=["key"], left_time="t", right_time="rt",
                  allow_exact_matches=False)
    )
    assert got == _expected(pl, pr, allow_exact_matches=False)


def test_asof_forward(spark, frames):
    left, right, pl, pr = frames
    got = _got(
        asof_join(left, right, on=["key"], left_time="t", right_time="rt",
                  direction="forward")
    )
    assert got == _expected(pl, pr, direction="forward")


def test_asof_null_payload_not_leaked(spark):
    """A right row with NULL payload must yield NULL, not an older value."""
    left = spark.createDataFrame([Row(key="a", t=5.0)])
    right = spark.createDataFrame(
        [Row(key="a", rt=1.0, payload=1.0), Row(key="a", rt=4.0, payload=None)]
    )
    got = asof_join(left, right, on=["key"], left_time="t", right_time="rt").collect()
    assert got[0].payload is None
