"""StreamMasterState pointer-file commit protocol (ADVICE r7).

The old ``mode("overwrite")`` write destroyed the previous state the
moment the new write started; a crash mid-write lost both old and new.
The protocol now writes each version to ``<path>/_vN`` and publishes it
by atomically replacing ``<path>/_LATEST``. These tests pin every crash
window:

1. normal roundtrip + old-version sweep,
2. crash mid-write (orphan version dir, no pointer bump) → previous
   state still readable,
3. crash during the FIRST write → still "first run" (None), not an
   UNABLE_TO_INFER_SCHEMA crash,
4. legacy flat-layout state (pre-protocol) reads fine and is migrated
   by the next write,
5. a corrupt orphan is replaced, not appended to, when its version
   number is retried.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from dwh_etl_framework_spark.streaming.merge import StreamMasterState


def _df(spark, vals):
    return spark.createDataFrame([(int(v),) for v in vals], "k long")


def _vals(df):
    return sorted(r["k"] for r in df.collect())


def test_roundtrip_and_sweep(spark, tmp_path):
    st = StreamMasterState(spark, str(tmp_path / "s"))
    assert st.read() is None
    st.write(_df(spark, [1, 2, 3]))
    assert _vals(st.read()) == [1, 2, 3]
    st.write(_df(spark, [4, 5]))
    assert _vals(st.read()) == [4, 5]
    entries = sorted(os.listdir(tmp_path / "s"))
    # exactly the live version and the pointer — v1 was swept
    assert entries == ["_LATEST", "_v2"]
    with open(tmp_path / "s" / "_LATEST") as fh:
        assert fh.read().strip() == "2"


def test_crash_mid_write_keeps_previous_state(spark, tmp_path):
    path = tmp_path / "s"
    st = StreamMasterState(spark, str(path))
    st.write(_df(spark, [10, 20]))
    # simulate a crash while _v2 was being written: partial dir exists,
    # pointer never bumped
    orphan = path / "_v2"
    os.makedirs(orphan / "_temporary")
    (orphan / "part-00000.parquet").write_bytes(b"NOT PARQUET")
    fresh = StreamMasterState(spark, str(path))  # process restart
    assert _vals(fresh.read()) == [10, 20]
    # next successful write replaces the orphan and publishes v2
    fresh.write(_df(spark, [30]))
    assert _vals(fresh.read()) == [30]
    assert sorted(os.listdir(path)) == ["_LATEST", "_v2"]


def test_crash_during_first_write_is_still_first_run(spark, tmp_path):
    path = tmp_path / "s"
    os.makedirs(path / "_v1" / "_temporary")
    (path / "_v1" / "part-00000.parquet").write_bytes(b"NOT PARQUET")
    (path / "_LATEST.tmp").write_text("1")  # crashed before os.replace
    st = StreamMasterState(spark, str(path))
    assert st.read() is None  # no state was ever published
    st.write(_df(spark, [7]))
    assert _vals(st.read()) == [7]


def test_legacy_flat_layout_reads_and_migrates(spark, tmp_path):
    path = str(tmp_path / "legacy")
    _df(spark, [1, 2]).write.parquet(path)  # pre-protocol layout
    st = StreamMasterState(spark, path)
    assert _vals(st.read()) == [1, 2]
    merged = st.read().unionByName(_df(spark, [3]))
    st.write(merged)
    assert _vals(st.read()) == [1, 2, 3]
    # flat files swept; only versioned layout remains
    assert sorted(os.listdir(path)) == ["_LATEST", "_v1"]


def test_guard_and_counters_publish_together(spark, tmp_path):
    """The distinct.py claim the advice questioned: guard column and
    counters ride ONE atomic publish, so a re-read after a simulated
    crash never sees a guard without its counters (or vice versa)."""
    from dwh_etl_framework_spark.streaming.distinct import (
        current_histogram,
        fold_histogram_batch,
    )

    path = tmp_path / "hist"
    st = StreamMasterState(spark, str(path))
    batch = spark.createDataFrame([("a", 1), ("a", 7), ("b", 3)], "g string, v int")
    assert fold_histogram_batch(st, batch, 0, ["g"], "v % 2", run_id="r")
    # crash simulation: orphan next version, pointer untouched
    os.makedirs(path / "_v2")
    st2 = StreamMasterState(spark, str(path))
    stored = st2.read()
    assert "__last_batch_id" in stored.columns  # guard present
    hist = {
        (r["g"], r["bucket"]): r["cnt"] for r in current_histogram(st2).collect()
    }
    assert hist == {("a", 1): 2, ("b", 1): 1}  # counters consistent with it
    # and the replayed batch is still recognized as applied
    assert not fold_histogram_batch(st2, batch, 0, ["g"], "v % 2", run_id="r")


def test_corrupt_pointer_refuses_read_and_write(spark, tmp_path):
    """ADVICE r8: a pointer that EXISTS but cannot be parsed must raise,
    never read as 'no pointer' — the legacy fallback would see a healthy
    published layout (only _vN/_LATEST entries) as first-run, and the
    next write would rmtree the live version and rebuild the master from
    one batch. Both read() and write() must refuse loudly."""
    import pytest

    path = tmp_path / "s"
    st = StreamMasterState(spark, str(path))
    st.write(_df(spark, [1, 2]))
    with open(path / "_LATEST", "w") as fh:
        fh.write("garbage\n")
    fresh = StreamMasterState(spark, str(path))
    with pytest.raises(ValueError, match="corrupt master-state pointer"):
        fresh.read()
    with pytest.raises(ValueError, match="corrupt master-state pointer"):
        fresh.write(_df(spark, [3]))
    # the published version dir survived both refusals
    assert (path / "_v1").is_dir()
    # repairing the pointer restores normal service
    with open(path / "_LATEST", "w") as fh:
        fh.write("1")
    assert _vals(fresh.read()) == [1, 2]


def test_unreadable_pointer_propagates_oserror(spark, tmp_path):
    """A transient I/O/permission error reading _LATEST is NOT first-run
    either (same destruction path); PermissionError must propagate."""
    import pytest

    path = tmp_path / "s"
    st = StreamMasterState(spark, str(path))
    st.write(_df(spark, [7]))
    os.chmod(path / "_LATEST", 0)
    if os.access(path / "_LATEST", os.R_OK):  # running as root: chmod 0
        os.chmod(path / "_LATEST", 0o644)     # is a no-op, nothing to pin
        pytest.skip("process bypasses file permissions (root)")
    try:
        with pytest.raises(PermissionError):
            StreamMasterState(spark, str(path)).read()
    finally:
        os.chmod(path / "_LATEST", 0o644)
