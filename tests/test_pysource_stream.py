"""Streaming cursor-extract source (sources/pysource.DuckDBStreamSource):
incremental delivery, checkpoint resume, no duplicates, replay."""

from __future__ import annotations

import pytest

from dwh_etl_framework_spark.sources.pysource import (
    DuckDBStreamSource,
    _CursorStreamReader,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(DuckDBStreamSource)


def _write(spark, rows, path):
    spark.createDataFrame(rows, "seq long, v string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def _run(spark, src_glob, ckpt, sink: list):
    q = (
        spark.readStream.format("duckdb_stream")
        .option("query", f"SELECT * FROM '{src_glob}'")
        .option("cursor_col", "seq")
        .load()
        .writeStream.foreachBatch(
            lambda df, bid: sink.extend(
                (r["seq"], r["v"]) for r in df.collect()
            )
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_incremental_delivery_across_restarts(spark, tmp_path):
    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    glob = f"{src}/*.parquet/*.parquet"  # Spark writes dir-per-file
    _write(spark, [(1, "a"), (2, "b")], f"{src}/f0.parquet")

    got: list = []
    _run(spark, glob, ckpt, got)
    assert sorted(got) == [(1, "a"), (2, "b")]

    # new rows land; resuming from the SAME checkpoint delivers ONLY them
    _write(spark, [(3, "c"), (4, "d")], f"{src}/f1.parquet")
    _run(spark, glob, ckpt, got)
    assert sorted(got) == [(1, "a"), (2, "b"), (3, "c"), (4, "d")]

    # no new data → no rows, no duplicates
    _run(spark, glob, ckpt, got)
    assert len(got) == 4


def test_replay_between_offsets_is_deterministic(spark, tmp_path):
    src = tmp_path / "src2"
    _write(spark, [(i, f"v{i}") for i in range(1, 8)], f"{src}/f0.parquet")
    r = _CursorStreamReader(f"SELECT * FROM '{src}/*.parquet/*.parquet'", "seq")
    rows = list(r.readBetweenOffsets({"cursor": "2"}, {"cursor": "5"}))
    assert sorted(t[0] for t in rows) == [3, 4, 5]
    # full range from the initial offset
    rows = list(r.readBetweenOffsets({"cursor": None}, {"cursor": "7"}))
    assert sorted(t[0] for t in rows) == [1, 2, 3, 4, 5, 6, 7]


def _run_partitioned(spark, src_glob, ckpt, sink: list, n=4, extra=None):
    reader = (
        spark.readStream.format("duckdb_stream")
        .option("query", f"SELECT * FROM '{src_glob}'")
        .option("cursor_col", "seq")
        .option("partitions", str(n))
    )
    for k, v in (extra or {}).items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.foreachBatch(
            lambda df, bid: sink.append(
                sorted((r["seq"], r["v"]) for r in df.collect())
            )
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_partitioned_backfill_then_increment(spark, tmp_path):
    """The executor-parallel reader (partitions=N): the first batch is
    the whole-history backfill split across N hash-mod range readers —
    complete, no duplicates — and checkpoint resume delivers only the
    cursor's advance, through the same partitioned path."""
    src = tmp_path / "psrc"
    ckpt = str(tmp_path / "pckpt")
    glob = f"{src}/*.parquet/*.parquet"
    backfill = [(i, f"v{i}") for i in range(1, 41)]
    _write(spark, backfill, f"{src}/f0.parquet")

    batches: list = []
    _run_partitioned(spark, glob, ckpt, batches)
    assert sorted(sum(batches, [])) == backfill

    _write(spark, [(41, "x"), (42, "y")], f"{src}/f1.parquet")
    batches.clear()
    _run_partitioned(spark, glob, ckpt, batches)
    assert sorted(sum(batches, [])) == [(41, "x"), (42, "y")]

    # no cursor advance → nothing re-delivered
    batches.clear()
    _run_partitioned(spark, glob, ckpt, batches)
    assert sum(batches, []) == []


def test_partitioned_explicit_partition_col(spark, tmp_path):
    src = tmp_path / "psrc2"
    rows = [(i, f"v{i}") for i in range(1, 21)]
    _write(spark, rows, f"{src}/f0.parquet")
    got: list = []
    _run_partitioned(
        spark,
        f"{src}/*.parquet/*.parquet",
        str(tmp_path / "pckpt2"),
        got,
        n=3,
        extra={"partition_col": "v"},
    )
    assert sorted(sum(got, [])) == rows


def test_partitioned_replay_is_verbatim(spark, tmp_path):
    """partitions(start, end) + read are pure functions of the offset
    pair — re-reading any logged range yields the same rows."""
    from dwh_etl_framework_spark.sources.pysource import (
        _PartitionedCursorStreamReader,
    )

    src = tmp_path / "psrc3"
    _write(spark, [(i, f"v{i}") for i in range(1, 11)], f"{src}/f0.parquet")
    r = _PartitionedCursorStreamReader(
        f"SELECT * FROM '{src}/*.parquet/*.parquet'", "seq", "seq", 4
    )
    assert r.latestOffset() == {"cursor": "10"}

    def rows_between(lo, hi):
        out = []
        for p in r.partitions({"cursor": lo}, {"cursor": hi}):
            for batch in r.read(p):
                out.extend(batch.to_pylist())
        return sorted(row["seq"] for row in out)

    assert rows_between("3", "8") == [4, 5, 6, 7, 8]
    assert rows_between("3", "8") == rows_between("3", "8")
    assert rows_between(None, "10") == list(range(1, 11))


def test_missing_cursor_option_fails(spark, tmp_path):
    src = tmp_path / "src3"
    _write(spark, [(1, "a")], f"{src}/f0.parquet")
    with pytest.raises(Exception, match="cursor_col"):
        (
            spark.readStream.format("duckdb_stream")
            .option("query", f"SELECT * FROM '{src}/*.parquet/*.parquet'")
            .load()
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ck3"))
            .trigger(availableNow=True)
            .start()
            .awaitTermination(60)
        )


def test_capped_backlog_drains_in_bounded_batches_equals_one_shot(spark, tmp_path):
    """VERDICT r10 #5: with max_rows_per_trigger, a 10x backlog drains
    as N capped batches whose union equals the uncapped one-shot batch,
    and every batch stays within the cap (plus boundary value group)."""
    from dwh_etl_framework_spark.sources.pysource import _CursorStreamReader

    src = tmp_path / "bl"
    rows = [(i, f"v{i}") for i in range(1, 101)]  # 100-row backlog
    spark.createDataFrame(rows, "seq long, v string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{src}/f0.parquet")
    query = f"SELECT * FROM '{src}/*.parquet/*.parquet'"

    one_shot = _CursorStreamReader(query, "seq")
    all_rows, off = one_shot.read({"cursor": None})
    all_rows = sorted(r[0] for r in all_rows)
    assert off == {"cursor": "100"} and len(all_rows) == 100

    capped = _CursorStreamReader(query, "seq", max_rows_per_trigger=12)
    got, offsets, cur = [], [], {"cursor": None}
    for _ in range(30):  # safety bound
        batch, nxt = capped.read(cur)
        batch = list(batch)
        if nxt == cur:
            break
        assert len(batch) <= 12
        got.extend(r[0] for r in batch)
        offsets.append(nxt)
        cur = nxt
    assert sorted(got) == all_rows
    assert len(offsets) == 9  # ceil(100/12) capped micro-batches
    # replay of any capped range is verbatim
    replay = sorted(
        r[0] for r in capped.readBetweenOffsets(offsets[2], offsets[3])
    )
    assert replay == list(range(37, 49))


def test_capped_boundary_value_group_is_never_split(spark, tmp_path):
    """Non-unique cursor values: offsets are cursor VALUES, so the batch
    containing a duplicated boundary value serves the WHOLE value group
    (documented over-cap), keeping offset replay exact."""
    from dwh_etl_framework_spark.sources.pysource import _CursorStreamReader

    src = tmp_path / "dup"
    # cursor value 3 appears 5 times, straddling a cap of 4
    rows = [(1, "a"), (2, "b"), (3, "c1"), (3, "c2"), (3, "c3"),
            (3, "c4"), (3, "c5"), (4, "d")]
    spark.createDataFrame(rows, "seq long, v string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{src}/f0.parquet")
    query = f"SELECT * FROM '{src}/*.parquet/*.parquet'"
    r = _CursorStreamReader(query, "seq", max_rows_per_trigger=4)
    b1, o1 = r.read({"cursor": None})
    b1 = sorted(x[1] for x in b1)
    assert o1 == {"cursor": "3"}
    assert b1 == ["a", "b", "c1", "c2", "c3", "c4", "c5"]  # group intact
    b2, o2 = r.read(o1)
    assert sorted(x[1] for x in b2) == ["d"] and o2 == {"cursor": "4"}


def test_capped_stream_end_to_end_micro_batches(spark, tmp_path):
    """The cap through the real readStream surface (default micro-batch
    trigger — the Python stream source does not support availableNow):
    the backlog drains across multiple bounded batches and the sink
    sees every row exactly once."""
    import time

    src = tmp_path / "e2e"
    rows = [(i, f"v{i}") for i in range(1, 61)]
    spark.createDataFrame(rows, "seq long, v string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{src}/f0.parquet")
    out = {"batches": []}

    def sink(df, bid):
        out["batches"].append([r["seq"] for r in df.collect()])

    q = (
        spark.readStream.format("duckdb_stream")
        .option("query", f"SELECT * FROM '{src}/*.parquet/*.parquet'")
        .option("cursor_col", "seq")
        .option("max_rows_per_trigger", "25")
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if sum(len(b) for b in out["batches"]) >= 60:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    nonempty = [b for b in out["batches"] if b]
    assert len(nonempty) == 3  # 60 rows / cap 25 -> 25+25+10
    assert all(len(b) <= 25 for b in nonempty)
    assert sorted(x for b in nonempty for x in b) == list(range(1, 61))


def test_cap_rejected_on_partitioned_reader(spark, tmp_path):
    src = tmp_path / "rej"
    spark.createDataFrame([(1, "a")], "seq long, v string").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{src}/f0.parquet")
    with pytest.raises(Exception, match="max_rows_per_trigger"):
        (
            spark.readStream.format("duckdb_stream")
            .option("query", f"SELECT * FROM '{src}/*.parquet/*.parquet'")
            .option("cursor_col", "seq")
            .option("partitions", "4")
            .option("max_rows_per_trigger", "10")
            .load()
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
            .awaitTermination(60)
        )


def test_numeric_looking_varchar_cursor_keeps_string_semantics(spark, tmp_path):
    """ADVICE r10: _cursor_literal used to unquote any value float()
    accepted, so a VARCHAR cursor whose stored max looked numeric
    ('007') was compared as a NUMBER — leading-zero semantics change
    and mixed data hits per-row cast errors. Quoting now follows the
    INTROSPECTED column type: VARCHAR cursors always compare as
    strings, numeric cursors get a typed CAST."""
    from dwh_etl_framework_spark.sources.pysource import (
        _CursorStreamReader,
        _cursor_literal,
        _introspect_cursor_type,
    )

    src = tmp_path / "vsrc"
    rows = [("001", "a"), ("007", "b"), ("00x", "c"), ("10", "d")]
    spark.createDataFrame(rows, "c string, v string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{src}/f0.parquet")
    query = f"SELECT * FROM '{src}/*.parquet/*.parquet'"
    assert _introspect_cursor_type(query, "c").upper() == "VARCHAR"
    r = _CursorStreamReader(query, "c")
    # string MAX: '10' > '00x' lexicographically
    batch, off = r.read({"cursor": None})
    assert off == {"cursor": "10"}
    # '001' < c <= '00x' as STRINGS picks exactly b and c; numeric
    # comparison would have errored on '00x' or picked the wrong rows
    got = sorted(t[1] for t in r.readBetweenOffsets(
        {"cursor": "001"}, {"cursor": "00x"}
    ))
    assert got == ["b", "c"]
    # and a numeric column gets a typed CAST, so '007' means 7
    assert _cursor_literal("007", "BIGINT") == "CAST('007' AS BIGINT)"
    assert _cursor_literal("007", "VARCHAR") == "'007'"
    assert _cursor_literal("inf", "DOUBLE") == "CAST('inf' AS DOUBLE)"


def test_string_cursor_quoting_path(spark, tmp_path):
    """ISO-timestamp (VARCHAR) cursors exercise _cursor_literal's quoted
    branch — including an embedded quote — through both readers' shared
    range predicate."""
    from dwh_etl_framework_spark.sources.pysource import (
        _CursorStreamReader,
        _PartitionedCursorStreamReader,
    )

    src = tmp_path / "ssrc"
    rows = [(f"2024-01-0{i}T00:00:0{i}", f"v{i}") for i in range(1, 8)]
    spark.createDataFrame(rows, "ts string, v string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{src}/f0.parquet")
    query = f"SELECT * FROM '{src}/*.parquet/*.parquet'"

    simple = _CursorStreamReader(query, "ts")
    assert simple.initialOffset() == {"cursor": None}
    batch, off = simple.read({"cursor": None})
    assert off == {"cursor": "2024-01-07T00:00:07"}
    assert sorted(r[1] for r in batch) == [f"v{i}" for i in range(1, 8)]
    replay = list(
        simple.readBetweenOffsets(
            {"cursor": "2024-01-02T00:00:02"},
            {"cursor": "2024-01-05T00:00:05"},
        )
    )
    assert sorted(r[1] for r in replay) == ["v3", "v4", "v5"]

    part = _PartitionedCursorStreamReader(query, "ts", "v", 3)
    assert part.latestOffset() == {"cursor": "2024-01-07T00:00:07"}
    got = []
    for p in part.partitions(
        {"cursor": "2024-01-02T00:00:02"}, {"cursor": "2024-01-07T00:00:07"}
    ):
        for b in part.read(p):
            got.extend(b.to_pylist())
    assert sorted(r["v"] for r in got) == [f"v{i}" for i in range(3, 8)]
    # a cursor value carrying a quote must not break (or inject into)
    # the predicate — the escaping path
    weird = _CursorStreamReader(query, "ts")
    rows2 = list(
        weird.readBetweenOffsets({"cursor": "2024-01-0'1"}, {"cursor": "z"})
    )
    assert sorted(r[1] for r in rows2) == [f"v{i}" for i in range(1, 8)]
