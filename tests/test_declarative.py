"""Local SDP executor (plans/declarative.py): ordering, incrementality,
fail-loud scope edges — the semantics behind the f43 docstring."""

from __future__ import annotations

import pytest
import pyspark.pipelines as sdp
from pyspark.errors.exceptions.captured import AnalysisException

from dwh_etl_framework_spark.plans.declarative import (
    LocalGraphRegistry,
    declare,
    run_local_pipeline,
)


def test_mv_chain_resolves_out_of_authoring_order(spark, tmp_path):
    """The consumer is declared FIRST; the retry pass must defer it,
    materialize its upstream, then finish it on the next pass."""
    reg = LocalGraphRegistry()

    def define():
        @sdp.materialized_view(name="t_sdp_report")
        def report():
            return spark.table("t_sdp_base").groupBy("k").count()

        @sdp.materialized_view(name="t_sdp_base")
        def base():
            return spark.range(12).selectExpr("id % 3 AS k", "id AS v")

    declare(reg, define)
    out = run_local_pipeline(spark, reg, str(tmp_path))
    assert out["t_sdp_report"].count() == 3
    # materialized: the report is served from its parquet landing
    assert (tmp_path / "t_sdp_report").exists()
    assert (tmp_path / "t_sdp_base").exists()


def test_temporary_view_stays_logical(spark, tmp_path):
    reg = LocalGraphRegistry()

    def define():
        @sdp.temporary_view(name="t_sdp_tv")
        def tv():
            return spark.range(5).selectExpr("id AS v")

        @sdp.materialized_view(name="t_sdp_tv_sink")
        def sink():
            return spark.table("t_sdp_tv").filter("v >= 2")

    declare(reg, define)
    out = run_local_pipeline(spark, reg, str(tmp_path))
    assert out["t_sdp_tv_sink"].count() == 3
    assert not (tmp_path / "t_sdp_tv").exists()  # no storage for views


def test_streaming_table_is_incremental_across_runs(spark, tmp_path):
    """Two append flows land into one streaming table; re-running the
    whole pipeline over unchanged sources appends NOTHING (per-flow
    checkpoints), and new source data arrives exactly once."""
    src_a, src_b = str(tmp_path / "a"), str(tmp_path / "b")
    spark.range(30).selectExpr("id AS v").write.parquet(src_a)
    spark.range(30, 50).selectExpr("id AS v").write.parquet(src_b)
    reg = LocalGraphRegistry()

    def define():
        sdp.create_streaming_table("t_sdp_st")

        @sdp.append_flow(target="t_sdp_st", name="flow_a")
        def flow_a():
            return spark.readStream.schema("v bigint").parquet(src_a)

        @sdp.append_flow(target="t_sdp_st", name="flow_b")
        def flow_b():
            return spark.readStream.schema("v bigint").parquet(src_b)

    declare(reg, define)
    store = str(tmp_path / "store")
    assert run_local_pipeline(spark, reg, store)["t_sdp_st"].count() == 50
    # unchanged sources: exactly-once, not doubled
    assert run_local_pipeline(spark, reg, store)["t_sdp_st"].count() == 50
    # new file in one source: only the delta lands
    spark.range(50, 60).selectExpr("id AS v").write.mode("append").parquet(src_a)
    assert run_local_pipeline(spark, reg, store)["t_sdp_st"].count() == 60


def test_cycle_raises_with_both_names(spark, tmp_path):
    reg = LocalGraphRegistry()

    def define():
        @sdp.materialized_view(name="t_sdp_cyc_a")
        def a():
            return spark.table("t_sdp_cyc_b")

        @sdp.materialized_view(name="t_sdp_cyc_b")
        def b():
            return spark.table("t_sdp_cyc_a")

    declare(reg, define)
    with pytest.raises(RuntimeError, match="cannot make progress"):
        run_local_pipeline(spark, reg, str(tmp_path))


def test_out_of_graph_reference_fails_immediately(spark, tmp_path):
    """A missing table that is NOT a graph output can never appear —
    raise the analysis error instead of spinning the retry loop."""
    reg = LocalGraphRegistry()

    def define():
        @sdp.materialized_view(name="t_sdp_orphan")
        def orphan():
            return spark.table("t_sdp_never_defined_anywhere")

    declare(reg, define)
    with pytest.raises(AnalysisException):
        run_local_pipeline(spark, reg, str(tmp_path))


def test_flow_spark_conf_applied_and_restored(spark, tmp_path):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    seen = {}
    reg = LocalGraphRegistry()

    def define():
        @sdp.materialized_view(
            name="t_sdp_conf", spark_conf={"spark.sql.shuffle.partitions": "3"}
        )
        def conf_probe():
            seen["during"] = spark.conf.get("spark.sql.shuffle.partitions")
            return spark.range(4).selectExpr("id AS v")

    declare(reg, define)
    run_local_pipeline(spark, reg, str(tmp_path))
    assert seen["during"] == "3"
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_partition_cols_shape_the_landing(spark, tmp_path):
    reg = LocalGraphRegistry()

    def define():
        @sdp.materialized_view(name="t_sdp_part", partition_cols=["k"])
        def part():
            return spark.range(6).selectExpr("id % 2 AS k", "id AS v")

    declare(reg, define)
    out = run_local_pipeline(spark, reg, str(tmp_path))
    assert out["t_sdp_part"].count() == 6
    assert (tmp_path / "t_sdp_part" / "k=0").exists()


def test_scope_edges_fail_loud(spark, tmp_path):
    # sql-file elements are Connect-registry territory
    with pytest.raises(NotImplementedError, match="plans.steps"):
        LocalGraphRegistry().register_sql("CREATE ...", tmp_path)
    # duplicate dataset names
    reg = LocalGraphRegistry()

    def define():
        @sdp.materialized_view(name="t_sdp_dup")
        def one():
            return spark.range(1)

    declare(reg, define)
    with pytest.raises(ValueError, match="duplicate"):
        declare(reg, define)
    # batch flow into a streaming table
    reg2 = LocalGraphRegistry()

    def define2():
        sdp.create_streaming_table("t_sdp_st_batch")

        @sdp.append_flow(target="t_sdp_st_batch", name="batchy")
        def batchy():
            return spark.range(3).selectExpr("id AS v")

    declare(reg2, define2)
    with pytest.raises(TypeError, match="batch DataFrame"):
        run_local_pipeline(spark, reg2, str(tmp_path / "st_batch"))


def test_jdbc_sink_lands_in_derby_exactly_once(spark, tmp_path):
    """An SDP jdbc sink routes through the F15 writer via foreachBatch:
    the Derby table receives the stream's rows, and re-running the
    pipeline over an unchanged source appends nothing (checkpointed
    batch ids)."""
    url = "jdbc:derby:memory:sdpsink;create=true"
    opts = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    src = str(tmp_path / "src")
    spark.range(25).selectExpr("id AS v").write.parquet(src)
    # pre-create the target so types are fixed by DDL, then append
    spark.createDataFrame([], "v bigint").write.format("jdbc").option(
        "url", url
    ).option("dbtable", "sdp_out").options(**opts).mode("overwrite").save()

    reg = LocalGraphRegistry()

    def define():
        sdp.create_sink(
            "t_sdp_jdbc",
            format="jdbc",
            options={"url": url, "dbtable": "sdp_out", **opts},
        )

        @sdp.append_flow(target="t_sdp_jdbc", name="to_derby")
        def to_derby():
            return spark.readStream.schema("v bigint").parquet(src)

    declare(reg, define)
    store = str(tmp_path / "store")

    def derby_count():
        return (
            spark.read.format("jdbc")
            .option("url", url)
            .option("dbtable", "sdp_out")
            .options(**opts)
            .load()
            .count()
        )

    run_local_pipeline(spark, reg, store)
    assert derby_count() == 25
    run_local_pipeline(spark, reg, store)  # unchanged source: no re-append
    assert derby_count() == 25


def test_jdbc_sink_requires_url_and_table(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.range(3).selectExpr("id AS v").write.parquet(src)
    reg = LocalGraphRegistry()

    def define():
        sdp.create_sink("t_sdp_jdbc_bad", format="jdbc", options={})

        @sdp.append_flow(target="t_sdp_jdbc_bad", name="nowhere")
        def nowhere():
            return spark.readStream.schema("v bigint").parquet(src)

    declare(reg, define)
    with pytest.raises(ValueError, match="url"):
        run_local_pipeline(spark, reg, str(tmp_path / "store"))


def test_unknown_flow_target_rejected(spark, tmp_path):
    """A flow naming a target that was never declared is a config typo —
    it must fail validation, not be silently dropped (review r12)."""
    reg = LocalGraphRegistry()

    def define():
        sdp.create_streaming_table("t_sdp_real")

        @sdp.append_flow(target="t_sdp_reel", name="typo")  # note the typo
        def typo():
            return spark.readStream.format("rate").load()

    declare(reg, define)
    with pytest.raises(ValueError, match="unknown dataset 't_sdp_reel'"):
        run_local_pipeline(spark, reg, str(tmp_path))


def test_duplicate_flow_names_rejected(spark, tmp_path):
    """Flow names key checkpoint/landing dirs — duplicates would share a
    commit log (the per-path collision), so they are rejected up front."""
    reg = LocalGraphRegistry()

    def define():
        sdp.create_streaming_table("t_sdp_dupflow")

        @sdp.append_flow(target="t_sdp_dupflow", name="load")
        def load_a():
            return spark.readStream.format("rate").load()

        @sdp.append_flow(target="t_sdp_dupflow", name="load")
        def load_b():
            return spark.readStream.format("rate").load()

    declare(reg, define)
    with pytest.raises(ValueError, match="duplicate flow name 'load'"):
        run_local_pipeline(spark, reg, str(tmp_path))


def test_empty_source_registers_empty_streaming_table(spark, tmp_path):
    """A valid-but-empty source commits zero batches and never creates
    its sink dir; the table must register EMPTY with the stream's
    schema, not crash on read-back (review r12)."""
    import os

    src = str(tmp_path / "src")
    os.makedirs(src)  # exists but holds no files
    reg = LocalGraphRegistry()

    def define():
        sdp.create_streaming_table("t_sdp_empty")

        @sdp.append_flow(target="t_sdp_empty", name="nothing_yet")
        def nothing_yet():
            return spark.readStream.schema("v bigint").parquet(src)

    declare(reg, define)
    out = run_local_pipeline(spark, reg, str(tmp_path / "store"))
    assert out["t_sdp_empty"].columns == ["v"]
    assert out["t_sdp_empty"].count() == 0


def test_temp_view_conf_scope_is_plan_time(spark, tmp_path):
    """VERDICT r12 'what's wrong' #1, contract pinned: flow spark_conf on
    a @temporary_view governs PLAN CONSTRUCTION. Analysis-time semantics
    stick — 1/0 analyzed under ansi=false keeps legacy NULL-on-zero
    evalMode even though the downstream flow EXECUTES it after the conf
    was restored to ansi=true."""
    before = spark.conf.get("spark.sql.ansi.enabled", None)
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        reg = LocalGraphRegistry()

        def define():
            @sdp.temporary_view(
                name="t_sdp_ansi_tv",
                spark_conf={"spark.sql.ansi.enabled": "false"},
            )
            def tv():
                # id=0 row divides by zero: ansi=true would raise AT
                # EXECUTION; legacy evalMode (baked at analysis) yields NULL
                return spark.range(3).selectExpr("id", "1/id AS inv")

            @sdp.materialized_view(name="t_sdp_ansi_mv")
            def mv():
                return spark.table("t_sdp_ansi_tv").filter("inv IS NULL")

        declare(reg, define)
        assert spark.conf.get("spark.sql.ansi.enabled") == "true"
        out = run_local_pipeline(spark, reg, str(tmp_path))
        # executed under the RESTORED ansi=true session conf, yet the
        # view's plan kept the in-scope legacy division semantics
        assert out["t_sdp_ansi_mv"].count() == 1
        assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    finally:
        if before is None:
            spark.conf.unset("spark.sql.ansi.enabled")
        else:
            spark.conf.set("spark.sql.ansi.enabled", before)


def test_temp_view_names_do_not_outlive_the_run(spark, tmp_path):
    """Upstream: a TemporaryView 'is not visible outside of the graph'.
    Graph-internal names are dropped when the run ends; the returned
    DataFrame stays valid (it holds the analyzed plan, not the name)."""
    reg = LocalGraphRegistry()

    def define():
        @sdp.temporary_view(name="t_sdp_scoped_tv")
        def tv():
            return spark.range(4).selectExpr("id AS v")

        @sdp.materialized_view(name="t_sdp_scoped_mv")
        def mv():
            return spark.table("t_sdp_scoped_tv").filter("v > 0")

    declare(reg, define)
    out = run_local_pipeline(spark, reg, str(tmp_path))
    assert not spark.catalog.tableExists("t_sdp_scoped_tv")
    # MV read-back views stay registered (they name real landings)
    assert spark.catalog.tableExists("t_sdp_scoped_mv")
    assert out["t_sdp_scoped_tv"].count() == 4  # plan outlives the name
    spark.catalog.dropTempView("t_sdp_scoped_mv")


def test_preexisting_temp_view_cannot_shadow_graph_output(spark, tmp_path):
    """ADVICE r12: a session temp view named like a graph output must not
    be read stale by a consumer on the first pass — the runner pre-drops
    it, so the consumer DEFERS until the graph's own version lands."""
    spark.range(999).selectExpr("id AS v").createOrReplaceTempView(
        "t_sdp_shadowed"
    )
    try:
        reg = LocalGraphRegistry()

        def define():
            # consumer FIRST: with the stale view present it would
            # resolve immediately and count 999 rows
            @sdp.materialized_view(name="t_sdp_shadow_report")
            def report():
                return spark.table("t_sdp_shadowed").groupBy().count()

            @sdp.materialized_view(name="t_sdp_shadowed")
            def fresh():
                return spark.range(7).selectExpr("id AS v")

        declare(reg, define)
        out = run_local_pipeline(spark, reg, str(tmp_path))
        assert out["t_sdp_shadow_report"].collect()[0][0] == 7
    finally:
        for n in ("t_sdp_shadowed", "t_sdp_shadow_report"):
            spark.catalog.dropTempView(n)


def test_sdp_table_batch_query_is_full_refresh(spark, tmp_path):
    """ADVICE r12: @sdp.table with a batch query function (upstream
    full-refresh semantics) materializes as an overwrite landing and is
    recomputed on every run — while a batch @append_flow into a
    streaming table remains a TypeError (test_scope_edges_fail_loud)."""
    src = {"n": 5}
    reg = LocalGraphRegistry()

    def define():
        @sdp.table(name="t_sdp_full_refresh")
        def t():
            return spark.range(src["n"]).selectExpr("id AS v")

    declare(reg, define)
    out = run_local_pipeline(spark, reg, str(tmp_path))
    assert out["t_sdp_full_refresh"].count() == 5
    src["n"] = 8  # full refresh: the second run REPLACES, not appends
    reg2 = LocalGraphRegistry()
    declare(reg2, define)
    out2 = run_local_pipeline(spark, reg2, str(tmp_path))
    assert out2["t_sdp_full_refresh"].count() == 8
    spark.catalog.dropTempView("t_sdp_full_refresh")


def test_corrupt_streaming_landing_raises_not_empty(spark, tmp_path):
    """ADVICE r12 (medium): the read-back fallback is ONLY for a sink dir
    the stream never created (zero committed batches). A landing that
    exists but cannot be read must RAISE, not register an empty table."""
    import os

    src = str(tmp_path / "src")
    os.makedirs(src)
    spark.range(3).selectExpr("id AS v").write.parquet(src, mode="overwrite")
    store = tmp_path / "store"
    reg = LocalGraphRegistry()

    def define():
        sdp.create_streaming_table("t_sdp_corrupt")

        @sdp.append_flow(target="t_sdp_corrupt", name="feed")
        def feed():
            return spark.readStream.schema("v bigint").parquet(src)

    declare(reg, define)
    run_local_pipeline(spark, reg, str(store))
    # corrupt the landing: replace every parquet data file with garbage
    landing = store / "t_sdp_corrupt" / "feed"
    datafiles = [p for p in landing.glob("*.parquet")]
    assert datafiles, "expected committed parquet files"
    for p in datafiles:
        p.write_bytes(b"not parquet at all")
    reg2 = LocalGraphRegistry()
    declare(reg2, define)
    with pytest.raises(Exception) as ei:
        # re-run: checkpoint appends nothing, read-back must fail LOUD
        df = run_local_pipeline(spark, reg2, str(store))["t_sdp_corrupt"]
        df.count()
    assert "not_found" not in str(ei.value).lower()
    spark.catalog.dropTempView("t_sdp_corrupt")


def test_catalog_table_shadowing_graph_output_raises(spark, tmp_path):
    """A PERSISTENT catalog table named like a graph output fails loud
    up front (we will not drop user tables, and the consumer would read
    it stale otherwise)."""
    spark.sql("DROP TABLE IF EXISTS t_sdp_cat_shadow")
    spark.sql("CREATE TABLE t_sdp_cat_shadow (v BIGINT) USING parquet")
    try:
        reg = LocalGraphRegistry()

        def define():
            @sdp.materialized_view(name="t_sdp_cat_shadow")
            def x():
                return spark.range(2).selectExpr("id AS v")

        declare(reg, define)
        with pytest.raises(ValueError, match="shadows a pre-existing"):
            run_local_pipeline(spark, reg, str(tmp_path))
    finally:
        spark.sql("DROP TABLE IF EXISTS t_sdp_cat_shadow")


def test_depends_on_hints_plan_deep_chain_in_one_pass(spark, tmp_path):
    """VERDICT r12 item 7: static dependency hints remove the O(N²)
    retry-planning cost — a 6-deep chain declared CONSUMER-FIRST plans
    in one pass (attempts == N) with hints, and produces the identical
    result without them (retry remains the fallback)."""
    N = 6

    def define():
        def mk(i):
            if i == 0:
                @sdp.materialized_view(name="t_sdp_chain_0")
                def base():
                    return spark.range(10).selectExpr("id AS v")
            else:
                @sdp.materialized_view(name=f"t_sdp_chain_{i}")
                def step():
                    return spark.table(f"t_sdp_chain_{i - 1}").selectExpr(
                        "v + 1 AS v"
                    )
        for i in reversed(range(N)):  # consumer-first authoring order
            mk(i)

    reg = LocalGraphRegistry()
    declare(reg, define)
    hints = {f"t_sdp_chain_{i}": [f"t_sdp_chain_{i - 1}"] for i in range(1, N)}
    stats = {}
    out = run_local_pipeline(
        spark, reg, str(tmp_path / "hinted"), depends_on=hints, stats=stats
    )
    assert stats["attempts"] == N and stats["passes"] == 1
    hinted_sum = out[f"t_sdp_chain_{N - 1}"].groupBy().sum("v").collect()[0][0]

    reg2 = LocalGraphRegistry()
    declare(reg2, define)
    stats2 = {}
    out2 = run_local_pipeline(
        spark, reg2, str(tmp_path / "unhinted"), stats=stats2
    )
    assert stats2["attempts"] > N  # retry discovery paid the extra passes
    assert (
        out2[f"t_sdp_chain_{N - 1}"].groupBy().sum("v").collect()[0][0]
        == hinted_sum
    )
    for i in range(N):
        spark.catalog.dropTempView(f"t_sdp_chain_{i}")

    # hint validation: unknown names and hint-cycles fail loud
    reg3 = LocalGraphRegistry()
    declare(reg3, define)
    with pytest.raises(ValueError, match="not in the graph"):
        run_local_pipeline(
            spark, reg3, str(tmp_path / "bad"),
            depends_on={"t_sdp_chain_1": ["nope"]},
        )
    with pytest.raises(ValueError, match="cycle"):
        run_local_pipeline(
            spark, reg3, str(tmp_path / "cyc"),
            depends_on={
                "t_sdp_chain_1": ["t_sdp_chain_2"],
                "t_sdp_chain_2": ["t_sdp_chain_1"],
            },
        )


def test_csv_and_json_sinks_land_exactly_once(spark, tmp_path):
    """ADVICE r12 follow-on: file sinks beyond parquet ride the same
    checkpointed file-sink commit log — csv (with header) and json land
    the stream's rows once, and an unchanged-source re-run appends
    nothing."""
    src = str(tmp_path / "src")
    spark.range(10).selectExpr("id AS v").write.parquet(src)
    csv_out = str(tmp_path / "csv_out")
    json_out = str(tmp_path / "json_out")
    reg = LocalGraphRegistry()

    def define():
        sdp.create_sink(
            "t_sdp_csv", format="csv",
            options={"path": csv_out, "header": "true"},
        )
        sdp.create_sink("t_sdp_json", format="json",
                        options={"path": json_out})

        @sdp.append_flow(target="t_sdp_csv", name="to_csv")
        def to_csv():
            return spark.readStream.schema("v bigint").parquet(src)

        @sdp.append_flow(target="t_sdp_json", name="to_json")
        def to_json():
            return spark.readStream.schema("v bigint").parquet(src)

    declare(reg, define)
    store = str(tmp_path / "store")
    run_local_pipeline(spark, reg, store)
    got_csv = spark.read.option("header", "true").schema("v bigint").csv(
        csv_out
    )
    assert sorted(r["v"] for r in got_csv.collect()) == list(range(10))
    got_json = spark.read.schema("v bigint").json(json_out)
    assert sorted(r["v"] for r in got_json.collect()) == list(range(10))
    run_local_pipeline(spark, reg, store)  # unchanged source: no re-append
    assert spark.read.option("header", "true").schema("v bigint").csv(
        csv_out
    ).count() == 10


def test_batch_flow_cannot_overwrite_streaming_history(spark, tmp_path):
    """Review r13: a single batch flow named like its streaming-table
    target gets full-refresh treatment ONLY when no streaming checkpoint
    exists — switching an already-checkpointed append flow to batch must
    fail loud, not silently destroy the appended history."""
    src = str(tmp_path / "src")
    spark.range(4).selectExpr("id AS v").write.parquet(src)
    store = str(tmp_path / "store")

    def define_streaming():
        sdp.create_streaming_table("t_sdp_hist")

        @sdp.append_flow(target="t_sdp_hist", name="t_sdp_hist")
        def t_sdp_hist():
            return spark.readStream.schema("v bigint").parquet(src)

    reg = LocalGraphRegistry()
    declare(reg, define_streaming)
    out = run_local_pipeline(spark, reg, store)
    assert out["t_sdp_hist"].count() == 4  # checkpointed append landing

    def define_batch():
        sdp.create_streaming_table("t_sdp_hist")

        @sdp.append_flow(target="t_sdp_hist", name="t_sdp_hist")
        def t_sdp_hist():
            return spark.range(1).selectExpr("id AS v")  # now batch

    reg2 = LocalGraphRegistry()
    declare(reg2, define_batch)
    with pytest.raises(TypeError, match="streaming checkpoint"):
        run_local_pipeline(spark, reg2, store)
    # the landing is untouched
    assert spark.read.parquet(f"{store}/t_sdp_hist/t_sdp_hist").count() == 4
    spark.catalog.dropTempView("t_sdp_hist")
    # review r13 second pass: the guard covers history appended by
    # DIFFERENTLY-NAMED flows too — redefining the table as a batch
    # @sdp.table (flow named like the target) must also fail loud
    def define_table_batch():
        @sdp.table(name="t_sdp_hist")
        def t_sdp_hist():
            return spark.range(1).selectExpr("id AS v")

    reg3 = LocalGraphRegistry()

    def define_other_flow():
        sdp.create_streaming_table("t_sdp_hist")

        @sdp.append_flow(target="t_sdp_hist", name="other_ingest")
        def other_ingest():
            return spark.readStream.schema("v bigint").parquet(src)

    declare(reg3, define_other_flow)
    run_local_pipeline(spark, reg3, store)  # second flow, own checkpoint
    reg4 = LocalGraphRegistry()
    declare(reg4, define_table_batch)
    with pytest.raises(TypeError, match="streaming checkpoint"):
        run_local_pipeline(spark, reg4, store)
    spark.catalog.dropTempView("t_sdp_hist")


def test_streaming_flow_cannot_bury_batch_landing(spark, tmp_path):
    """ADVICE r13: the REVERSE switch of the checkpoint guard — a table
    first materialized as a batch full-refresh landing (no
    _spark_metadata, no checkpoint) that is later redefined as a
    streaming flow must fail loud BEFORE the sink starts: a file-sink
    commit log written into the batch dir would make committed reads see
    only streaming files, silently vanishing the prior batch rows."""
    store = str(tmp_path / "store")

    def define_batch():
        @sdp.table(name="t_sdp_flip")
        def t_sdp_flip():
            return spark.range(6).selectExpr("id AS v")

    reg = LocalGraphRegistry()
    declare(reg, define_batch)
    out = run_local_pipeline(spark, reg, store)
    assert out["t_sdp_flip"].count() == 6  # batch overwrite landing

    src = str(tmp_path / "src")
    spark.range(3).selectExpr("id AS v").write.parquet(src)

    def define_streaming():
        sdp.create_streaming_table("t_sdp_flip")

        @sdp.append_flow(target="t_sdp_flip", name="t_sdp_flip")
        def t_sdp_flip():
            return spark.readStream.schema("v bigint").parquet(src)

    reg2 = LocalGraphRegistry()
    declare(reg2, define_streaming)
    with pytest.raises(TypeError, match="_spark_metadata"):
        run_local_pipeline(spark, reg2, store)
    # the batch landing is untouched: all 6 rows still readable, no
    # commit log was started
    assert spark.read.parquet(f"{store}/t_sdp_flip/t_sdp_flip").count() == 6
    spark.catalog.dropTempView("t_sdp_flip")


def test_streaming_sdp_table_builds_plan_once(spark, tmp_path):
    """Review r13: a streaming @sdp.table probes batchness and then
    REUSES the plan — the user's query function runs once per pipeline
    run, not twice."""
    src = str(tmp_path / "src")
    spark.range(3).selectExpr("id AS v").write.parquet(src)
    calls = {"n": 0}

    def define():
        @sdp.table(name="t_sdp_once")
        def t_sdp_once():
            calls["n"] += 1
            return spark.readStream.schema("v bigint").parquet(src)

    reg = LocalGraphRegistry()
    declare(reg, define)
    out = run_local_pipeline(spark, reg, str(tmp_path / "store"))
    assert out["t_sdp_once"].count() == 3
    assert calls["n"] == 1
    spark.catalog.dropTempView("t_sdp_once")


def test_failed_namespace_guard_leaves_user_views_intact(spark, tmp_path):
    """Review r13: validation of EVERY output runs before ANY temp view
    is dropped — a graph that fails the guard must not have already
    destroyed the user's session views."""
    spark.range(9).selectExpr("id AS v").createOrReplaceTempView(
        "t_sdp_keepme"
    )
    spark.sql("DROP TABLE IF EXISTS t_sdp_cat2")
    spark.sql("CREATE TABLE t_sdp_cat2 (v BIGINT) USING parquet")
    try:
        reg = LocalGraphRegistry()

        def define():
            @sdp.materialized_view(name="t_sdp_keepme")
            def a():
                return spark.range(1).selectExpr("id AS v")

            @sdp.materialized_view(name="t_sdp_cat2")
            def b():
                return spark.range(2).selectExpr("id AS v")

        declare(reg, define)
        with pytest.raises(ValueError, match="shadows a pre-existing"):
            run_local_pipeline(spark, reg, str(tmp_path))
        # the guard failed on t_sdp_cat2 BEFORE dropping t_sdp_keepme
        assert spark.table("t_sdp_keepme").count() == 9
    finally:
        spark.sql("DROP TABLE IF EXISTS t_sdp_cat2")
        spark.catalog.dropTempView("t_sdp_keepme")
