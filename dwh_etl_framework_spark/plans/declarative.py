"""Local executor for Spark Declarative Pipelines (SDP) graphs.

This Spark build ships the SDP *authoring* API (``pyspark.pipelines`` —
``@sdp.materialized_view`` / ``@sdp.table`` / ``@sdp.temporary_view`` /
``@sdp.append_flow``), but its *runner* is Spark-Connect-only: the CLI
lowers the graph to protobuf PipelineCommands
(``pyspark/pipelines/spark_connect_pipeline.py``), and protobuf is not
available in every deployment (nor is a Connect server). This module
closes that gap with a LOCAL executor: declarations are collected
through the same public ``GraphElementRegistry`` contract the Connect
registry implements, then materialized on the classic session —
so a pipeline authored once against the public SDP API runs here
unchanged, and moves to a Connect runner later without edits.

Execution model (mirrors the framework's F24 transform DAG — the
reference's Kahn-ordered task factory, ``airflow_etl.py`` transform
tier — but discovers edges at runtime):

- Dependency order is resolved by *retry*: each pass tries every
  unmaterialized output; a flow that fails ONLY because another graph
  output is not yet materialized (``TABLE_OR_VIEW_NOT_FOUND`` naming a
  registered output) is deferred to the next pass. A full pass with no
  progress raises with every pending output's error — a cycle cannot
  spin, and a reference to a table OUTSIDE the graph fails immediately
  (it could never succeed later).
- Dependency edges may also be declared STATICALLY via the optional
  ``depends_on={"consumer": ["upstream", ...]}`` argument: hinted
  outputs are Kahn-ordered before the first pass, so a fully-hinted
  N-deep chain plans in ONE pass (no O(N²) retry attempts). Hints are
  advisory ordering only — retry discovery remains the fallback, and
  the materialized results are identical with or without them.
- Before the run loop the output NAMESPACE is validated: a registered
  output name that already resolves to a PERSISTENT catalog table
  raises (a consumer flow would silently read the pre-existing table
  on its first pass instead of deferring); a pre-existing TEMP VIEW
  with that name is dropped up front (the graph replaces it anyway —
  dropping converts the stale-read hazard into a correct deferral).
- ``MaterializedView`` → compute once, land as parquet under
  ``storage/<name>`` (``partition_cols`` honored), register the
  READ-BACK as the view — downstream flows scan the landing, not the
  plan, exactly like the checkpoint-cache step (F9). MV and
  streaming-table read-back views stay registered in the session after
  the run (they name real landings — the local analogue of publishing
  to the catalog).
- ``TemporaryView`` → logical ``createOrReplaceTempView`` (no
  storage), visible to downstream flows DURING the run and dropped in
  a ``finally`` when the run ends (upstream: a temporary view "is not
  visible outside of the graph"); the returned DataFrame stays valid —
  it holds the analyzed plan, not the name.
- ``StreamingTable`` → every ``@append_flow`` targeting it runs as an
  availableNow streaming write (parquet, append) with its OWN
  checkpoint under ``storage/_checkpoints/<table>/<flow>`` — re-running
  the pipeline over an unchanged source appends NOTHING (exactly-once
  per checkpoint), which is the incremental-refresh semantics a
  Connect runner provides. A ``@sdp.table`` whose query function
  returns a BATCH DataFrame (upstream: a full-refresh table — the
  decorator registers a StreamingTable plus a flow named like the
  target) is materialized as an OVERWRITE landing, recomputed on every
  run; a batch DataFrame from an ``@append_flow`` (a differently-named
  flow) is still a TypeError — appending a batch result to a
  checkpointed streaming landing has no exactly-once story.
- Flow-level ``spark_conf`` is set for the duration of the flow's
  compute+write and restored after, win or lose. Scope caveat for
  ``@sdp.temporary_view``: a temp view is logical, so only the flow's
  PLAN CONSTRUCTION runs under the conf — analysis-time semantics
  (e.g. ``spark.sql.ansi.enabled`` baking evalMode into expressions)
  stick in the stored plan, but confs read at EXECUTION time (shuffle
  partitions, codegen flags) are long restored by the time a
  downstream flow's action runs. MV/streaming-table/sink flows execute
  their write in-scope, so both kinds apply there.
  (``tests/test_declarative.py::test_temp_view_conf_scope_is_plan_time``
  pins this contract.)

``Sink`` outputs support the file sinks parquet/csv/json/orc (path via
``options={"path": …}``, format options passed through — all four ride
Spark's checkpointed file-sink commit log), noop, and jdbc (the F15
sink via ``foreachBatch`` — checkpointed batch ids make
unchanged-source re-runs append nothing; a mid-write crash may
re-append on restart, the documented at-least-once edge of
``foreachBatch``).

Deliberately out of scope (fail loud, never silently skip):
``register_sql`` (SQL-file graph elements — author SQL steps through
``plans.steps`` instead), ``Sink`` formats beyond those six, and
batch ``@append_flow``s targeting streaming tables (``@sdp.table``
with a batch query function IS supported — full refresh, see above;
a single batch flow explicitly NAMED like its target is
indistinguishable from ``@sdp.table`` through the public Flow record
and gets the same treatment, unless a streaming checkpoint already
exists for it — then it fails loud instead of destroying history).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from pyspark.pipelines.flow import Flow
from pyspark.pipelines.graph_element_registry import (
    GraphElementRegistry,
    graph_element_registration_context,
)
from pyspark.pipelines.output import (
    MaterializedView,
    Output,
    Sink,
    StreamingTable,
    TemporaryView,
)


class LocalGraphRegistry(GraphElementRegistry):
    """Collects SDP declarations through the public registry contract."""

    def __init__(self) -> None:
        self.outputs: dict[str, Output] = {}
        self.flows: list[Flow] = []

    def register_output(self, output: Output) -> None:
        if output.name in self.outputs:
            raise ValueError(f"duplicate dataset name: {output.name!r}")
        self.outputs[output.name] = output

    def register_flow(self, flow: Flow) -> None:
        self.flows.append(flow)

    def register_sql(self, sql_text: str, file_path) -> None:
        raise NotImplementedError(
            "SQL-file graph elements need the Connect-backed registry; "
            "author SQL transforms through plans.steps (F7/F12) instead"
        )


def declare(registry: LocalGraphRegistry, define: Callable[[], None]) -> None:
    """Run ``define()`` (a function containing ``@sdp.*`` decorators)
    with ``registry`` as the active graph-element registry."""
    with graph_element_registration_context(registry):
        define()


def _missing_relation(exc: Exception) -> str | None:
    """If ``exc`` is an unresolved-relation error, return the bare
    relation name; else None. Works across the 4.x condition rename."""
    get = getattr(exc, "getCondition", None) or getattr(
        exc, "getErrorClass", None
    )
    cond = get() if get else None
    if not cond or "TABLE_OR_VIEW_NOT_FOUND" not in cond:
        return None
    params = exc.getMessageParameters() or {}
    rel = params.get("relationName", "")
    return rel.strip("`").split("`.`")[-1] or None


@dataclass
class _RunState:
    materialized: dict[str, DataFrame] = field(default_factory=dict)
    errors: dict[str, str] = field(default_factory=dict)


class _FlowConf:
    """Apply a flow's spark_conf for its compute+write, then restore."""

    def __init__(self, spark: SparkSession, conf: dict[str, str]):
        self._spark, self._conf, self._saved = spark, conf, {}

    def __enter__(self):
        try:
            for k, v in self._conf.items():
                try:
                    self._saved[k] = self._spark.conf.get(k)
                except Exception:
                    self._saved[k] = None
                self._spark.conf.set(k, v)
        except BaseException:
            # a mid-loop set raised (e.g. a static conf): __exit__ will
            # never run, so restore what was already applied here
            self.__exit__(None, None, None)
            raise

    def __exit__(self, *exc):
        for k, old in self._saved.items():
            if old is None:
                self._spark.conf.unset(k)
            else:
                self._spark.conf.set(k, old)


def _kahn_order(names: list[str], edges: dict[str, list[str]]) -> list[str]:
    """Topological order of ``names`` under hinted upstream ``edges``
    (consumer → upstreams); unhinted names keep declaration order.
    Raises on a cycle among the hints — retry could never untangle it."""
    remaining = dict.fromkeys(names)
    ordered: list[str] = []
    while remaining:
        ready = [
            n for n in remaining
            if all(u not in remaining for u in edges.get(n, []))
        ]
        if not ready:
            raise ValueError(
                f"depends_on hints form a cycle among: {sorted(remaining)}"
            )
        for n in ready:
            ordered.append(n)
            del remaining[n]
    return ordered


def run_local_pipeline(
    spark: SparkSession,
    registry: LocalGraphRegistry,
    storage_dir: str,
    depends_on: dict[str, list[str]] | None = None,
    stats: dict[str, int] | None = None,
) -> dict[str, DataFrame]:
    """Materialize every output of an SDP graph on the classic session.

    Returns {dataset name → read-back DataFrame} for every non-sink
    output. See the module docstring for ordering/semantics; raises on
    cycles, out-of-graph references, unsupported sinks, streaming
    tables fed by batch ``@append_flow``s, and output names shadowed by
    pre-existing persistent tables. ``depends_on`` statically hints
    consumer→upstream edges (one-pass planning on deep chains);
    ``stats``, if given, is filled with ``{"passes": …, "attempts": …}``
    so tests can assert the planning cost.
    """
    flows_by_target: dict[str, list[Flow]] = {}
    for f in registry.flows:
        if f.target not in registry.outputs:
            raise ValueError(
                f"flow {f.name!r} targets unknown dataset {f.target!r} "
                f"(registered: {sorted(registry.outputs)})"
            )
        if any(g.name == f.name for g in flows_by_target.get(f.target, [])):
            raise ValueError(
                f"duplicate flow name {f.name!r} for target {f.target!r} — "
                "flow names key checkpoint and landing dirs, so they must "
                "be unique per target"
            )
        flows_by_target.setdefault(f.target, []).append(f)
    for name, out in registry.outputs.items():
        n = len(flows_by_target.get(name, []))
        if isinstance(out, StreamingTable):
            if n == 0:
                raise ValueError(f"streaming table {name!r} has no flows")
        elif isinstance(out, Sink):
            if n == 0:
                raise ValueError(f"sink {name!r} has no flows")
        elif n != 1:
            raise ValueError(
                f"dataset {name!r} needs exactly one defining flow, has {n}"
            )

    for name, ups in (depends_on or {}).items():
        ghosts = [u for u in [name, *ups] if u not in registry.outputs]
        if ghosts:
            raise ValueError(
                f"depends_on names not in the graph: {sorted(set(ghosts))}"
            )

    # Namespace guard (the retry loop defers ONLY on unresolved names,
    # so a graph output shadowed by a pre-existing relation would be
    # read stale on the first pass with no error — see module docstring).
    # Validate EVERY output before dropping ANY temp view: a graph that
    # fails this guard must not have half-destroyed the user's session
    # views on the way to its error (review r13).
    readable = [
        n for n, o in registry.outputs.items() if not isinstance(o, Sink)
    ]  # sinks are write-only; nothing reads them by name
    current_db = spark.catalog.currentDatabase()
    for name in readable:
        # the dbName-qualified form checks CATALOG tables only, so a
        # same-named temp view cannot mask a shadowing table here
        if spark.catalog.tableExists(name, current_db):
            raise ValueError(
                f"graph output {name!r} shadows a pre-existing catalog "
                "table — a consumer flow would silently read it instead "
                "of deferring; rename the output or drop the table"
            )
    for name in readable:
        spark.catalog.dropTempView(name)  # no-op unless a temp view exists

    state = _RunState()
    pending = _kahn_order(list(registry.outputs), depends_on or {})
    passes = attempts = 0
    try:
        while pending:
            passes += 1
            progressed = False
            still: list[str] = []
            for name in pending:
                attempts += 1
                try:
                    state.materialized[name] = _materialize(
                        spark, registry, registry.outputs[name],
                        flows_by_target.get(name, []), storage_dir, state,
                    )
                    state.errors.pop(name, None)
                    progressed = True
                except _Defer as d:
                    state.errors[name] = str(d)
                    still.append(name)
            pending = still
            if pending and not progressed:
                detail = "; ".join(f"{n}: {state.errors[n]}" for n in pending)
                raise RuntimeError(
                    f"pipeline cannot make progress (cycle?): {detail}"
                )
    finally:
        # graph-internal names do not outlive the run (upstream: a
        # TemporaryView "is not visible outside of the graph"); the
        # returned DataFrames hold analyzed plans, not the names
        for name, out in registry.outputs.items():
            if isinstance(out, TemporaryView) and name in state.materialized:
                spark.catalog.dropTempView(name)
        if stats is not None:
            stats["passes"], stats["attempts"] = passes, attempts
    return {
        n: df for n, df in state.materialized.items() if df is not None
    }


class _Defer(Exception):
    """Internal: this output depends on a not-yet-materialized sibling."""


def _defer_or_raise(exc: Exception, registry: LocalGraphRegistry, state: _RunState):
    rel = _missing_relation(exc)
    if rel is not None and rel in registry.outputs:
        if rel not in state.materialized:
            raise _Defer(f"waits for {rel!r}") from exc
    raise exc


def _materialize(
    spark: SparkSession,
    registry: LocalGraphRegistry,
    out: Output,
    flows: list[Flow],
    storage_dir: str,
    state: _RunState,
) -> DataFrame | None:
    if isinstance(out, TemporaryView):
        (flow,) = flows
        try:
            with _FlowConf(spark, flow.spark_conf):
                df = flow.func()
                df.createOrReplaceTempView(out.name)
                # return the analyzed plan, NOT spark.table(name): the
                # view is graph-internal and dropped when the run ends
                return df
        except _Defer:
            raise
        except Exception as exc:
            _defer_or_raise(exc, registry, state)
    elif isinstance(out, StreamingTable):
        # @sdp.table with a batch query function: upstream full-refresh
        # semantics — the decorator registers a StreamingTable plus a
        # flow NAMED LIKE THE TARGET; recompute and overwrite on every
        # run (no checkpoint — there is nothing incremental to track).
        # NOTE the public Flow carries no origin marker, so a single
        # batch @append_flow EXPLICITLY named like its target is
        # indistinguishable from @sdp.table and gets the same
        # full-refresh treatment — EXCEPT when the flow already has a
        # streaming checkpoint from earlier runs: overwriting a
        # checkpointed append landing would silently destroy its
        # accumulated history, so that case fails loud (review r13).
        prebuilt: dict[str, DataFrame] = {}
        if len(flows) == 1 and flows[0].name == out.name:
            flow = flows[0]
            try:
                with _FlowConf(spark, flow.spark_conf):
                    df = flow.func()
                    if not df.isStreaming:
                        # check the TABLE's whole checkpoint parent, not
                        # just this flow's dir: earlier runs may have
                        # appended through DIFFERENTLY-NAMED flows, and a
                        # full refresh would silently drop their landings
                        # too (review r13, second pass)
                        ckpt = f"{storage_dir}/_checkpoints/{out.name}"
                        jconf = spark.sparkContext._jsc.hadoopConfiguration()
                        jck = spark._jvm.org.apache.hadoop.fs.Path(ckpt)
                        if jck.getFileSystem(jconf).exists(jck):
                            raise TypeError(
                                f"flow {flow.name!r} returned a batch "
                                f"DataFrame but {out.name!r} has streaming "
                                f"checkpoints under {ckpt!r} from earlier "
                                "runs — a full-refresh overwrite would "
                                "destroy the appended history; keep the "
                                "flow streaming or land the batch under a "
                                "new table name"
                            )
                        path = f"{storage_dir}/{out.name}/{flow.name}"
                        writer = df.write.mode("overwrite").format(
                            out.format or "parquet"
                        )
                        if out.partition_cols:
                            writer = writer.partitionBy(*out.partition_cols)
                        writer.save(path)
                        got = spark.read.format(
                            out.format or "parquet"
                        ).load(path)
                        got.createOrReplaceTempView(out.name)
                        return spark.table(out.name)
                    # streaming @sdp.table: reuse the plan below instead
                    # of constructing it twice (review r13 — the query
                    # function must not run two times per pipeline run)
                    prebuilt[flow.name] = df
            except _Defer:
                raise
            except Exception as exc:
                _defer_or_raise(exc, registry, state)
        # one sink dir PER FLOW: a file-sink's _spark_metadata commit log
        # is per-path and batch-id-keyed, so two independent flows cannot
        # share one path (the second flow's log would collide with the
        # first's and its files would be invisible to committed reads).
        # The table is the metadata-log-aware union of its flow landings.
        flow_schemas: dict[str, object] = {}
        for flow in flows:
            try:
                with _FlowConf(spark, flow.spark_conf):
                    df = prebuilt.pop(flow.name, None)
                    if df is None:
                        df = flow.func()
                    if not df.isStreaming:
                        raise TypeError(
                            f"flow {flow.name!r} targets streaming table "
                            f"{out.name!r} but returned a batch DataFrame; "
                            "use @sdp.materialized_view for batch"
                        )
                    flow_schemas[flow.name] = df.schema
                    writer = (
                        df.writeStream.format(out.format or "parquet")
                        .outputMode("append")
                        .option(
                            "checkpointLocation",
                            f"{storage_dir}/_checkpoints/{out.name}/{flow.name}",
                        )
                        .trigger(availableNow=True)
                    )
                    if out.partition_cols:
                        writer = writer.partitionBy(*out.partition_cols)
                    land = f"{storage_dir}/{out.name}/{flow.name}"
                    # batch→streaming switch guard (ADVICE r13, mirror of
                    # the streaming→batch checkpoint guard above): a
                    # landing dir WITHOUT a _spark_metadata log was
                    # produced by a batch full-refresh; starting a file
                    # sink there writes a commit log that makes committed
                    # reads see only streaming files, silently vanishing
                    # the prior batch rows.
                    hconf = spark.sparkContext._jsc.hadoopConfiguration()
                    jland = spark._jvm.org.apache.hadoop.fs.Path(land)
                    jmeta = spark._jvm.org.apache.hadoop.fs.Path(
                        f"{land}/_spark_metadata"
                    )
                    lfs = jland.getFileSystem(hconf)
                    # ADVICE r14: an EXISTING-but-empty landing dir has no
                    # batch rows a commit log could hide — only raise when
                    # actual data files (non-marker entries) are present.
                    has_batch_files = False
                    if lfs.exists(jland) and not lfs.exists(jmeta):
                        for st in lfs.listStatus(jland):
                            name = st.getPath().getName()
                            if not name.startswith(("_", ".")):
                                has_batch_files = True
                                break
                    if has_batch_files:
                        raise TypeError(
                            f"flow {flow.name!r} is streaming but its "
                            f"landing {land!r} was produced by a batch "
                            "full-refresh (no _spark_metadata commit "
                            "log) — a file-sink start would hide the "
                            "existing batch rows from committed reads; "
                            "keep the table batch or land the stream "
                            "under a new table name"
                        )
                    q = writer.start(land)
                    q.awaitTermination()
            except _Defer:
                raise
            except Exception as exc:
                _defer_or_raise(exc, registry, state)
        parts = []
        jconf = spark.sparkContext._jsc.hadoopConfiguration()
        for flow in flows:
            path = f"{storage_dir}/{out.name}/{flow.name}"
            # a valid-but-empty source commits zero batches and never
            # creates its sink dir — ONLY that case registers an EMPTY
            # table (stream schema). Any other read failure (corrupt
            # landing, IO/permission error) propagates: substituting
            # empty data for a real error would silently produce wrong
            # downstream results (ADVICE r12).
            jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
            if jpath.getFileSystem(jconf).exists(jpath):
                # explicit stream schema: no inference, so a committed-
                # but-empty landing (zero data files) reads as empty
                # instead of failing UNABLE_TO_INFER_SCHEMA, while
                # genuinely unreadable files still fail at execution
                parts.append(
                    spark.read.format(out.format or "parquet")
                    .schema(flow_schemas[flow.name])
                    .load(path)
                )
            else:
                parts.append(
                    spark.createDataFrame([], flow_schemas[flow.name])
                )
        got = parts[0]
        for p in parts[1:]:  # fail loud on cross-flow schema drift
            got = got.unionByName(p)
        got.createOrReplaceTempView(out.name)
        return spark.table(out.name)
    elif isinstance(out, MaterializedView):
        (flow,) = flows
        path = f"{storage_dir}/{out.name}"
        try:
            with _FlowConf(spark, flow.spark_conf):
                df = flow.func()
                writer = df.write.mode("overwrite").format(
                    out.format or "parquet"
                )
                if out.partition_cols:
                    writer = writer.partitionBy(*out.partition_cols)
                writer.save(path)
        except _Defer:
            raise
        except Exception as exc:
            _defer_or_raise(exc, registry, state)
        got = spark.read.format(out.format or "parquet").load(path)
        got.createOrReplaceTempView(out.name)
        return spark.table(out.name)
    elif isinstance(out, Sink):
        if out.format not in ("parquet", "csv", "json", "orc", "noop", "jdbc"):
            raise NotImplementedError(
                f"local sink format {out.format!r} unsupported "
                "(parquet/csv/json/orc file sinks, noop, jdbc); use "
                "sources.sinks for other landings"
            )
        for flow in flows:
            try:
                with _FlowConf(spark, flow.spark_conf):
                    df = flow.func()
                    if not df.isStreaming:
                        raise TypeError(
                            f"sink flow {flow.name!r} must be streaming"
                        )
                    ckpt = f"{storage_dir}/_checkpoints/{out.name}/{flow.name}"
                    if out.format == "jdbc":
                        # the F15 sink via foreachBatch: Spark has no
                        # native streaming jdbc sink. Checkpointed batch
                        # ids make an unchanged source append NOTHING on
                        # re-run; a batch that crashed MID-WRITE may be
                        # re-appended on restart (foreachBatch is
                        # at-least-once) — point the sink at an
                        # idempotent/staging table if that matters.
                        from dwh_etl_framework_spark.sources.sinks import (
                            write_jdbc,
                        )

                        opts = dict(out.options)
                        url = opts.pop("url", None)
                        table = opts.pop("dbtable", None)
                        if not url or not table:
                            raise ValueError(
                                f"jdbc sink {out.name!r} needs 'url' and "
                                "'dbtable' in options"
                            )

                        def _write(bdf: DataFrame, _bid: int) -> None:
                            write_jdbc(
                                bdf, url, table, mode="append", options=opts
                            )

                        writer = (
                            df.writeStream.foreachBatch(_write)
                            .option("checkpointLocation", ckpt)
                            .trigger(availableNow=True)
                        )
                        q = writer.start()
                    else:
                        writer = (
                            df.writeStream.format(out.format)
                            .options(**dict(out.options))
                            .option("checkpointLocation", ckpt)
                            .trigger(availableNow=True)
                        )
                        q = writer.start()
                    q.awaitTermination()
            except _Defer:
                raise
            except Exception as exc:
                _defer_or_raise(exc, registry, state)
        return None
    else:
        raise NotImplementedError(f"unsupported output type: {type(out)}")
