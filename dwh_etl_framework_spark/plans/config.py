"""Pipeline configuration model (YAML spec from reference README.md:86-195).

The reference drives everything from ``{table_folder}/config.yaml`` parsed
into raw dicts (``airflow_etl.py:680-685``). Here the same shape is typed
dataclasses with validation up-front, and two deliberate fixes of latent
reference defects (SURVEY.md §0):

- ``migration`` is optional (reference KeyError, ``airflow_etl.py:694``),
- primary keys are *declared* per table instead of introspected from
  ``information_schema`` (``airflow_etl.py:110-129``) — Spark's catalog has
  no PK metadata, and declared keys work for any source.

Config shape (YAML):

.. code-block:: yaml

    tables:
      - target: dwh.dm_saldo
        primary_key: [account_id, balance_date]
        dependencies:
          - alias: lineitem
            format: parquet
            path: /data/lineitem
        parameters:
          - {name: report_date, value: "1998-09-01"}
        transform:
          full:
            - type: select
              sql: "SELECT ... WHERE l_shipdate <= '{report_date}'"
              cache: true
              alias: step1
          delta:
            - type: select
              sql_file: steps/delta.sql
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import Mapping, Sequence

from dwh_etl_framework_spark.sources.registry import SourceSpec

VALID_READ_MODES = ("full", "delta", "manual")
VALID_WRITE_MODES = ("append", "overwrite")
VALID_MERGE_MODES = ("full", "delta", "none")
VALID_STEP_TYPES = ("select", "sql script", "python")


@dataclass(frozen=True)
class DependencyConfig:
    """One pipeline input; thin wrapper that lowers to a SourceSpec."""

    alias: str
    format: str = "parquet"
    path: str | None = None
    options: Mapping[str, str] = field(default_factory=dict)
    url: str | None = None
    query: str | None = None
    dbtable: str | None = None

    def to_source_spec(self) -> SourceSpec:
        return SourceSpec(
            alias=self.alias,
            format=self.format,
            path=self.path,
            options=dict(self.options),
            url=self.url,
            query=self.query,
            dbtable=self.dbtable,
        )


@dataclass(frozen=True)
class TransformStep:
    """One pipeline stage (F11-F13, ``airflow_etl.py:540-667``).

    ``type='select'``     — SQL executed on Spark; result threads forward.
    ``type='sql script'`` — side-effecting SQL (DDL/DML), no result.
    ``type='python'``     — a registered callable
                            ``(spark, dfs: dict[str, DataFrame]) -> DataFrame``;
                            replaces the reference's ``compile()+exec()`` of
                            arbitrary files (``airflow_etl.py:627-641``) with
                            a typed registry — same capability, testable, no
                            code injection.
    """

    type: str = "select"
    sql: str | None = None
    sql_file: str | None = None
    python: str | None = None  # registry key for python steps
    #: 'spark' executes in the session (F7); 'pushdown' ships the SQL to an
    #: external engine over JDBC and pulls the result (F8 — the reference's
    #: engine='greenplum', airflow_etl.py:252-260). pushdown needs
    #: ``connection`` = a key into StepContext.connections.
    engine: str = "spark"
    connection: str | None = None
    cache: bool = False
    cache_dir: str | None = None
    alias: str | None = None
    #: Optional sketch-driven join planning for this step (the x105
    #: decision surfaced at the pipeline-config level). Mapping with keys
    #: ``left``/``right`` (temp-view names visible to the step's SQL),
    #: ``left_key``/``right_key`` (join key columns), and optional
    #: ``broadcast_threshold_rows`` / ``rows_per_task`` / ``parallelism``
    #: / ``w`` / ``left_state``/``right_state`` (CMS fold state dirs —
    #: serve the sketch from continuously maintained state instead of
    #: rescanning the input on every run; see streaming/distinct.py)
    #: / ``left_table``/``right_table`` (landed table paths — serve the
    #: sketch from the ``_sketches/`` metadata a ``landing`` block with
    #: ``sketch_keys`` wrote, zero scans; see sources/sinks.py).
    #: Before the SQL runs, the step derives a
    #: :class:`~dwh_etl_framework_spark.operators.sketch.JoinDecision`
    #: from the two sketches and re-registers the views under the decided
    #: physical shape (broadcast hint on the small side, or both sides
    #: co-partitioned on their keys at the decision's exchange width) —
    #: the user's SQL is untouched; only the inputs it resolves change,
    #: and only for THIS step (originals are restored after analysis).
    #: Spark-only: a pushdown engine plans its own joins.
    join_strategy: Mapping | None = None
    #: Optional statistics-tier join-ORDER planning for this step (the
    #: x109 System-R decision surfaced at the pipeline-config level).
    #: Mapping with ``left``/``mid``/``right`` (temp-view names),
    #: ``left_table``/``mid_table``/``right_table`` (landed table paths
    #: whose ``_sketches/`` CMS + HLL tiers supply exact counts and NDVs
    #: — ZERO input scans), the four key columns ``left_key``/
    #: ``mid_left_key``/``mid_right_key``/``right_key``, and ``as`` (the
    #: temp-view name under which the chain — joined in the chosen
    #: order — is registered for THIS step's SQL; dropped/restored after
    #: analysis like join_strategy's shaping). Spark-only.
    join_order: Mapping | None = None
    #: Optional zone-map pruned scans for this step (the f41 data-skipping
    #: read surfaced at the pipeline-config level). A list of mappings,
    #: each with ``table`` (a zone-mapped landing path — the ``landing:
    #: layout:`` product), ``as`` (temp-view name the step's SQL reads),
    #: and ``intervals`` ({col: [lo, hi]} closed bounds). Before the SQL
    #: runs, each view is registered as the PRUNED read (only fragments
    #: whose landed min/max overlap every interval are opened — the
    #: decision costs one metadata read); views are dropped/restored after
    #: analysis like join_strategy's shaping. SUPERSET contract: the
    #: step's SQL must still apply its exact predicate. Spark-only.
    pruned_scans: Sequence[Mapping] | None = None

    def __post_init__(self) -> None:
        if self.type not in VALID_STEP_TYPES:
            raise ValueError(
                f"invalid step type {self.type!r}; expected one of {VALID_STEP_TYPES}"
            )
        if self.engine not in ("spark", "pushdown"):
            raise ValueError(f"invalid step engine {self.engine!r}")
        if self.engine == "pushdown" and not self.connection:
            raise ValueError("pushdown step needs a 'connection' key")
        if self.type in ("select", "sql script") and not (self.sql or self.sql_file):
            raise ValueError(f"{self.type} step needs sql or sql_file")
        if self.type == "python" and not self.python:
            raise ValueError("python step needs a registry key in 'python'")
        if self.join_strategy is not None:
            if self.type != "select" or self.engine != "spark":
                raise ValueError(
                    "join_strategy applies only to engine='spark' select steps"
                )
            missing = {"left", "right", "left_key", "right_key"} - set(
                self.join_strategy
            )
            if missing:
                raise ValueError(
                    f"join_strategy missing required keys: {sorted(missing)}"
                )
        if self.join_order is not None:
            if self.type != "select" or self.engine != "spark":
                raise ValueError(
                    "join_order applies only to engine='spark' select steps"
                )
            if "chain" in self.join_order:
                chain = self.join_order["chain"]
                if "as" not in self.join_order:
                    raise ValueError("join_order chain form needs 'as'")
                if not isinstance(chain, (list, tuple)) or len(chain) < 2:
                    raise ValueError(
                        "join_order 'chain' must list at least 2 tables"
                    )
                for i, e in enumerate(chain):
                    need = {"view", "table"}
                    if i > 0:
                        need.add("left_key")
                    if i < len(chain) - 1:
                        need.add("right_key")
                    missing = need - set(e)
                    if missing:
                        raise ValueError(
                            f"join_order chain element {i} missing keys: "
                            f"{sorted(missing)}"
                        )
            else:
                missing = {
                    "left", "mid", "right",
                    "left_table", "mid_table", "right_table",
                    "left_key", "mid_left_key", "mid_right_key", "right_key",
                    "as",
                } - set(self.join_order)
                if missing:
                    raise ValueError(
                        f"join_order missing required keys: {sorted(missing)}"
                    )
        if self.pruned_scans is not None:
            if self.type != "select" or self.engine != "spark":
                raise ValueError(
                    "pruned_scans applies only to engine='spark' select steps"
                )
            if not isinstance(self.pruned_scans, (list, tuple)):
                raise ValueError("pruned_scans must be a list of mappings")
            for i, s in enumerate(self.pruned_scans):
                missing = {"table", "as", "intervals"} - set(s)
                if missing:
                    raise ValueError(
                        f"pruned_scans[{i}] missing keys: {sorted(missing)}"
                    )
                iv = s["intervals"]
                if not isinstance(iv, Mapping) or not iv or not all(
                    isinstance(b, (list, tuple)) and len(b) == 2
                    for b in iv.values()
                ):
                    raise ValueError(
                        f"pruned_scans[{i}] 'intervals' must map columns "
                        f"to [lo, hi], got {iv!r}"
                    )

    def resolve_sql(self, base_dir: str | Path | None = None) -> str:
        if self.sql is not None:
            return self.sql
        path = Path(self.sql_file)
        if base_dir is not None and not path.is_absolute():
            path = Path(base_dir) / path
        return path.read_text()


@dataclass(frozen=True)
class TableConfig:
    """Config for one target table (README.md:86-195)."""

    target: str
    primary_key: Sequence[str] = ()
    dependencies: Sequence[DependencyConfig] = ()
    parameters: Sequence[Mapping] = ()
    migration: Sequence[str] = ()  # optional DDL, run once before steps (F22)
    transform: Mapping[str, Sequence[TransformStep]] = field(default_factory=dict)
    #: targets of OTHER tables this one reads (their masters are published
    #: as temp views); drives DAG edges in plans/orchestrator.py. Tables
    #: without it run in declaration order, like the reference config loop.
    depends_on: Sequence[str] = ()
    #: Optional datalake landing for the merged master (the reference's
    #: Hudi landing write, ``airflow_etl.py:441-450``, as F17). Mapping
    #: with ``path`` (required) and optional ``format`` (parquet),
    #: ``mode`` (overwrite — the master IS the current state),
    #: ``partition_by``, ``sketch_keys`` (+ ``w``): declaring
    #: ``sketch_keys`` lands per-key CMS planner sketches under
    #: ``<path>/_sketches/`` (``sources/sinks.write_table_with_sketches``)
    #: so downstream join planning is metadata-only.
    landing: Mapping | None = None
    #: Optional SQL UDF declarations (round-12 engine surface, r53):
    #: ``CREATE OR REPLACE TEMPORARY FUNCTION …`` DDL strings registered
    #: before every transform() run. This is where the reference's
    #: config-driven SQL steps stop copy-pasting shared business
    #: expressions (``airflow_etl.py:251`` templates them through Python
    #: string substitution) — the engine inlines the body at plan time,
    #: so the abstraction costs nothing at scale. OR REPLACE + TEMPORARY
    #: are REQUIRED: re-runs/retries must be idempotent, and functions
    #: must stay session-scoped (no catalog pollution across pipelines).
    functions: Sequence[str] = ()

    def steps_for(self, read_mode: str) -> Sequence[TransformStep]:
        if read_mode not in VALID_READ_MODES:
            raise ValueError(
                f"invalid read_mode {read_mode!r}; expected one of {VALID_READ_MODES}"
            )
        if read_mode not in self.transform:
            raise ValueError(
                f"table {self.target!r} defines no {read_mode!r} transform steps"
            )
        return self.transform[read_mode]


@dataclass(frozen=True)
class PipelineConfig:
    tables: Sequence[TableConfig] = ()


def _parse_step(raw: Mapping) -> TransformStep:
    return TransformStep(
        type=raw.get("type", "select"),
        sql=raw.get("sql"),
        sql_file=raw.get("sql_file") or raw.get("sql-file"),
        python=raw.get("python") or raw.get("python-file"),
        engine=raw.get("engine", "spark"),
        connection=raw.get("connection"),
        cache=bool(raw.get("cache", False)),
        cache_dir=raw.get("cache_dir"),
        alias=raw.get("alias"),
        # explicit None check, not `or`: a declared-but-empty mapping must
        # reach validation (missing-keys error), not silently disable planning
        join_strategy=(
            raw["join_strategy"]
            if raw.get("join_strategy") is not None
            else raw.get("join-strategy")
        ),
        join_order=(
            raw["join_order"]
            if raw.get("join_order") is not None
            else raw.get("join-order")
        ),
        pruned_scans=(
            raw["pruned_scans"]
            if raw.get("pruned_scans") is not None
            else raw.get("pruned-scans")
        ),
    )


def _parse_table(raw: Mapping) -> TableConfig:
    deps = [
        DependencyConfig(
            alias=d["alias"],
            format=d.get("format", "parquet"),
            path=d.get("path"),
            options=d.get("options", {}),
            url=d.get("url"),
            query=d.get("query"),
            dbtable=d.get("dbtable"),
        )
        for d in raw.get("dependencies", [])
    ]
    transform = {
        mode: [_parse_step(s) for s in steps]
        for mode, steps in raw.get("transform", {}).items()
    }
    for mode in transform:
        if mode not in VALID_READ_MODES:
            raise ValueError(f"invalid transform mode {mode!r}")
    return TableConfig(
        target=raw["target"],
        primary_key=tuple(raw.get("primary_key", raw.get("pk", ()))),
        dependencies=tuple(deps),
        parameters=tuple(raw.get("parameters", ())),
        migration=tuple(raw.get("migration", ())),
        transform=transform,
        depends_on=tuple(raw.get("depends_on", raw.get("depends-on", ()))),
        landing=_parse_landing(raw.get("landing")),
        functions=_parse_functions(raw.get("functions", ())),
    )


_FUNCTION_DDL_RE = None  # compiled lazily


def _parse_functions(raw) -> tuple[str, ...]:
    """Validate SQL UDF declarations at parse time: each must be a
    ``CREATE OR REPLACE TEMPORARY FUNCTION`` statement (OR REPLACE for
    retry idempotence, TEMPORARY for session scoping) — anything else
    fails the config load, not the Nth pipeline run."""
    global _FUNCTION_DDL_RE
    import re

    if isinstance(raw, str):
        raw = [raw]
    if _FUNCTION_DDL_RE is None:
        _FUNCTION_DDL_RE = re.compile(
            r"^\s*CREATE\s+OR\s+REPLACE\s+TEMPORARY\s+FUNCTION\b",
            re.IGNORECASE,
        )
    out = []
    for ddl in raw:
        if not isinstance(ddl, str) or not _FUNCTION_DDL_RE.match(ddl):
            raise ValueError(
                "each 'functions' entry must be a CREATE OR REPLACE "
                f"TEMPORARY FUNCTION statement, got {str(ddl)[:80]!r}"
            )
        out.append(ddl)
    return tuple(out)


def _parse_layout(raw: Mapping) -> Mapping:
    """Validate a ``landing: layout:`` block (zone-mapped fragmented
    landing, ``sources/zonemaps.py``). Shape:

    ``kind`` (range|zorder), ``columns`` (1 col for range, 2 for zorder),
    ``bounds`` ({col: [lo, hi]} design-time ints — out-of-range values
    clamp into edge fragments, so these bound pruning QUALITY only),
    optional ``bits`` (grid resolution per dimension, default 8) and
    ``fragments`` (power of two, default 64)."""
    unknown = set(raw) - {"kind", "columns", "bounds", "bits", "fragments"}
    if unknown:
        raise ValueError(f"unknown layout keys: {sorted(unknown)}")
    kind = raw.get("kind")
    if kind not in ("range", "zorder"):
        raise ValueError(f"layout 'kind' must be range|zorder, got {kind!r}")
    cols = raw.get("columns")
    if isinstance(cols, str):
        cols = [cols]
    want = 1 if kind == "range" else 2
    if not isinstance(cols, (list, tuple)) or len(cols) != want or not all(
        isinstance(c, str) and c for c in cols
    ):
        raise ValueError(
            f"layout kind={kind!r} needs exactly {want} column name(s), "
            f"got {raw.get('columns')!r}"
        )
    bounds = raw.get("bounds")
    if not isinstance(bounds, Mapping) or set(bounds) != set(cols):
        raise ValueError(
            f"layout 'bounds' must map exactly the layout columns "
            f"{sorted(cols)} to [lo, hi], got {bounds!r}"
        )
    for c, b in bounds.items():
        if (
            not isinstance(b, (list, tuple))
            or len(b) != 2
            or not all(isinstance(v, int) and not isinstance(v, bool) for v in b)
            or b[0] >= b[1]
        ):
            raise ValueError(
                f"layout bounds for {c!r} must be [lo, hi] ints with "
                f"lo < hi, got {b!r}"
            )
    bits = raw.get("bits", 8)
    frags = raw.get("fragments", 64)
    for key, v in (("bits", bits), ("fragments", frags)):
        if not isinstance(v, int) or isinstance(v, bool) or v < 1:
            raise ValueError(f"layout {key!r} must be a positive int")
    if frags & (frags - 1):
        raise ValueError(f"layout 'fragments' must be a power of two, got {frags}")
    frag_bits = frags.bit_length() - 1
    cap = bits if kind == "range" else 2 * bits
    if frag_bits > cap:
        raise ValueError(
            f"layout fragments={frags} needs {frag_bits} key bits but "
            f"kind={kind!r} at bits={bits} provides only {cap}"
        )
    return {
        "kind": kind, "columns": list(cols),
        "bounds": {c: (int(b[0]), int(b[1])) for c, b in bounds.items()},
        "bits": bits, "fragments": frags,
    }


def _parse_landing(raw: Mapping | None) -> Mapping | None:
    if raw is None:
        return None
    if not raw.get("path"):
        raise ValueError("landing config requires 'path'")
    unknown = set(raw) - {"path", "format", "mode", "partition_by",
                          "sketch_keys", "w", "layout", "zonemap_cols"}
    if unknown:
        raise ValueError(f"unknown landing config keys: {sorted(unknown)}")
    spec = dict(raw)
    if spec.get("layout") is not None:
        spec["layout"] = _parse_layout(spec["layout"])
        # one landing protocol at a time: the zone-map landing is
        # overwrite-only (crash-loudness argument, sources/zonemaps.py
        # docstring) and owns the physical fragmentation
        if spec.get("partition_by"):
            raise ValueError(
                "landing 'layout' and 'partition_by' are mutually "
                "exclusive — the layout's fragment id IS the partition"
            )
        if spec.get("sketch_keys"):
            raise ValueError(
                "landing 'layout' and 'sketch_keys' are mutually exclusive "
                "for now — land the sketch tier from a separate landing"
            )
        if spec.get("mode", "overwrite") != "overwrite":
            raise ValueError(
                "a zone-mapped landing is overwrite-only (a crashed append "
                "could silently uncover fragments; sources/zonemaps.py)"
            )
        zc = spec.get("zonemap_cols", spec["layout"]["columns"])
        if isinstance(zc, str):
            zc = [zc]
        if not isinstance(zc, (list, tuple)) or not all(
            isinstance(c, str) and c for c in zc
        ):
            raise ValueError(
                f"landing 'zonemap_cols' must be column names, got "
                f"{spec.get('zonemap_cols')!r}"
            )
        spec["zonemap_cols"] = list(zc)
    elif spec.get("zonemap_cols"):
        raise ValueError("landing 'zonemap_cols' requires a 'layout'")
    # shape validation (ADVICE r11, low): a scalar string would survive
    # parsing and then explode into single characters at land time
    # (list('day') == ['d','a','y']) — normalize YAML's natural scalar
    # form to a one-element list and refuse anything but strings
    for key in ("partition_by", "sketch_keys"):
        val = spec.get(key)
        if val is None:
            continue
        if isinstance(val, str):
            val = [val]
        if not isinstance(val, (list, tuple)) or not all(
            isinstance(c, str) and c for c in val
        ):
            raise ValueError(
                f"landing {key!r} must be a column name or a list of "
                f"column names, got {spec[key]!r}"
            )
        spec[key] = list(val)
    if "w" in spec and not isinstance(spec["w"], int):
        raise ValueError(f"landing 'w' must be an int, got {spec['w']!r}")
    return spec


def parse_pipeline_config(raw: Mapping) -> PipelineConfig:
    tables = raw.get("tables", raw.get("config", []))
    return PipelineConfig(tables=tuple(_parse_table(t) for t in tables))


def load_pipeline_config(path: str | Path) -> PipelineConfig:
    """Load ``config.yaml`` (reference loader: ``airflow_etl.py:680-685``)."""
    import yaml

    with open(path) as fh:
        return parse_pipeline_config(yaml.safe_load(fh))
