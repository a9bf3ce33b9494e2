"""Source registration: scans F1-F6 of the reference, Spark-first.

Reference parity (SURVEY.md §2a):
- F1/F2 jdbc-scan (query | dbtable)  — ``connector.py:27-46``. The reference
  never sets ``numPartitions``/``partitionColumn`` so every JDBC extract is a
  single-task scan; here partitioned reads are first-class options.
- F3 hudi-scan / F4 csv-scan / F5 orc-scan — ``airflow_etl.py:351-355``,
  ``connector.py:48-49``. Generalized to any Spark batch format; the test
  fixtures are parquet.
- F6 register-view — ``airflow_etl.py:269,:375``; dependencies become temp
  views addressable from SQL steps.

Scale notes: scans are fully declarative (``spark.read``) so Catalyst pushes
filters and prunes columns into the format reader; partitioned datalake
layouts get static+dynamic partition pruning for free. JDBC scans parallelize
via (partition_column, lower/upper bound, num_partitions).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Mapping

from pyspark.sql import DataFrame, SparkSession

#: Tables the driver fixtures provide (TESTDATA.md).
FIXTURE_TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

_BATCH_FORMATS = {"parquet", "orc", "csv", "json", "delta", "hudi"}

#: Vendor-specific JDBC reader/writer defaults, mirroring the reference's
#: per-connection-type branches (``connector.py:43-44``: Oracle DATE columns
#: would otherwise surface as TIMESTAMP). User-supplied options always win.
_VENDOR_JDBC_OPTIONS: dict[str, dict[str, str]] = {
    "oracle": {"oracle.jdbc.mapDateToTimestamp": "false"},
    "postgresql": {},
    "greenplum": {},  # wire-compatible with postgresql
    "mysql": {},
    "mssql": {},
    "derby": {},
}


def jdbc_options(
    vendor: str | None = None,
    fetch_size: int | None = None,
    batch_size: int | None = None,
    extra: Mapping[str, str] | None = None,
) -> dict[str, str]:
    """JDBC option dict with vendor defaults + the reference's two tuning

    knobs (``connector.py:34-35``: fetchsize for scans, batchsize for
    writes). ``extra`` overrides everything."""
    if vendor is not None and vendor.lower() not in _VENDOR_JDBC_OPTIONS:
        raise ValueError(
            f"unknown jdbc vendor {vendor!r}; known: "
            f"{sorted(_VENDOR_JDBC_OPTIONS)}"
        )
    opts: dict[str, str] = dict(
        _VENDOR_JDBC_OPTIONS.get((vendor or "").lower(), {})
    )
    if fetch_size is not None:
        opts["fetchsize"] = str(fetch_size)
    if batch_size is not None:
        opts["batchsize"] = str(batch_size)
    opts.update(extra or {})
    return opts


@dataclass(frozen=True)
class SourceSpec:
    """One registrable source (a dependency in reference config.yaml terms,

    ``README.md:86-195``): where the data lives and the SQL alias it gets.
    """

    alias: str
    format: str = "parquet"  # parquet|orc|csv|json|delta|hudi|jdbc
    path: str | None = None  # batch formats
    # jdbc:
    url: str | None = None
    query: str | None = None
    dbtable: str | None = None
    # jdbc scan parallelism (the reference's missing knob, connector.py:27-46):
    partition_column: str | None = None
    lower_bound: str | int | None = None
    upper_bound: str | int | None = None
    num_partitions: int | None = None
    #: jdbc vendor preset (oracle/postgresql/greenplum/mysql/mssql/derby):
    #: merges _VENDOR_JDBC_OPTIONS type-mapping knobs under ``options``
    vendor: str | None = None
    options: Mapping[str, str] = field(default_factory=dict)

    def __post_init__(self) -> None:
        fmt = self.format.lower()
        if fmt not in _BATCH_FORMATS | {"jdbc"}:
            raise ValueError(f"unsupported source format: {self.format!r}")
        if fmt == "jdbc":
            if not self.url or not (self.query or self.dbtable):
                raise ValueError("jdbc source needs url and one of query/dbtable")
            if self.query and self.dbtable:
                raise ValueError("jdbc source takes query OR dbtable, not both")
            jdbc_options(self.vendor)  # validate vendor at construction
        elif not self.path:
            raise ValueError(f"{fmt} source needs a path")


def load_source(spark: SparkSession, spec: SourceSpec) -> DataFrame:
    """Materialize a SourceSpec as a (lazy) DataFrame scan."""
    fmt = spec.format.lower()
    if fmt == "jdbc":
        if spec.partition_column is not None and spec.query:
            raise ValueError(
                "partitioned jdbc reads require dbtable (Spark restriction); "
                "wrap the query as a subquery alias in dbtable"
            )
        reader = spark.read.format("jdbc").option("url", spec.url)
        if spec.query:
            reader = reader.option("query", spec.query)
        else:
            reader = reader.option("dbtable", spec.dbtable)
        if spec.partition_column is not None:
            reader = (
                reader.option("partitionColumn", spec.partition_column)
                .option("lowerBound", str(spec.lower_bound))
                .option("upperBound", str(spec.upper_bound))
                .option("numPartitions", str(spec.num_partitions or 8))
            )
        for key, value in jdbc_options(spec.vendor, extra=spec.options).items():
            reader = reader.option(key, value)
        return reader.load()

    reader = spark.read
    if fmt == "csv":
        # reference: header=true inferred CSV (airflow_etl.py:351-353)
        reader = reader.option("header", "true").option("inferSchema", "true")
    for key, value in spec.options.items():
        reader = reader.option(key, value)
    return reader.format("parquet" if fmt == "hudi" else fmt).load(spec.path)


def register_sources(
    spark: SparkSession, specs: list[SourceSpec]
) -> dict[str, DataFrame]:
    """Load every source and bind it to its SQL alias (F6).

    Mirrors the reference's ``load_dependencies`` (``airflow_etl.py:299-375``)
    minus Airflow variable plumbing.
    """
    out: dict[str, DataFrame] = {}
    for spec in specs:
        df = load_source(spark, spec)
        df.createOrReplaceTempView(spec.alias)
        out[spec.alias] = df
    return out


#: Fixture timestamp columns whose parquet flavor has varied across driver
#: data generations — normalized to session-TZ TimestampType at load time.
_FLAVORED_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def normalize_ts_flavor(df: DataFrame, cols: tuple[str, ...] = ("ts",)) -> DataFrame:
    """Normalize a timestamp column to session-TZ ``TimestampType`` whatever

    flavor the parquet writer used. The driver fixtures have shipped both
    TIMESTAMP(NANOS) (read as ns longs under
    ``spark.sql.legacy.parquet.nanosAsLong``, see session.RUNTIME_CONFS) and
    naive TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ by Spark 4). With the
    session timezone pinned to UTC both conversions preserve the wall-clock
    value and match DuckDB's ``CAST(ts AS TIMESTAMP)`` semantics.
    """
    from pyspark.sql import functions as F

    dtypes = dict(df.dtypes)
    for col in cols:
        dtype = dtypes.get(col)
        if dtype == "bigint":  # ns-since-epoch long → µs timestamp
            df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
        elif dtype == "timestamp_ntz":  # naive µs → session-TZ (UTC) timestamp
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def register_fixture_tables(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = FIXTURE_TABLES
) -> dict[str, DataFrame]:
    """Register the driver-provided parquet fixtures as temp views."""
    out: dict[str, DataFrame] = {}
    for name in tables:
        spec = SourceSpec(alias=name, format="parquet", path=f"{sf_dir}/{name}.parquet")
        df = load_source(spark, spec)
        df = normalize_ts_flavor(df, _FLAVORED_TS_COLS.get(name, ()))
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
