"""Python DataSource (Spark 4 API): partitioned reads from an embedded
analytical engine (DuckDB), Arrow end-to-end.

The reference's extract tier pulls from an MPP warehouse over JDBC with
hand-partitioned queries (``connector.py:27-46``, single-partition — its
F2 note); this is the same source shape on Spark's NEW extension surface:

- each Spark partition opens its OWN engine connection and runs the
  user's query wrapped in a deterministic hash-mod predicate — N
  parallel scans, no driver funnel, no JDBC jars;
- rows travel as **pyarrow RecordBatch** objects (the DataSource API's
  vectorized path), never per-row Python tuples;
- the schema is introspected from the engine (``DESCRIBE``) once at
  planning time and mapped to Spark DDL.

At 100 TB the same class fronts any engine/service with a Python driver
(Trino, ClickHouse, BigQuery storage API…): partition count scales the
parallel scan width exactly like ``spark.read.jdbc(numPartitions=)``,
and because the predicate is injected INSIDE the remote query, the
filter runs engine-side (pushdown), not in Spark.

Usage::

    spark.dataSource.register(DuckDBSource)
    df = (spark.read.format("duckdb")
          .option("query", "SELECT * FROM 'part.parquet'")
          .option("partition_col", "p_partkey")
          .option("partitions", "8")
          .load())
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

#: DuckDB type → Spark DDL. Extend as needed; unknown types fail loudly
#: at planning time rather than mis-mapping silently.
_TYPE_MAP = {
    "BIGINT": "bigint",
    "INTEGER": "int",
    "SMALLINT": "smallint",
    "TINYINT": "tinyint",
    "HUGEINT": "decimal(38,0)",
    "DOUBLE": "double",
    "FLOAT": "float",
    "VARCHAR": "string",
    "BOOLEAN": "boolean",
    "DATE": "date",
    "TIMESTAMP": "timestamp",
    "TIMESTAMP_NS": "timestamp",
    "BLOB": "binary",
}


def _spark_ddl(duck_type: str) -> str:
    t = duck_type.upper()
    if t.startswith("DECIMAL"):
        return t.lower()
    if t not in _TYPE_MAP:
        raise ValueError(
            f"duckdb type {duck_type!r} has no Spark mapping — extend "
            "pysource._TYPE_MAP"
        )
    return _TYPE_MAP[t]


class _HashModPartition(InputPartition):
    def __init__(self, idx: int, n: int):
        self.idx = idx
        self.n = n


class _DuckDBReader(DataSourceReader):
    def __init__(self, query: str, partition_col: str | None, n: int):
        self.query = query
        self.partition_col = partition_col
        self.n = n

    def partitions(self):
        return [_HashModPartition(i, self.n) for i in range(self.n)]

    def read(self, partition):
        import duckdb

        con = duckdb.connect()
        if self.n == 1 or self.partition_col is None:
            sql = f"SELECT * FROM ({self.query})"
        else:
            # engine-side partition predicate: a stable hash-mod on the
            # declared column — every row lands in exactly one partition
            # regardless of type or distribution (skewed VALUES still
            # spread across partitions unless one key dominates)
            sql = (
                f"SELECT * FROM ({self.query}) "
                f"WHERE hash({self.partition_col}) % {self.n} = {partition.idx}"
            )
        reader = con.sql(sql).fetch_arrow_reader(batch_size=65536)
        for batch in reader:
            yield batch  # pyarrow RecordBatch → vectorized transfer


class DuckDBSource(DataSource):
    """``spark.read.format("duckdb")`` — options:

    - ``query`` (required): any DuckDB SQL (parquet/csv paths inline);
    - ``partition_col`` + ``partitions``: parallel scan via engine-side
      hash-mod predicate (defaults to a single partition).
    """

    @classmethod
    def name(cls) -> str:
        return "duckdb"

    def schema(self) -> str:
        import duckdb

        query = self.options.get("query")
        if not query:
            raise ValueError("duckdb source requires the 'query' option")
        con = duckdb.connect()
        desc = con.sql(f"DESCRIBE SELECT * FROM ({query})").fetchall()
        return ", ".join(f"`{name}` {_spark_ddl(t)}" for name, t, *_ in desc)

    def reader(self, schema) -> DataSourceReader:
        return _DuckDBReader(
            self.options["query"],
            self.options.get("partition_col"),
            int(self.options.get("partitions", "1")),
        )
