"""Round-12: Declarative Pipelines (SDP) lowered onto the local engine.

The round-12 env re-probe found the SDP *authoring* API live
(``pyspark.pipelines`` imports; its decorators register through the
public ``GraphElementRegistry`` contract) but its runner
Connect-only (protobuf absent — ``pipelines/cli.py`` lowers to
``pyspark.sql.connect.proto``). Per the r34/f37 probe protocol, the
live half is productized: ``plans/declarative.py`` executes an
SDP-declared graph on the classic session, and ``f43`` certifies one
end to end — a pipeline authored ONLY with public ``@sdp.*``
decorators (temporary view → materialized view → materialized view)
is planned, ordered, landed, and its final table hash-matched against
the classic SQL the graph denotes.

Reference anchor: the reference's transform tier is a hand-ordered
Kahn DAG over config-declared SQL steps (``airflow_etl.py`` transform
task factory, SURVEY §2a F24); SDP is the engine-native statement of
the same idea, so the framework accepts both authoring surfaces over
one execution model.
"""

from __future__ import annotations

import hashlib
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import pyspark.pipelines as sdp

from dwh_etl_framework_spark.plans.declarative import (
    LocalGraphRegistry,
    declare,
    run_local_pipeline,
)
from dwh_etl_framework_spark.queries.registry import fixtures, query

_F43_ORACLE = """
SELECT c.c_mktsegment AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents_sum
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
WHERE o.o_orderstatus = 'O'
GROUP BY c.c_mktsegment
ORDER BY segment
"""

#: pipeline landing memoized per (session, sf) like f39/f41/f42: running
#: the graph is the daily-refresh work; warm calls read the landed report.
_F43_DONE: dict[tuple[str, str], str] = {}


def _storage(spark: SparkSession, sf_dir: str) -> str:
    h = hashlib.md5(
        f"{sf_dir}:{spark.sparkContext.applicationId}".encode()
    ).hexdigest()[:12]
    return f"{tempfile.gettempdir()}/dwh_etl_framework_spark_f43_{h}"


@query("f43_declarative_pipeline", oracle=_F43_ORACLE)
def f43_declarative_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F24 via the NEW engine surface (round-12 probe): a Declarative
    Pipelines graph — ``@sdp.temporary_view`` (open orders) →
    ``@sdp.materialized_view`` (customer join, exact cents) →
    ``@sdp.materialized_view`` (segment report) — authored purely
    against the public SDP API and executed by the framework's local
    runner (``plans/declarative.py``; the build's own runner is
    Connect-only and protobuf is absent here). The oracle is the
    classic SQL the graph denotes, so one driver hash certifies
    declaration→ordering→landing→read-back. Declaration order is
    deliberately report-first: the runner's retry pass must discover
    the dependency order itself.

    Scale shape: each materialized view lands as parquet and downstream
    flows scan the LANDING (the F9 checkpoint rule) — at 100 TB the
    segment report reads the joined landing once, not the join twice;
    the temp view stays logical so the orders filter pushes into the
    parquet scan of the first materialization. The runner itself moves
    metadata only."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _F43_DONE:
        fixtures(spark, sf_dir)
        store = _storage(spark, sf_dir)
        reg = LocalGraphRegistry()

        def define() -> None:
            # report FIRST: the runner must defer it until its upstream
            # materializes (dependency discovery, not authoring order)
            @sdp.materialized_view(name="f43_segment_report")
            def report() -> DataFrame:
                return (
                    spark.table("f43_cust_orders")
                    .groupBy("segment")
                    .agg(
                        F.count(F.lit(1)).cast("long").alias("n_orders"),
                        F.sum("cents").cast("long").alias("cents_sum"),
                    )
                )

            @sdp.materialized_view(name="f43_cust_orders")
            def cust_orders() -> DataFrame:
                orders = spark.table("f43_open_orders")
                cust = spark.table("customer")
                return orders.join(
                    cust, orders.o_custkey == cust.c_custkey
                ).select(
                    F.col("c_mktsegment").alias("segment"),
                    F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").alias(
                        "cents"
                    ),
                )

            @sdp.temporary_view(name="f43_open_orders")
            def open_orders() -> DataFrame:
                return spark.table("orders").filter("o_orderstatus = 'O'")

        declare(reg, define)
        run_local_pipeline(spark, reg, store)
        _F43_DONE[key] = f"{store}/f43_segment_report"
    return (
        spark.read.parquet(_F43_DONE[key])
        .select("segment", "n_orders", "cents_sum")
        .orderBy("segment")
    )
