#!/usr/bin/env python
"""Author a pipeline with the public Spark Declarative Pipelines API and
run it on the classic session via the framework's local executor
(``plans/declarative.py`` — the build's own SDP runner is Connect-only).

Shows the round-13 executor surface: a temp view (graph-internal, dropped
after the run), a full-refresh ``@sdp.table`` with a batch query, a
materialized-view chain declared CONSUMER-FIRST, static ``depends_on``
hints (one planning pass instead of retry discovery), and a csv sink
riding the checkpointed file-sink commit log.

    python examples/declarative_pipeline/run.py
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(HERE.parent.parent))

import pyspark.pipelines as sdp  # noqa: E402

from dwh_etl_framework_spark import get_session  # noqa: E402
from dwh_etl_framework_spark.plans.declarative import (  # noqa: E402
    LocalGraphRegistry,
    declare,
    run_local_pipeline,
)


def main() -> None:
    store = tempfile.mkdtemp(prefix="sdp_example_")
    with get_session(app_name="example-declarative-pipeline") as spark:
        src = f"{store}/src"
        spark.range(100).selectExpr(
            "id", "id % 7 AS bucket", "CAST(id * 1.5 AS DOUBLE) AS amount"
        ).write.parquet(src)

        reg = LocalGraphRegistry()

        def define() -> None:
            # consumer FIRST on purpose: with depends_on hints below the
            # executor still plans the whole graph in ONE pass
            @sdp.materialized_view(name="bucket_report")
            def report():
                return (
                    spark.table("enriched")
                    .groupBy("bucket")
                    .agg({"amount": "sum", "*": "count"})
                    .withColumnRenamed("sum(amount)", "amount_sum")
                    .withColumnRenamed("count(1)", "n")
                )

            @sdp.temporary_view(name="enriched")  # graph-internal
            def enriched():
                return spark.table("base").filter("amount > 10")

            @sdp.table(name="base")  # batch query => full refresh
            def base():
                return spark.read.parquet(src)

            sdp.create_sink(
                "report_csv",
                format="csv",
                options={"path": f"{store}/report_csv", "header": "true"},
            )

            @sdp.append_flow(target="report_csv", name="export")
            def export():
                return (
                    spark.readStream.schema("id bigint, bucket bigint, amount double")
                    .parquet(src)
                )

        declare(reg, define)
        stats: dict = {}
        out = run_local_pipeline(
            spark,
            reg,
            store,
            depends_on={"bucket_report": ["enriched"], "enriched": ["base"]},
            stats=stats,
        )
        print(f"planned in {stats['passes']} pass(es), "
              f"{stats['attempts']} attempts")
        out["bucket_report"].orderBy("bucket").show()
        assert not spark.catalog.tableExists("enriched")  # graph-scoped
        n_csv = (
            spark.read.option("header", "true").csv(f"{store}/report_csv").count()
        )
        print(f"csv sink rows: {n_csv}")


if __name__ == "__main__":
    main()
