"""Runtime bloom-filter join pruning: a selective dimension filter should

inject a bloom filter into the fact-side scan, cutting shuffled rows before
the join — one of the big at-scale wins Spark applies when enabled."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR


def test_bloom_filter_injected(spark):
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        # fixture scans are far below the 10 GB default application-side
        # threshold — zero it so the optimization fires at test scale (at
        # 100 TB the default gate passes naturally)
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        # force a shuffle join so the runtime filter is worth injecting
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        sel_orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        joined = lineitem.join(
            sel_orders, lineitem.l_orderkey == sel_orders.o_orderkey
        )
        optimized = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom" in optimized.lower(), (
            "expected a runtime bloom filter in the optimized plan"
        )
        # correctness unchanged by the runtime filter
        expected = (
            lineitem.join(
                spark.read.parquet(f"{SF_DIR}/orders.parquet"),
                lineitem.l_orderkey == F.col("o_orderkey"),
            )
            .filter(F.col("o_orderpriority") == "1-URGENT")
            .count()
        )
        assert joined.count() == expected
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
