"""r35 shared-CTE materialization via the F9 step checkpoint (VERDICT
r10 #3): Catalyst plans the `supply` CTE twice through the Q2-shape
decorrelation (once on the probe side, once inside the decorrelated
per-part MIN). The pipeline-surface fix is a two-step recipe — step 1
materializes `supply` with ``cache=True`` (localCheckpoint), step 2
runs the same report SQL against the cached view — which drops the
second fact aggregation entirely. Result equality is pinned against
the oracled r35; the A/B wall-clock numbers live in PLANS.md
("r35 shared-CTE A/B")."""

from __future__ import annotations

from dwh_etl_framework_spark.plans.config import TransformStep
from dwh_etl_framework_spark.plans.steps import StepContext, run_select_step
from dwh_etl_framework_spark.queries.registry import fixtures
from dwh_etl_framework_spark.queries.wave18 import r35_min_cost_supplier
from tests.conftest import SF_DIR

#: the _R35_SQL CTE body, verbatim
SUPPLY_SQL = """
SELECT l_partkey AS partkey, l_suppkey AS suppkey,
       MIN(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS cost_cents
FROM lineitem
GROUP BY 1, 2
"""

#: the _R35_SQL main body, verbatim minus the WITH clause — `supply`
#: now resolves to the step-cached temp view
MAIN_SQL = """
SELECT p.p_partkey AS p_partkey, p.p_type AS p_type, s.s_name AS s_name,
       n.n_name AS n_name, sp.cost_cents AS cost_cents
FROM part p
JOIN supply sp ON sp.partkey = p.p_partkey
JOIN supplier s ON s.s_suppkey = sp.suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'EUROPE'
  AND sp.cost_cents = (
      SELECT MIN(sp2.cost_cents)
      FROM supply sp2
      JOIN supplier s2 ON s2.s_suppkey = sp2.suppkey
      JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
      JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
      WHERE sp2.partkey = p.p_partkey AND r2.r_name = 'EUROPE')
ORDER BY cost_cents, p_partkey, s_name
LIMIT 100
"""


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def run_cached_r35(spark, sf_dir, checkpoint_mode="local"):
    """The two-step pipeline recipe: cache `supply` (F9), then report."""
    fixtures(spark, sf_dir)
    ctx = StepContext(spark=spark, checkpoint_mode=checkpoint_mode)
    run_select_step(ctx, TransformStep(sql=SUPPLY_SQL, alias="supply", cache=True))
    return run_select_step(ctx, TransformStep(sql=MAIN_SQL, alias="r35_cached"))


def test_cached_supply_matches_inline_cte(spark):
    want = sorted(map(tuple, r35_min_cost_supplier(spark, SF_DIR).collect()))
    got = sorted(map(tuple, run_cached_r35(spark, SF_DIR).collect()))
    assert got == want and got


def test_cached_plan_drops_the_second_fact_aggregation(spark):
    """The inline plan derives `supply` twice — two lineitem scans, two
    partkey/suppkey aggregates. Against the step cache, the report plan
    touches no parquet fact scan at all: both CTE consumers read the
    checkpointed (vocabulary-sized) supply relation."""
    inline_plan = _plan(r35_min_cost_supplier(spark, SF_DIR))
    assert inline_plan.count("lineitem") >= 2  # the double derivation
    cached_plan = _plan(run_cached_r35(spark, SF_DIR))
    assert "lineitem" not in cached_plan
    assert "CartesianProduct" not in cached_plan
