"""dwh_etl_framework_spark — a PySpark-native DWH ETL / analytics engine.

A from-scratch rebuild of the capabilities of the reference ETL framework
(``amukhsimov/dwh-etl-framework``, surveyed in SURVEY.md): source
registration, templated SQL transform pipelines, checkpointed steps, and the
journal→master merge protocol — re-expressed Spark-first (DataFrame / Spark
SQL / Structured Streaming), with no Airflow/Greenplum/Hudi dependency, and
extended with large-scale training-data-pipeline operators (dedup,
similarity search, text analysis, multimodal columns).

Design stance (see README.md):
- Everything is a declarative DataFrame plan; Catalyst does pushdown,
  pruning, join selection, AQE re-planning. No driver-side row loops.
- Joins to small dimensions are broadcast; big joins/aggs shuffle on keys
  with AQE skew handling enabled.
- Python UDFs only where built-ins can't express the semantics, and then
  always Arrow-batched (pandas_udf / mapInPandas / applyInPandas).
"""

from dwh_etl_framework_spark.session import SessionFactory, get_session
from dwh_etl_framework_spark.sources.registry import SourceSpec, register_sources
from dwh_etl_framework_spark.plans.config import (
    DependencyConfig,
    PipelineConfig,
    TableConfig,
    TransformStep,
    load_pipeline_config,
)
from dwh_etl_framework_spark.plans.pipeline import Pipeline
from dwh_etl_framework_spark.operators.merge import (
    JournalSpec,
    merge_delta,
    merge_full,
    flip_journal_state,
    stamp_journal_columns,
)

__all__ = [
    "SessionFactory",
    "get_session",
    "SourceSpec",
    "register_sources",
    "DependencyConfig",
    "PipelineConfig",
    "TableConfig",
    "TransformStep",
    "load_pipeline_config",
    "Pipeline",
    "JournalSpec",
    "merge_full",
    "merge_delta",
    "flip_journal_state",
    "stamp_journal_columns",
]

__version__ = "0.1.0"
