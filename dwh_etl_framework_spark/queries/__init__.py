"""Query registry: every operator from SURVEY.md §2 as a (Spark, oracle) pair.

Importing this package populates the registry. ``__spark_entry__.py`` exposes
it to the correctness driver; ``tests/test_oracle_parity.py`` runs the same
comparison locally.
"""

from dwh_etl_framework_spark.queries.registry import QUERIES, QueryDef, fixtures, query

# modules register themselves on import
from dwh_etl_framework_spark.queries import relational_core  # noqa: F401
from dwh_etl_framework_spark.queries import relational_agg  # noqa: F401
from dwh_etl_framework_spark.queries import relational_fns  # noqa: F401
from dwh_etl_framework_spark.queries import relational_more  # noqa: F401
from dwh_etl_framework_spark.queries import relational_fns2  # noqa: F401
from dwh_etl_framework_spark.queries import python_exec  # noqa: F401
from dwh_etl_framework_spark.queries import wave3  # noqa: F401
from dwh_etl_framework_spark.queries import wave4  # noqa: F401
from dwh_etl_framework_spark.queries import curation  # noqa: F401
from dwh_etl_framework_spark.queries import clustering  # noqa: F401
from dwh_etl_framework_spark.queries import event_analytics  # noqa: F401
from dwh_etl_framework_spark.queries import warehouse_ops  # noqa: F401
from dwh_etl_framework_spark.queries import wave5  # noqa: F401
from dwh_etl_framework_spark.queries import nested_json  # noqa: F401
from dwh_etl_framework_spark.queries import merge_protocol  # noqa: F401
from dwh_etl_framework_spark.queries import windows_batch  # noqa: F401
from dwh_etl_framework_spark.queries import text_ops  # noqa: F401
from dwh_etl_framework_spark.queries import dedup_ops  # noqa: F401
from dwh_etl_framework_spark.queries import vector_ops  # noqa: F401
from dwh_etl_framework_spark.queries import multimodal_ops  # noqa: F401

__all__ = ["QUERIES", "QueryDef", "fixtures", "query"]
