from dwh_etl_framework_spark.sources.registry import (
    SourceSpec,
    load_source,
    register_sources,
    register_fixture_tables,
    FIXTURE_TABLES,
)
from dwh_etl_framework_spark.sources.sinks import (
    write_table,
    write_jdbc,
    overwrite_table,
)

__all__ = [
    "SourceSpec",
    "load_source",
    "register_sources",
    "register_fixture_tables",
    "FIXTURE_TABLES",
    "write_table",
    "write_jdbc",
    "overwrite_table",
]
