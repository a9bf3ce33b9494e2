from dwh_etl_framework_spark.operators.merge import (
    JournalSpec,
    flip_journal_state,
    latest_per_key,
    merge_delta,
    merge_full,
    stamp_journal_columns,
)
from dwh_etl_framework_spark.operators.asof import asof_join

__all__ = [
    "JournalSpec",
    "flip_journal_state",
    "latest_per_key",
    "merge_delta",
    "merge_full",
    "stamp_journal_columns",
    "asof_join",
]
