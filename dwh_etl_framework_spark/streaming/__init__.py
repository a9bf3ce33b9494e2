from dwh_etl_framework_spark.streaming.windows import (
    sliding_window_agg,
    session_window_agg,
    tumbling_window_agg,
    stream_dedup,
    events_file_stream,
)
from dwh_etl_framework_spark.streaming.merge import stream_merge_to_master
from dwh_etl_framework_spark.streaming.asof import stream_asof_join, tag_streams

__all__ = [
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_window_agg",
    "stream_dedup",
    "events_file_stream",
    "stream_merge_to_master",
    "stream_asof_join",
    "tag_streams",
]
