"""Structured Streaming lift of the rule vocabulary.

The reference is batch-only (files polled from a landing prefix,
dve pipeline/pipeline.py:164-196); this module is the net-new streaming
surface sketched in SURVEY §2.8: because every step is a pure DataFrame
transformation, stateless steps (filter/notify/add/select/deferred-filter
message emission) lift verbatim onto ``readStream`` sources. Stateful
integrity checks (``one_to_one_join`` count equality, header 1-row probes)
are NOT streaming-safe and raise explicitly rather than degrade silently.
"""

from data_validation_engine_spark.streaming.filters import (
    read_entity_stream,
    start_message_sink,
    streaming_exact_dedup,
    streaming_incremental_dedup,
    streaming_sync_filters,
    windowed_counts,
)
from data_validation_engine_spark.streaming.cardinality import (
    streaming_kmv_distinct,
    streaming_paragraph_frequency,
    window_start_col,
)
from data_validation_engine_spark.streaming.cdc import (
    streaming_apply_changes,
)
from data_validation_engine_spark.streaming.joins import (
    stream_interval_join,
)
from data_validation_engine_spark.streaming.rolling import (
    streaming_rolling_counts,
)
from data_validation_engine_spark.streaming.funnel import (
    streaming_window_funnel,
)
from data_validation_engine_spark.streaming.sessions import (
    session_stats,
    sessionize,
    streaming_sessionize,
)

__all__ = [
    "read_entity_stream",
    "session_stats",
    "sessionize",
    "start_message_sink",
    "stream_interval_join",
    "streaming_apply_changes",
    "streaming_exact_dedup",
    "streaming_incremental_dedup",
    "streaming_kmv_distinct",
    "streaming_paragraph_frequency",
    "streaming_rolling_counts",
    "streaming_window_funnel",
    "streaming_sessionize",
    "streaming_sync_filters",
    "window_start_col",
    "windowed_counts",
]
