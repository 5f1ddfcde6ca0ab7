"""Structured Streaming variants of the engine's windowed operators.

The reference is an event-time Flink job (Kafka source → 30-min
bounded-out-of-orderness watermarks → windowed aggregations,
`SN/SocialNetwork.java:68-87`); here the same semantics are Structured
Streaming: ``readStream`` file/Kafka source → ``withWatermark`` → the SAME
window expressions the batch plans use. The batch queries are the
oracle-checked spec; streaming correctness is validated by equality against
them (the reference's own dual-implementation methodology,
`SN/validation/SlidingWindowEvaluator.java:35-59`) in tests/test_streaming.py.
"""

from .sources import (
    stream_events,
    kafka_activity_source,
    kafka_sink_options,
    parse_kafka_frames,
)
from .joins import valid_likes_join_stream
from .resolution import IncrementalResolver, resolve_lines_stream
from .windows import (
    dedup_stream,
    running_totals_stream,
    running_totals_stateful,
    run_to_memory,
    sliding_counts_two_stage_stream,
    tumbling_counts_stream,
    unique_users_stream,
)

__all__ = [
    "stream_events",
    "kafka_activity_source",
    "kafka_sink_options",
    "parse_kafka_frames",
    "dedup_stream",
    "tumbling_counts_stream",
    "sliding_counts_two_stage_stream",
    "unique_users_stream",
    "running_totals_stream",
    "running_totals_stateful",
    "run_to_memory",
    "valid_likes_join_stream",
    "IncrementalResolver",
    "resolve_lines_stream",
]
