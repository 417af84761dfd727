"""Structured Streaming integration.

The reference's mergeability (union/merge is commutative+associative,
SURVEY.md §4) is exactly what makes sketches streaming-friendly: each
micro-batch reduces to per-key partial sketch blobs appended to a state
table; reads merge on demand. No giant keyed state in the streaming
engine, replay-safe, and the same bytes the batch pipeline checkpoints.
"""

from datasketches_rust_spark.streaming.dedup import (
    exact_dedup_stream,
    incremental_dedup_foreach_batch,
    interval_join_streams,
    read_merged_sketches,
    sketch_stream,
    stateful_sketch_estimates,
    streaming_sessions,
    windowed_quantiles,
    windowed_sketch_estimates,
    windowed_topk,
)

__all__ = [
    "exact_dedup_stream",
    "incremental_dedup_foreach_batch",
    "interval_join_streams",
    "read_merged_sketches",
    "sketch_stream",
    "stateful_sketch_estimates",
    "streaming_sessions",
    "windowed_quantiles",
    "windowed_sketch_estimates",
    "windowed_topk",
]
