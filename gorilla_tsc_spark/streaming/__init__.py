"""Structured Streaming wrappers: streaming rollup tiers with
watermarked late-data handling, and a stateful streaming Gorilla
encoder."""
from .rollup_stream import (stream_distinct_sketch_1m,
                            stream_item_counts_1m, stream_rollup_1m)
from .encode_stream import stream_encode_blocks

__all__ = ["stream_rollup_1m", "stream_distinct_sketch_1m",
           "stream_item_counts_1m", "stream_encode_blocks"]
