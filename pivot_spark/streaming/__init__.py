from pivot_spark.streaming.dedup_stream import dedup_stream, first_seen_stream
from pivot_spark.streaming.pivot_stream import pivot_stream

__all__ = ["pivot_stream", "dedup_stream", "first_seen_stream"]
