from lucene_spark.streaming.dedup_stream import dedup_stream, dedup_stream_stateful
from lucene_spark.streaming.incremental import append_batch, index_stream

__all__ = ["append_batch", "dedup_stream", "dedup_stream_stateful", "index_stream"]
