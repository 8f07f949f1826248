from lucene_spark.streaming.incremental import append_batch, index_stream

__all__ = ["append_batch", "index_stream"]
