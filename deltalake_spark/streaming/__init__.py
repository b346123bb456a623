"""Streaming surface: CDC consumers and Structured-Streaming subscriptions."""

from deltalake_spark.streaming.consumer import CDCConsumer, FileOffsetStorage, MemoryOffsetStorage

__all__ = ["CDCConsumer", "FileOffsetStorage", "MemoryOffsetStorage"]
