"""Structured Streaming surface (SURVEY.md §2.6): the extraction
pipeline as an incremental job with Spark-native checkpointing."""

from .stream import stream_pipeline, stream_pipeline_foreach_batch  # noqa: F401
