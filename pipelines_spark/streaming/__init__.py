"""Structured Streaming capture (SURVEY §2.9, §3.2)."""

from pipelines_spark.streaming.capture import run_capture_stream  # noqa: F401
