"""Structured Streaming support (SURVEY.md §2.B Streaming, §3.3)."""

from pycaim_spark.streaming.runner import read_events_stream, run_available_now

__all__ = ["read_events_stream", "run_available_now"]
