"""Structured Streaming surface: incremental 1m-tier ingest."""

from .ingest import streaming_rollup_1m, start_file_ingest

__all__ = ["streaming_rollup_1m", "start_file_ingest"]
