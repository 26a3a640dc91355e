"""Structured Streaming surface: incremental 1m-tier ingest + custom
stateful operators."""

from .drift import streaming_drift
from .ingest import (streaming_rollup_1m, start_file_ingest,
                     stateful_sessionize, start_chunk_compress)

__all__ = ["streaming_rollup_1m", "start_file_ingest",
           "stateful_sessionize", "start_chunk_compress",
           "streaming_drift"]
