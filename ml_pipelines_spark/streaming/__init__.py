"""Event-time windowing — batch-first, streaming-ready."""

from .windows import (  # noqa: F401
    read_stream,
    session_agg,
    sliding_agg,
    tumbling_agg,
)
