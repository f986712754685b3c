"""Event-time windowing — batch-first, streaming-ready — plus custom
stateful operators (applyInPandasWithState)."""

from .joins import interval_join_streams  # noqa: F401
from .stateful import running_totals, stream_dedup  # noqa: F401
from .windows import (  # noqa: F401
    enrich_stream,
    read_stream,
    session_agg,
    sliding_agg,
    tumbling_agg,
)
