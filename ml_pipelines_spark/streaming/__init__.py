"""Event-time windowing — batch-first, streaming-ready — plus custom
stateful operators (applyInPandasWithState)."""

from .joins import interval_join_streams  # noqa: F401
from .state_backend import (  # noqa: F401
    rocksdb_state_conf,
    state_backend,
)
from .stateful import (  # noqa: F401
    running_totals,
    running_totals_tws,
    sessionize_with_timeout,
    stream_dedup,
    stream_dedup_within_watermark,
    tws_available,
)
from .windows import (  # noqa: F401
    enrich_stream,
    read_stream,
    session_agg,
    sliding_agg,
    tumbling_agg,
)
