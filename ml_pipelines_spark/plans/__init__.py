"""Plan auditing — programmatic inspection of executed plans."""

from .audit import (  # noqa: F401
    count_exchanges,
    count_scans,
    lint,
    plan_formatted,
    plan_text,
    pushed_filters,
)
