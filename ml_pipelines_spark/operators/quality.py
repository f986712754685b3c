"""Pipeline data-quality instrumentation via ``df.observe``.

Production curation jobs need gate-by-gate counters (rows in, rows
dropped per filter, null rates) WITHOUT extra passes over the data.
``observe`` attaches named aggregate metrics to a plan node; Spark
computes them as a side product of whatever action runs the plan — zero
additional scans, exactly-once semantics per action, and the numbers
arrive through a QueryExecutionListener / Observation object rather
than the result itself. The 100 TB alternative — a ``count()`` per gate
— re-executes the upstream once per counter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observed_filter(
    df: DataFrame,
    condition: Column,
    name: str,
) -> tuple[DataFrame, Observation]:
    """Apply ``filter(condition)`` with pass/fail counters attached.

    Returns (filtered_df, observation); after any action on the
    result, ``observation.get`` holds ``{name}_in``, ``{name}_kept``
    and ``{name}_dropped`` — computed in the same pass as the action.
    """
    obs = Observation(name)
    instrumented = df.observe(
        obs,
        F.count(F.lit(1)).alias(f"{name}_in"),
        F.count(F.when(condition, 1)).alias(f"{name}_kept"),
        F.count(F.when(~condition, 1)).alias(f"{name}_dropped"),
    )
    return instrumented.filter(condition), obs


def observed_null_rates(
    df: DataFrame, cols: list[str], name: str = "nulls"
) -> tuple[DataFrame, Observation]:
    """Pass-through with per-column null counters (+ total rows) for
    schema-drift monitoring at ingestion edges."""
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias(f"{name}_rows")] + [
        F.count(F.when(F.col(c).isNull(), 1)).alias(f"{name}_null_{c}")
        for c in cols
    ]
    return df.observe(obs, *metrics), obs
