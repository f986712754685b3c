"""Event-sequence pattern matching — MATCH_RECOGNIZE for Spark.

Flink SQL / Trino expose ``MATCH_RECOGNIZE`` for "did this user view,
then click, then purchase, with no error in between?" questions; Spark
has no native row-pattern operator. This module compiles the pattern
shape to something Spark executes entirely JVM-side:

1. Encode each event as ONE character (a dictionary from event type to
   code) and build each key's JOURNEY STRING with
   ``array_sort(collect_list(struct(order..., code)))`` + ``transform``
   + ``array_join`` — deterministic event order (ties broken by the
   caller's full order tuple), one shuffle on the key, no Python.
2. Express the row pattern as an ordinary REGEX over the journey and
   evaluate it with ``regexp_count`` / ``instr`` — whole-stage codegen,
   so pattern evaluation costs string scanning, not a per-row
   interpreter.

Scale shape: the only wide operation is the per-key groupBy (the same
shuffle any sessionization pays). Per-key state is the journey string —
bounded by events-per-key; ``max_events`` caps pathological whale keys
by keeping only each key's FIRST k events (by the order tuple), via
``slice`` after the sort, still expression-only. A 100 TB event table
with bounded per-user activity streams through one exchange and one
string pass.

The regex subset used here (literal codes, negated character classes,
lazy quantifiers) has identical leftmost, non-overlapping match
semantics in Java's engine (Spark) and RE2 (DuckDB/Trino), which is
what makes the cross-engine value oracle possible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def journey_strings(
    events: DataFrame,
    key_col: str,
    order_cols: list[str],
    code: Column,
    max_events: int | None = None,
) -> DataFrame:
    """One row per key: ``(key, journey)`` where ``journey`` is the
    key's events as a code string, ordered by ``order_cols``.

    ``code`` must evaluate to a single-character string per event (use
    ``event_code`` for the dictionary case). ``max_events`` keeps only
    the first k events per key (whale-key cap, applied AFTER the sort
    so it is deterministic).
    """
    s = F.struct(
        *[F.col(c) for c in order_cols], code.alias("__code")
    )
    arr = F.array_sort(F.collect_list(s))
    if max_events is not None:
        arr = F.slice(arr, 1, max_events)
    return events.groupBy(key_col).agg(
        F.array_join(
            F.transform(arr, lambda x: x["__code"]), ""
        ).alias("journey")
    )


def event_code(col: str | Column, mapping: dict[str, str]) -> Column:
    """Dictionary encode an event-type column to one-char codes; events
    missing from the mapping become ``_`` (never matched by letter
    patterns)."""
    c = F.col(col) if isinstance(col, str) else col
    expr = None
    for k, v in mapping.items():
        if len(v) != 1:
            raise ValueError(f"code for {k!r} must be one char, got {v!r}")
        expr = (
            F.when(c == k, v) if expr is None else expr.when(c == k, v)
        )
    return (expr.otherwise("_") if expr is not None else F.lit("_"))


def match_count(journey: str | Column, pattern: str) -> Column:
    """Number of non-overlapping, leftmost matches of ``pattern`` in the
    journey — the MATCH_RECOGNIZE ``ONE ROW PER MATCH`` count. Keep the
    pattern inside the cross-engine-safe subset (literal codes, negated
    classes, lazy quantifiers)."""
    j = F.col(journey) if isinstance(journey, str) else journey
    return F.regexp_count(j, F.lit(pattern))


def funnel_depth(journey: str | Column, steps: str) -> Column:
    """How many of the ordered funnel ``steps`` (a code string, e.g.
    ``"svp"``) the journey completed IN ORDER — the classic funnel-depth
    measure, built from chained ``instr``/``substring`` so the same
    arithmetic runs on any SQL engine. Returns 0..len(steps)."""
    j = F.col(journey) if isinstance(journey, str) else journey
    depth = F.lit(0)
    pos = F.lit(0)  # absolute index consumed so far
    alive = F.lit(True)
    for ch in steps:
        rel = F.instr(F.substring(j, pos + 1, F.length(j)), ch)
        hit = alive & (rel > 0)
        depth = depth + F.when(hit, 1).otherwise(0)
        pos = F.when(hit, pos + rel).otherwise(pos)
        alive = hit
    return depth
