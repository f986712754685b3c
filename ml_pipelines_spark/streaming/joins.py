"""Stream-stream event-time interval join.

The streaming twin of operators.rangejoin: a points stream joins an
intervals stream on equality keys plus a time-range condition. Unlike
the batch case, no bin rewrite is needed — Structured Streaming's
stream-stream join natively supports event-time range predicates, and
the watermarks are what bound the join STATE: each side buffers only
rows newer than (other side's watermark − max interval length), so
state is O(rate × window), independent of stream length.

Requirements baked into the construction:
- both sides carry a watermark (mandatory for state eviction on inner
  time-bounded joins);
- the range condition ties the two event-time columns together so Spark
  can derive the state retention bound;
- an equality key keeps the join a hash join per micro-batch rather
  than a per-batch cartesian.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    points: DataFrame,
    intervals: DataFrame,
    key_cols: list[str],
    point_ts: str,
    start_ts: str,
    end_ts: str,
    point_watermark: str,
    interval_watermark: str,
) -> DataFrame:
    """Inner-join each point row to interval rows with equal keys whose
    ``[start_ts, end_ts)`` contains ``point_ts`` — both sides streaming.

    ``points`` and ``intervals`` must be streaming DataFrames; non-key
    column names must be disjoint. Watermark strings (e.g. "10 minutes")
    bound how late each side may arrive AND how much state is kept.
    """
    clash = (set(points.columns) & set(intervals.columns)) - set(key_cols)
    if clash:
        raise ValueError(f"non-key columns collide: {sorted(clash)}")
    p = points.withWatermark(point_ts, point_watermark)
    i = intervals.withWatermark(start_ts, interval_watermark)
    cond = F.lit(True)
    for k in key_cols:
        cond = cond & (p[k] == i[k])
    cond = cond & (p[point_ts] >= i[start_ts]) & (p[point_ts] < i[end_ts])
    joined = p.join(i, cond, "inner")
    # drop the duplicated key columns from the interval side
    return joined.drop(*[i[k] for k in key_cols])


def outer_interval_join_streams(
    points: DataFrame,
    intervals: DataFrame,
    key_cols: list[str],
    point_ts: str,
    start_ts: str,
    end_ts: str,
    point_watermark: str,
    interval_watermark: str,
) -> DataFrame:
    """LEFT OUTER variant: every point row emits — joined when a
    matching interval exists, null-padded otherwise. The semantics the
    inner join cannot give: "which clicks were never attributed".

    The outer side makes watermarks LOAD-BEARING for emission, not just
    for state eviction: an unmatched point can only be declared
    unmatched once BOTH watermarks have passed the end of its match
    window, so null rows trail the event time by the watermark delay —
    at stream end, nothing emits the trailing tail unless something
    advances the watermark past it (Spark's no-data batches handle the
    steady state; finite replays append a far-future sentinel row and
    filter it from results — the pattern the gate query uses).
    """
    clash = (set(points.columns) & set(intervals.columns)) - set(key_cols)
    if clash:
        raise ValueError(f"non-key columns collide: {sorted(clash)}")
    p = points.withWatermark(point_ts, point_watermark)
    i = intervals.withWatermark(start_ts, interval_watermark)
    cond = F.lit(True)
    for k in key_cols:
        cond = cond & (p[k] == i[k])
    cond = cond & (p[point_ts] >= i[start_ts]) & (p[point_ts] < i[end_ts])
    joined = p.join(i, cond, "leftOuter")
    return joined.drop(*[i[k] for k in key_cols])
