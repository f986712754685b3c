"""Point-in-interval range join via bin bucketing (SURVEY.md §2.3 notes
range joins absent from both the reference and native Spark; the events
table motivates adding one as a first-class operator).

Open-source Spark has no range-join optimization: a plain
``l.join(r, keys + [point >= start, point < end])`` plans the range
condition as a post-filter of the key equi-join — acceptable with
selective keys, but a hot key (or no key at all) degenerates into a
nested-loop over every candidate pair. The bin rewrite makes the range
itself part of the equi-join key:

1. Pick a bin width ``W`` (seconds). A point at ``t`` lands in bin
   ``floor(t / W)`` — exactly one row per point.
2. An interval ``[s, e]`` is exploded to every bin it overlaps:
   ``floor(s/W) .. floor(e/W)``, i.e. at most ``(e-s)/W + 2`` rows —
   bounded when ``W`` is chosen near the typical interval length.
3. Equi-join on ``(keys..., bin)`` — one hash shuffle, broadcast- and
   AQE-skew-eligible like any other equi-join — then the exact
   containment predicate filters residual pairs inside the same stage.

Each qualifying (interval, point) pair meets in exactly one bin (the
point's), so the join emits no duplicates and needs no post-dedup.
Timestamps are binned on truncated epoch seconds; truncation is
monotone, so the bin ranges are conservative with respect to the exact
predicate re-checked after the join.

At 100 TB: the shuffle key (keys..., bin) has far higher cardinality
than the keys alone, so partitions stay balanced even when one user
dominates; the interval fan-out multiplies the (typically much smaller)
interval side only; and both sides prune columns into the scan as
usual.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType


def _epoch_seconds(df: DataFrame, col: str) -> Column:
    """Numeric axis for binning: truncated epoch seconds for timestamps,
    the value itself for numeric columns."""
    if isinstance(df.schema[col].dataType, TimestampType):
        return F.unix_timestamp(F.col(col))
    return F.col(col).cast("double")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    key_cols: list[str],
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: float,
    closed: str = "left",
) -> DataFrame:
    """Inner-join every point row to every interval row with equal
    ``key_cols`` whose ``[start_col, end_col)`` contains ``point_col``
    (``closed``: "left" = ``[s, e)``, "both" = ``[s, e]``).

    Output columns: all point columns, then the interval's non-key
    columns. Non-key column names must be disjoint across the inputs.
    ``bin_width`` is in seconds for timestamp axes (units of the value
    otherwise); intervals fan out to ``(e-s)/bin_width + 2`` rows, so
    pick it near the typical interval length.
    """
    if closed not in ("left", "both"):
        raise ValueError(f"closed must be 'left' or 'both', got {closed!r}")
    clash = (set(points.columns) & set(intervals.columns)) - set(key_cols)
    if clash:
        raise ValueError(f"non-key columns collide: {sorted(clash)}")

    p = points.withColumn(
        "__bin", F.floor(_epoch_seconds(points, point_col) / F.lit(bin_width))
    )
    i = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(_epoch_seconds(intervals, start_col) / F.lit(bin_width)),
                F.floor(_epoch_seconds(intervals, end_col) / F.lit(bin_width)),
            )
        ),
    )
    contained = (F.col(point_col) >= F.col(start_col)) & (
        F.col(point_col) <= F.col(end_col)
        if closed == "both"
        else F.col(point_col) < F.col(end_col)
    )
    return (
        p.join(i, [*key_cols, "__bin"], "inner")
        .filter(contained)
        .drop("__bin")
    )


def band_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_val: str,
    delta: float,
    keys: list[str] | None = None,
) -> DataFrame:
    """Numeric band join: pairs with ``|left_val - right_val| <= delta``
    (optionally under equi-``keys``) — the |a-b|<=δ companion of the
    point-in-interval rewrite above, same bucketing idea: with bin width
    δ, any qualifying pair's bins differ by at most 1, so the LEFT side
    emits one row per bin and the RIGHT side fans out to its bin and
    both neighbors (a fixed 3x, independent of data), the bins equi-join
    (one balanced hash shuffle, never a nested loop over the cross
    product), and the exact band predicate filters in-stage. Each pair
    meets in exactly one bin — the left row's — so no dedup pass.
    """
    keys = keys or []
    lb = F.floor(F.col(left_val) / F.lit(delta)).alias("__bin")
    l = left.select("*", lb)
    r = right.select(
        "*",
        F.explode(
            F.sequence(
                F.floor(F.col(right_val) / F.lit(delta)) - 1,
                F.floor(F.col(right_val) / F.lit(delta)) + 1,
            )
        ).alias("__bin"),
    )
    joined = l.join(r, keys + ["__bin"])
    return joined.filter(
        F.abs(F.col(left_val) - F.col(right_val)) <= delta
    ).drop("__bin")
