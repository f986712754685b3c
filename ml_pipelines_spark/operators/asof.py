"""As-of join — the canonical time-series operator Spark lacks natively
(SURVEY.md §2.3 notes its absence in both Spark and the reference; the
driver's events table motivates it).

Spark-first construction, no range explosion and no per-key loops:

1. Tag both sides and union them on (key, ts) — left probe rows and
   right state rows interleave in one dataset.
2. One window pass per key ordered by (ts, side): ``last(right payload,
   ignorenulls)`` up to the current row yields, for every probe row, the
   most recent right row at-or-before its timestamp.
3. Filter back to probe rows.

Cost: ONE shuffle on the key (the window), regardless of how many right
rows precede each probe — versus the naive range-join which is
O(|L|·|R|) per key. Skewed keys are handled by AQE the same as any
window; at 100 TB both inputs can be bucketed on the key to make the
shuffle a local sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    right_payload: list[str],
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the latest right row with the same key
    and right.ts <= left.ts (< when ``strict``).

    ``right`` must carry exactly (key_cols, ts_col, right_payload);
    payload names must not collide with left columns. Payload is null
    when no right row precedes the probe.
    """
    lcols = left.columns
    clash = set(right_payload) & set(lcols)
    if clash:
        raise ValueError(f"payload columns collide with left: {clash}")

    l = left.withColumn("__side", F.lit(1))
    for c in right_payload:
        l = l.withColumn(c, F.lit(None).cast(right.schema[c].dataType))

    r = right.select(*key_cols, ts_col, *right_payload).withColumn(
        "__side", F.lit(0)
    )
    for c in lcols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    unioned = l.unionByName(r.select(*l.columns))

    # strict: right rows at ts == probe ts must NOT be visible → order
    # them after left rows at equal ts; non-strict: before.
    side_order = F.col("__side").desc() if strict else F.col("__side").asc()
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col).asc(), side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned
    for c in right_payload:
        filled = filled.withColumn(
            c,
            F.last(F.when(F.col("__side") == 0, F.col(c)), ignorenulls=True).over(w),
        )
    return filled.filter(F.col("__side") == 1).select(*lcols, *right_payload)
