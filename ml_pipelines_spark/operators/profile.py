"""Column profiling — per-column summary statistics in one scan.

The ingest-side companion to operators.validate: before writing
expectations you profile the table. One aggregation pass computes, for
every requested column: row count, null count, approx distinct, min,
max, and (for numerics) mean. A second tiny pass per requested column
gets exact top-k frequent values (groupBy on that column).

Scale: the stats pass is all conditional/partial aggregates — map-side
combine, bytes to the driver. ``top_values`` is one shuffle keyed on the
profiled column; its output is capped at k rows. Nothing materializes
row data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


def profile_columns(
    df: DataFrame, cols: list[str] | None = None, exact_distinct: bool = False
) -> DataFrame:
    """One-pass profile: (column, total, nulls, approx_distinct, min,
    max, mean). min/max are rendered as strings so heterogeneous column
    types stack into one report; mean is null for non-numerics.

    ``exact_distinct`` swaps the HLL sketch for COUNT(DISTINCT) —
    engine-portable (oracle-checkable) but one extra expand per column;
    the default approx sketch is the 100 TB choice.
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = cols or list(fields)
    aggs = [F.count(F.lit(1)).alias("__total")]
    for i, c in enumerate(cols):
        col = F.col(c)
        aggs.append(F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"__n{i}"))
        if not exact_distinct:
            aggs.append(F.approx_count_distinct(col).alias(f"__d{i}"))
        aggs.append(F.min(col).cast("string").alias(f"__lo{i}"))
        aggs.append(F.max(col).cast("string").alias(f"__hi{i}"))
        if isinstance(fields.get(c), NumericType):
            aggs.append(F.avg(col).alias(f"__m{i}"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"__m{i}"))
    row = df.agg(*aggs)
    if exact_distinct:
        # Exact distincts live in their OWN aggregation: mixing
        # count(distinct) with scalar aggs forces Catalyst to expand
        # every row once per distinct column and sort-aggregate the
        # union of all distinct keys — ~3× slower than running the two
        # shapes separately and cross-joining the single-row results.
        dist = df.agg(
            *[F.count_distinct(F.col(c)).alias(f"__d{i}") for i, c in enumerate(cols)]
        )
        row = row.crossJoin(dist)
    parts = []
    for i, c in enumerate(cols):
        escaped = c.replace("'", "''")
        parts.append(
            f"'{escaped}', bigint(__n{i}), bigint(__d{i}), __lo{i}, __hi{i}, __m{i}"
        )
    return row.select(
        F.expr(
            f"stack({len(cols)}, {', '.join(parts)}) "
            "as (column, nulls, approx_distinct, min, max, mean)"
        ),
        F.col("__total").cast("long").alias("total"),
    ).select("column", "total", "nulls", "approx_distinct", "min", "max", "mean")


def top_values(df: DataFrame, col: str, k: int = 10) -> DataFrame:
    """Exact top-k most frequent values of ``col`` with counts.
    Ties break by value for determinism. One shuffle; k rows out."""
    return (
        df.groupBy(F.col(col).cast("string").alias("value"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc_nulls_last("value"))
        .limit(k)
    )
