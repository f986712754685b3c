"""Empirical-distribution statistics over fact-sized data — ordered
cumulative sums WITHOUT a global window, and the exact two-sample
Kolmogorov-Smirnov statistic built on them.

A cumulative distribution needs a total order over the distinct values.
``Window.orderBy(value)`` with no partition funnels everything through
one task — correct at test scale, a wall at 100 TB. ``ordered_cumsum``
reuses the ``dense_ids`` machinery instead: data-derived range buckets
from sampled cut points (operators/ids.py — see that module's docstring
for why buckets must be a pure function of row DATA), a per-bucket
window cumsum (P-way parallel), and bucket offsets cumulated over ≤P
rows then broadcast back. The result is the same exact prefix sum with
no single-task pass over the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .ids import _bucket_expr, _cut_points


def ordered_cumsum(
    df: DataFrame,
    order_col: str,
    sum_cols: list[str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``cum_<c>`` = sum of ``c`` over all rows with
    ``order_col`` <= this row's value (rows must be UNIQUE in
    ``order_col`` — aggregate to value grain first).

    Two-phase: per-bucket window cumsum + cumulated per-bucket totals
    (a window over at most P rows) broadcast-joined back. Exact for
    integer columns — addition order never matters.
    """
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    bounds = _cut_points(df, [order_col], parts)
    bucketed = df.withColumn("__b", _bucket_expr([order_col], bounds))
    w_local = (
        Window.partitionBy("__b")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = bucketed.select(
        "*", *[F.sum(c).over(w_local).alias(f"__l_{c}") for c in sum_cols]
    )
    totals = bucketed.groupBy("__b").agg(
        *[F.sum(c).alias(f"__t_{c}") for c in sum_cols]
    )
    w_off = Window.orderBy("__b").rowsBetween(
        Window.unboundedPreceding, -1
    )  # <= P rows: bucket-count sized, never data-sized
    offsets = totals.select(
        "__b",
        *[
            F.coalesce(F.sum(f"__t_{c}").over(w_off), F.lit(0)).alias(
                f"__o_{c}"
            )
            for c in sum_cols
        ],
    )
    out = local.join(F.broadcast(offsets), "__b")
    for c in sum_cols:
        out = out.withColumn(f"cum_{c}", F.col(f"__l_{c}") + F.col(f"__o_{c}"))
    return out.drop(
        "__b", *[f"__l_{c}" for c in sum_cols], *[f"__o_{c}" for c in sum_cols]
    )


def ordered_ntile(
    df: DataFrame,
    order_cols: list[str],
    n: int,
    out_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact ``NTILE(n) OVER (ORDER BY order_cols)`` with NO
    unpartitioned window and NO data-sized funnel (VERDICT r10 item 2).

    ``NTILE`` is pure rank arithmetic: with N rows, q = N div n,
    rem = N mod n, the first ``rem`` buckets hold q+1 rows —
    bucket(r) = ceil(r/(q+1)) for r <= rem*(q+1), else
    rem + ceil((r - rem*(q+1))/q). So the only distributed work is the
    global rank, computed with the dense-ids range-bucket machinery
    (operators/ids.py): sampled cut points -> per-bucket partitioned
    row_number (P-way parallel) + per-bucket counts. Unlike
    ``dense_ids``/``ordered_cumsum``, the <=P bucket counts are
    cumulated on the DRIVER (they are at most `parts` rows — bytes)
    and rejoined as a broadcast literal frame, so the physical plan
    carries zero unpartitioned Window nodes — the shape the plan
    linter can pass with no global-window waiver at all.

    ``order_cols`` must be a total order (add a unique tiebreaker) of
    non-null columns, matching NTILE's determinism requirement.
    """
    spark = df.sparkSession
    parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    bounds = _cut_points(df, order_cols, parts)
    keyed = df.withColumn("__b", _bucket_expr(order_cols, bounds))
    counts = {
        r["__b"]: r["c"]
        for r in keyed.groupBy("__b").agg(
            F.count(F.lit(1)).alias("c")
        ).collect()
    }
    total = sum(counts.values())
    if total == 0:
        return df.withColumn(out_col, F.lit(None).cast("int"))
    running, offsets = 0, []
    for b in sorted(counts):
        offsets.append((b, running))
        running += counts[b]
    off = F.broadcast(
        spark.createDataFrame(offsets, "__b int, __off long")
    )
    w_local = Window.partitionBy("__b").orderBy(*order_cols)
    rank = F.col("__off") + F.row_number().over(w_local)
    q, rem = divmod(total, n)
    cut = rem * (q + 1)
    tile = (
        F.when(rank <= cut, F.floor((rank - 1) / (q + 1)) + 1)
        # q == 0 only when total < n, where every rank <= cut = total;
        # max(q,1) keeps the dead branch free of a zero divisor
        .otherwise(rem + F.floor((rank - cut - 1) / max(q, 1)) + 1)
    )
    return (
        keyed.join(off, "__b")
        .withColumn(out_col, tile.cast("int"))
        .drop("__b", "__off")
    )


def ks_two_sample(
    df: DataFrame,
    value_col: str,
    flag_col: str,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic, distributed.

    ``flag_col`` is 1 for sample A rows, 0 for sample B. The statistic
    D = max_v |F_A(v) - F_B(v)| is evaluated over value grain: one
    groupBy collapses ties, the EDF prefix sums come from
    ``ordered_cumsum`` (no global window), and the max compares the
    EXACT integer numerator |cumA*nB - cumB*nA| — the division by
    nA*nB happens once on the final row, so no float comparison can
    order two candidate maxima differently across engines.

    Returns one row: (n_a, n_b, d_num, d_stat) with
    d_stat = d_num / (n_a*n_b) rounded to 6 digits.
    """
    per_v = df.groupBy(value_col).agg(
        F.sum(F.col(flag_col)).cast("long").alias("c_a"),
        F.sum(1 - F.col(flag_col)).cast("long").alias("c_b"),
    )
    cums = ordered_cumsum(per_v, value_col, ["c_a", "c_b"])
    n = per_v.agg(
        F.sum("c_a").cast("long").alias("n_a"),
        F.sum("c_b").cast("long").alias("n_b"),
    )
    num = F.abs(
        F.col("cum_c_a") * F.col("n_b") - F.col("cum_c_b") * F.col("n_a")
    )
    return (
        cums.join(F.broadcast(n))
        .agg(
            F.max("n_a").alias("n_a"),
            F.max("n_b").alias("n_b"),
            F.max(num).cast("long").alias("d_num"),
        )
        .select(
            "n_a",
            "n_b",
            "d_num",
            F.round(
                F.col("d_num") / (F.col("n_a") * F.col("n_b")), 6
            ).alias("d_stat"),
        )
    )
