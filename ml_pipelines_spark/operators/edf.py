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
    Single-spec convenience over ``ordered_ntiles``."""
    return ordered_ntiles(
        df, [(order_cols, out_col)], n, num_partitions=num_partitions
    )


def ordered_ntiles(
    df: DataFrame,
    specs: list[tuple[list[str], str]],
    n: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact ``NTILE(n)`` under SEVERAL orderings of the same frame —
    e.g. RFM's three metric quintiles — with NO unpartitioned window,
    NO data-sized funnel, and a FIXED number of probe jobs regardless
    of how many orderings are scored (VERDICT r10 item 2).

    ``NTILE`` is pure rank arithmetic: with N rows, q = N div n,
    rem = N mod n, the first ``rem`` buckets hold q+1 rows —
    bucket(r) = ceil(r/(q+1)) for r <= rem*(q+1), else
    rem + ceil((r - rem*(q+1))/q). So the only distributed work is the
    global rank per ordering, computed with the dense-ids range-bucket
    machinery (operators/ids.py): sampled cut points -> per-bucket
    partitioned row_number (P-way parallel). Two probe jobs total:

    1. ONE uniform sample (distributed TakeOrdered over rand, never a
       sort) covering every spec's columns; each spec's cut points are
       derived from the same sample rows driver-side.
    2. ONE bucket-count aggregation: each row explodes to
       (spec_index, bucket) pairs, a single groupBy counts all specs'
       histograms together; the <=specs*P counts are cumulated on the
       DRIVER (bytes) and re-enter the plan as a balanced WHEN-TREE
       literal over the bucket id (O(log P) per row, the same shape as
       ids._bucket_expr) — no join, no broadcast, and zero
       unpartitioned Window nodes, so the plan linter passes with no
       global-window waiver at all.

    Each spec's ``order_cols`` must be a total order (add a unique
    tiebreaker) of non-null columns, matching NTILE's determinism.
    """
    spark = df.sparkSession
    parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    all_cols = sorted({c for cols, _ in specs for c in cols})
    sample = (
        df.select(
            F.struct(*all_cols).alias("__k"), F.rand(42).alias("__r")
        )
        .orderBy("__r")
        .limit(parts * 20)
        .select("__k")
        .collect()
    )
    bounds_per_spec = []
    for cols, _out in specs:
        keys = sorted(tuple(r["__k"][c] for c in cols) for r in sample)
        step = max(1, len(keys) // parts) if keys else 1
        bounds = []
        for i in range(step, len(keys), step):
            if not bounds or keys[i] != bounds[-1]:
                bounds.append(keys[i])
        bounds_per_spec.append(bounds[: parts - 1])
    bucket_exprs = [
        _bucket_expr(cols, bounds)
        for (cols, _out), bounds in zip(specs, bounds_per_spec)
    ]
    # one counts pass for every spec: explode to (spec, bucket) pairs
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("s"), b.cast("int").alias("b")
                    )
                    for i, b in enumerate(bucket_exprs)
                ]
            )
        ).alias("p")
    ).select("p.s", "p.b")
    counts: list[dict[int, int]] = [dict() for _ in specs]
    for r in (
        pairs.groupBy("s", "b").agg(F.count(F.lit(1)).alias("c")).collect()
    ):
        counts[r["s"]][r["b"]] = r["c"]
    def _offset_tree(offsets: list[tuple[int, int]], lo: int, hi: int):
        # balanced lookup bucket -> cumulative offset: O(log P)/row,
        # a pure literal expression (no join, no broadcast build)
        if hi - lo == 1:
            return F.lit(offsets[lo][1])
        mid = (lo + hi) // 2
        return F.when(
            F.col("__nb") >= F.lit(offsets[mid][0]),
            _offset_tree(offsets, mid, hi),
        ).otherwise(_offset_tree(offsets, lo, mid))

    out = df
    for i, ((cols, out_col), bucket) in enumerate(zip(specs, bucket_exprs)):
        total = sum(counts[i].values())
        if total == 0:
            out = out.withColumn(out_col, F.lit(None).cast("int"))
            continue
        running, offsets = 0, []
        for b in sorted(counts[i]):
            offsets.append((b, running))
            running += counts[i][b]
        keyed = out.withColumn("__nb", bucket.cast("int"))
        w_local = Window.partitionBy("__nb").orderBy(*cols)
        rank = _offset_tree(offsets, 0, len(offsets)) + F.row_number().over(
            w_local
        )
        q, rem = divmod(total, n)
        cut = rem * (q + 1)
        tile = (
            F.when(rank <= cut, F.floor((rank - 1) / (q + 1)) + 1)
            # q == 0 only when total < n, where every rank <= cut;
            # max(q,1) keeps the dead branch free of a zero divisor
            .otherwise(rem + F.floor((rank - cut - 1) / max(q, 1)) + 1)
        )
        out = keyed.withColumn(out_col, tile.cast("int")).drop("__nb")
    return out


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
