"""Distributed dense id assignment (SURVEY.md §2.4 A7).

The reference assigns dense 0-based ids by driver-side iteration order
(create_coco_from_feather.py:75-84, 98-106). The naive Spark translation —
``row_number()`` over a global ``Window.orderBy(...)`` — funnels every row
through a single task: correct at 60k rows, a hard wall at 100 TB.

``dense_ids`` keeps the same contract (dense, deterministic, ordered by the
given columns) with no single-task pass over the data:

1. A one-off driver job samples ~20·P key tuples (uniform via rand +
   distributed TakeOrdered — never a full sort) and picks P-1 cut points,
   embedded in the plan as struct literals.
2. Each row's bucket = count of cut points ≤ its key (lexicographic struct
   comparison). The bucket is a pure function of row DATA — not of
   ``spark_partition_id()`` / ``monotonically_increasing_id`` — so every
   branch and every recomputation agrees on it. (A partition-index scheme
   was tried first and silently corrupted ids whenever the counts branch
   and the main branch didn't share one exchange — column pruning makes
   the two exchanges non-canonical, each re-samples its own range
   boundaries via RangePartitioner, and the offsets no longer describe the
   main branch's partitions. Data-derived buckets are immune by
   construction.)
3. ``row_number()`` over ``Window.partitionBy(bucket)`` ranks within
   buckets (one hash shuffle, P-way parallel). Per-bucket counts are
   derived from the SAME window pass — ``max(rn)`` over the bucket
   partition, then ``rn == cnt`` keeps exactly one row per bucket — so
   the counts branch shares the sort-exchange with the main branch
   (ReusedExchange; the upstream plan executes once, not twice).
   Counts become cumulative offsets (window over P rows — bytes, not
   data), broadcast-joined back: id = offset + local rank.

Ids depend only on the total order, not on where the cut points land
(sampling quality affects balance, never correctness). Rows with fully
identical sort keys may swap ids across runs — such rows are
indistinguishable, so the assignment is deterministic up to row identity.
Order columns must be non-null (struct comparison with nulls is null).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_SAMPLES_PER_BUCKET = 20


def dense_ids_small(
    df: DataFrame,
    order_cols: list[str],
    id_col: str = "id",
    start: int = 0,
) -> DataFrame:
    """Dense ids via one single-partition window — for dimension-sized
    inputs that are about to be broadcast anyway.

    If the result fits in a broadcast, one window task over it is
    strictly cheaper than the distributed assignment: no sample job, no
    counts branch, no offsets join — two stages total. The broadcast
    itself is the binding constraint; whenever it would fit, this path
    is safe. Use ``dense_ids`` for fact-sized inputs.
    """
    w = Window.orderBy(*order_cols)
    return df.withColumn(
        id_col, (F.row_number().over(w) + F.lit(start - 1)).cast("int")
    )


def _cut_points(
    df: DataFrame, order_cols: list[str], parts: int
) -> list:
    """~P-1 boundary tuples from a uniform sample (one small driver job)."""
    sample = (
        df.select(F.struct(*order_cols).alias("__k"), F.rand(42).alias("__r"))
        .orderBy("__r")
        .limit(parts * _SAMPLES_PER_BUCKET)
        .select("__k")
        .collect()
    )
    keys = sorted(tuple(r["__k"]) for r in sample)
    if not keys:
        return []
    step = max(1, len(keys) // parts)
    bounds = []
    for i in range(step, len(keys), step):
        if not bounds or keys[i] != bounds[-1]:
            bounds.append(keys[i])
    return bounds[: parts - 1]


def _bucket_expr(order_cols: list[str], bounds: list):
    """Bucket index = number of cut points <= the row's key, evaluated
    as a BALANCED ``when`` tree — a per-row binary search over the bound
    literals. The naive linear fold (sum of P-1 struct comparisons per
    row) is O(P) per row and was the dominant cost of the whole id
    assignment at P=32 already; the tree is O(log P) comparisons, so
    cranking shuffle partitions to cluster scale doesn't move per-row
    cost. Monotone and a pure function of row data, preserving the
    branch-agreement property the module docstring relies on."""
    key = F.struct(*order_cols)

    def lit_bound(b):
        return F.struct(*[F.lit(v).alias(c) for v, c in zip(b, order_cols)])

    def tree(lo: int, hi: int):
        # number of bounds[0:] <= key, restricted to slice [lo, hi)
        if lo >= hi:
            return F.lit(lo)
        mid = (lo + hi) // 2
        return (
            F.when(key >= lit_bound(bounds[mid]), tree(mid + 1, hi))
            .otherwise(tree(lo, mid))
        )

    return tree(0, len(bounds))


def dense_ids(
    df: DataFrame,
    order_cols: list[str],
    id_col: str = "id",
    start: int = 0,
    num_partitions: int | None = None,
    sample_from: DataFrame | None = None,
    counts_from: DataFrame | None = None,
) -> DataFrame:
    """Add ``id_col`` with dense ids ``start, start+1, ...`` in
    ``order_cols`` order, without a single-task pass over the data.

    ``sample_from``: optional cheaper stand-in for the cut-point sample
    job (e.g. the pre-join input when every order column comes from one
    side — the sample then scans 4 columns instead of re-executing the
    join subtree). Correctness never depends on where the cut points
    come from, only balance does; any DataFrame containing ``order_cols``
    with roughly the final key distribution works.

    ``counts_from``: optional cheaper source for the bucket-count
    aggregation. UNLIKE ``sample_from`` this one is load-bearing: it
    must contain exactly the same multiset of ``order_cols`` tuples as
    ``df`` (e.g. the pre-join input when the join provably drops no
    rows), or ids will be wrong. The payoff is that the counts branch
    scans the narrow source instead of re-executing ``df``'s whole
    subtree (joins included) a second time.
    """
    spark = df.sparkSession
    parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    bounds = _cut_points(sample_from if sample_from is not None else df,
                         order_cols, parts)
    bucket = _bucket_expr(order_cols, bounds)
    keyed = df.withColumn("__bkt", bucket)

    # Bucket offsets come from a COUNT aggregation over the bucketed
    # input, not from the ranked output: counting is a map-side partial
    # agg that shuffles <= num-buckets rows, while deriving counts from
    # the window (the previous shape) re-executed the entire scan + sort
    # + window subtree a second time (no ReusedExchange — the filter
    # made the subtrees differ). One full window pass instead of two.
    # The cumulative-sum window below runs over <= `parts` rows — a
    # bounded dictionary, never data.
    counts_src = (
        counts_from.select(*order_cols).withColumn("__bkt", bucket)
        if counts_from is not None
        else keyed
    )
    offsets = (
        counts_src.groupBy("__bkt")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .select(
            "__bkt",
            (
                F.sum("__cnt").over(Window.orderBy("__bkt"))
                - F.col("__cnt")
                + F.lit(start - 1)
            ).alias("__off"),
        )
    )

    local = Window.partitionBy("__bkt").orderBy(*order_cols)
    ranked = keyed.withColumn("__rn", F.row_number().over(local))
    return (
        ranked.join(F.broadcast(offsets), "__bkt")
        .withColumn(id_col, (F.col("__off") + F.col("__rn")).cast("int"))
        .drop("__bkt", "__rn", "__off")
    )
