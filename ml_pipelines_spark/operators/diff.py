"""Keyed snapshot diff — what changed between two versions of a table.

Incremental pipelines audit every refresh: which rows appeared,
disappeared, or changed, and in which columns. One full-outer join on
the key; change detection is a null-safe column comparison (``<=>``) so
NULL→value and value→NULL count as changes while NULL==NULL does not.

Scale: the join shuffles both snapshots on the key once. With bucketed
snapshots (io.write_partitioned + bucketing) the exchange disappears;
`changed_cols` is a row-local array expression, no second pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Diff two snapshots by ``keys``.

    Returns key columns + ``status`` ('added' | 'removed' | 'changed'
    | 'unchanged') + ``changed_cols`` (sorted array of differing column
    names; empty unless status='changed'). ``compare_cols`` defaults to
    all shared non-key columns.
    """
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(keys)]

    o = old.select(
        *[F.col(k).alias(f"__k_{k}") for k in keys],
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__k_{k}") for k in keys],
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
        F.lit(True).alias("__in_new"),
    )
    j = o.join(n, [f"__k_{k}" for k in keys], "full_outer")

    diffs = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(
                        ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")),
                        F.lit(c),
                    )
                    for c in compare_cols
                ]
            ),
            lambda x: x.isNotNull(),
        )
    ) if compare_cols else F.array().cast("array<string>")

    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(F.size(diffs) > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(
        *[F.col(f"__k_{k}").alias(k) for k in keys],
        status.alias("status"),
        F.when(status == "changed", diffs)
        .otherwise(F.array().cast("array<string>"))
        .alias("changed_cols"),
    )
    if not include_unchanged:
        out = out.filter(F.col("status") != "unchanged")
    return out
