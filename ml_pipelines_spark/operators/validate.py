"""Declarative data-quality validation — constraint reports over a table.

A production pipeline gates every ingest/publish step on expectations
(the Deequ/Great-Expectations pattern): null rates, key uniqueness,
value ranges, accepted sets, referential integrity. The reference's
correctness culture is print-and-eyeball (SURVEY.md §5); this module is
the systematic replacement, built as ONE aggregation pass per table.

Scale design: every row-level constraint compiles to a conditional
aggregate (``sum(case when violated)``) in a single ``agg()`` — one scan,
map-side partial aggregation, a few bytes per constraint to the driver.
Uniqueness adds one groupBy on the key; referential integrity adds one
anti-join per foreign key. Nothing collects row data; reports are
constraint-per-row DataFrames with violation counts.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Check:
    """One named constraint: ``violated`` is a boolean Column that is
    true for rows breaking the rule."""

    name: str
    violated: Column


def not_null(col: str) -> Check:
    return Check(f"not_null({col})", F.col(col).isNull())


def in_range(col: str, lo, hi) -> Check:
    c = F.col(col)
    return Check(
        f"in_range({col},{lo},{hi})", c.isNull() | (c < lo) | (c > hi)
    )


def accepted_values(col: str, values: list) -> Check:
    c = F.col(col)
    return Check(
        f"accepted_values({col})", c.isNull() | ~c.isin(values)
    )


def matches(col: str, pattern: str) -> Check:
    c = F.col(col)
    return Check(f"matches({col})", c.isNull() | ~c.rlike(pattern))


def satisfies(name: str, predicate: Column) -> Check:
    """Arbitrary row predicate that must hold (violated = NOT predicate)."""
    return Check(name, ~predicate)


@dataclass
class Suite:
    """A validation suite over one table."""

    checks: list[Check] = field(default_factory=list)
    unique_keys: list[list[str]] = field(default_factory=list)
    foreign_keys: list[tuple[list[str], DataFrame, list[str]]] = field(
        default_factory=list
    )

    def add(self, check: Check) -> "Suite":
        self.checks.append(check)
        return self

    def unique(self, *cols: str) -> "Suite":
        self.unique_keys.append(list(cols))
        return self

    def references(
        self, cols: list[str], parent: DataFrame, parent_cols: list[str]
    ) -> "Suite":
        self.foreign_keys.append((cols, parent, parent_cols))
        return self


_REPORT_COLS = ["constraint", "violations", "total", "passed"]


def validate(df: DataFrame, suite: Suite) -> DataFrame:
    """Run the suite; returns (constraint, violations, total, passed).

    Row-level checks share one aggregation pass over ``df``. Each
    uniqueness key costs one groupBy (duplicate groups counted by their
    excess rows); each foreign key costs one left-anti join against the
    distinct parent key (broadcast when the parent is dimension-sized).
    """
    spark = df.sparkSession
    reports: list[DataFrame] = []

    if suite.checks:
        aggs = [F.count(F.lit(1)).alias("__total")] + [
            F.sum(F.when(c.violated, 1).otherwise(0)).alias(f"__v{i}")
            for i, c in enumerate(suite.checks)
        ]
        row = df.agg(*aggs)
        stack_parts = []
        for i, c in enumerate(suite.checks):
            escaped = c.name.replace("'", "''")
            stack_parts.append(f"'{escaped}', bigint(__v{i})")
        stacked = row.select(
            F.expr(
                f"stack({len(suite.checks)}, {', '.join(stack_parts)}) "
                "as (constraint, violations)"
            ),
            F.col("__total").cast("long").alias("total"),
        )
        reports.append(
            stacked.select(
                "constraint",
                "violations",
                "total",
                (F.col("violations") == 0).alias("passed"),
            )
        )

    for keys in suite.unique_keys:
        dup = (
            df.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("__n"))
            .agg(
                F.coalesce(
                    F.sum(F.when(F.col("__n") > 1, F.col("__n") - 1)), F.lit(0)
                ).alias("violations"),
                F.coalesce(F.sum("__n"), F.lit(0)).alias("total"),
            )
        )
        reports.append(
            dup.select(
                F.lit(f"unique({','.join(keys)})").alias("constraint"),
                F.col("violations").cast("long"),
                F.col("total").cast("long"),
                (F.col("violations") == 0).alias("passed"),
            )
        )

    for cols, parent, parent_cols in suite.foreign_keys:
        child = df.select(
            *[F.col(c).alias(p) for c, p in zip(cols, parent_cols)]
        )
        orphans = child.join(
            parent.select(*parent_cols).distinct(), parent_cols, "left_anti"
        )
        rep = orphans.agg(F.count(F.lit(1)).alias("violations")).crossJoin(
            df.agg(F.count(F.lit(1)).alias("total"))
        )
        reports.append(
            rep.select(
                F.lit(f"references({','.join(cols)})").alias("constraint"),
                F.col("violations").cast("long"),
                F.col("total").cast("long"),
                (F.col("violations") == 0).alias("passed"),
            )
        )

    if not reports:
        return spark.createDataFrame([], "constraint string, violations long, total long, passed boolean")
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out
