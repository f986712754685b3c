"""Declarative data-quality validation — constraint reports over a table.

A production pipeline gates every ingest/publish step on expectations
(the Deequ/Great-Expectations pattern): null rates, key uniqueness,
value ranges, accepted sets, referential integrity. The reference's
correctness culture is print-and-eyeball (SURVEY.md §5); this module is
the systematic replacement, built as ONE aggregation pass per table.

Scale design: every row-level constraint compiles to a conditional
aggregate (``sum(case when violated)``) in a single ``agg()`` — one scan,
map-side partial aggregation, a few bytes per constraint to the driver.
Referential integrity rides the SAME scan: each foreign key is a
broadcast left join against the distinct parent key with a presence
flag, and the orphan count is one more conditional aggregate (fallback
to a per-key anti-join for non-broadcastable parents). Uniqueness adds
one groupBy on the key — that shuffle is inherent. Nothing collects row
data; reports are constraint-per-row DataFrames with violation counts.
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


def validate(
    df: DataFrame, suite: Suite, broadcast_parents: bool | None = None
) -> DataFrame:
    """Run the suite; returns (constraint, violations, total, passed).

    Row-level checks AND foreign-key checks share ONE aggregation pass
    over ``df``: each foreign key becomes a presence-flag left join
    against the distinct parent key, and the orphan count is just
    another conditional aggregate — so N row checks + M foreign keys
    cost a single scan. Each uniqueness key still costs one groupBy
    (duplicate groups counted by their excess rows) — that shuffle is
    inherent to uniqueness.

    ``broadcast_parents``: None (default) keeps the fused single-scan
    shape but applies NO broadcast hint — Spark/AQE picks the join
    strategy from the parent's size estimate, so a dimension-sized
    parent broadcasts and a fact-sized one shuffles instead of OOMing
    the driver (ADVICE round 3; an unconditional hint overrode that
    safety). True forces the broadcast hint for parents Spark
    under-estimates; False falls back to one left-anti join per foreign
    key (no flag columns ride the scan at all).
    """
    spark = df.sparkSession
    reports: list[DataFrame] = []

    fused_fks: list[tuple[int, list[str]]] = []
    probe = df
    if broadcast_parents is not False:
        for i, (cols, parent, parent_cols) in enumerate(suite.foreign_keys):
            keys = parent.select(
                *[
                    F.col(p).alias(f"__fk{i}_{j}")
                    for j, p in enumerate(parent_cols)
                ]
            ).distinct().withColumn(f"__fk{i}", F.lit(1))
            if broadcast_parents:
                keys = F.broadcast(keys)
            cond = F.lit(True)
            for j, c in enumerate(cols):
                cond = cond & (F.col(c) == F.col(f"__fk{i}_{j}"))
            probe = probe.join(keys, cond, "left").drop(
                *[f"__fk{i}_{j}" for j in range(len(parent_cols))]
            )
            fused_fks.append((i, cols))

    if suite.checks or fused_fks:
        aggs = [F.count(F.lit(1)).alias("__total")] + [
            F.sum(F.when(c.violated, 1).otherwise(0)).alias(f"__v{i}")
            for i, c in enumerate(suite.checks)
        ] + [
            # null flag = no parent match = orphan (same semantics as the
            # left-anti fallback: a null child key counts as a violation)
            F.sum(F.when(F.col(f"__fk{i}").isNull(), 1).otherwise(0)).alias(
                f"__fkv{i}"
            )
            for i, _cols in fused_fks
        ]
        row = probe.agg(*aggs)
        stack_parts = []
        for i, c in enumerate(suite.checks):
            escaped = c.name.replace("'", "''")
            stack_parts.append(f"'{escaped}', bigint(__v{i})")
        fk_stack_parts = []
        for i, cols in fused_fks:
            fk_stack_parts.append(f"'references({','.join(cols)})', bigint(__fkv{i})")
        all_parts = stack_parts + fk_stack_parts
        stacked = row.select(
            F.expr(
                f"stack({len(all_parts)}, {', '.join(all_parts)}) "
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

    for cols, parent, parent_cols in (
        [] if broadcast_parents is not False else suite.foreign_keys
    ):
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
