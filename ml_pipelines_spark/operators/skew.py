"""Salted join — the explicit remedy for shuffle-join key skew.

AQE's skew-join handling splits oversized *partitions*, which covers
most cases; it cannot help when a single join KEY is so hot that one
task must still process every row of that key (AQE splits partitions at
shuffle-block granularity, and a sort-merge join needs all rows of a
key together). Salting rewrites the join itself:

- the skewed (big) side gets a salt in [0, factor) derived by HASHING
  the row's other columns — deterministic, no RNG, so retries and
  recomputations agree (``rand()``-based salting breaks exactly-once
  semantics under task retry);
- the small side is exploded ``factor``-fold, one copy per salt value;
- the equi-join runs on (key, salt): the hot key now spreads over
  ``factor`` tasks.

Cost: the small side shuffles ``factor`` copies — worth it only when
the big side's skew dominates; at 100 TB pick ``factor`` near the ratio
hot-key-rows / median-key-rows, capped by the cluster's task count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    factor: int,
    how: str = "inner",
) -> DataFrame:
    """Join ``big`` ⋈ ``small`` on the ``on`` keys with ``factor``-way
    salt spreading of the big side.

    ``how`` may be "inner" or "left" (left = keep unmatched big rows —
    the usual enrichment shape). Result equals the unsalted join
    row-for-row; only the physical distribution changes.
    """
    if factor < 1:
        raise ValueError("factor must be >= 1")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner/left, got {how!r}")
    other = [c for c in big.columns if c not in on]
    # xxhash64 of the non-key columns: deterministic per row, uniform.
    # pmod keeps the salt non-negative.
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in other]), F.lit(factor))
    b = big.withColumn("__salt", salt.cast("int"))
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(factor - 1)))
    )
    return b.join(s, [*on, "__salt"], how).drop("__salt")
