"""Exact frequent-item (heavy hitter) detection in two bounded passes.

The naive plan — ``groupBy(col).count()`` then filter — shuffles one
record per DISTINCT value. On a 100 TB column with billions of
distincts (user ids, URLs, shingles) that shuffle IS the job, yet the
answer only concerns the handful of values above the threshold. The
classic streaming answer (Misra-Gries / SpaceSaving) keeps ``k``
counters for a one-pass φ-approximation; Spark gives us something
better for the batch setting: a candidate pass with Misra-Gries-style
bounded state per Arrow batch, then an EXACT second pass over only the
candidate-matching rows.

Guarantee (the averaging argument): with ``k = ceil(1/φ)`` counters, a
value v with global count C(v) > φ·N ≥ N/k must satisfy
C_b(v) > n_b/k in at least one batch b (if it fell at or below that
share in every batch, summing over batches bounds C(v) ≤ N/k). The
candidate filter keeps exactly the values with batch count > n_b/k —
fewer than k of them can exist per batch, so per-batch state is
bounded by k regardless of batch cardinality — hence every true heavy
hitter survives to the candidate set. False candidates merely cost the
exact pass a few extra counters; they are filtered by the final exact
threshold, so the RESULT is exact, not approximate.

Cost shape at scale: pass 1 is a shuffle-free scan emitting ≤ k rows
per batch; pass 2 scans again but shuffles ONLY rows matching the
(broadcast) candidate set — O(hitters' rows), not O(distinct values).

No counterpart in the reference (its profiling is pandas
``value_counts`` in one process — ``MLPipelines/TrainDatasets.py``
scale: whole table in memory); this is the distributed re-expression.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def heavy_hitter_candidates(
    df: DataFrame, col: str, phi: float
) -> DataFrame:
    """Pass 1: a superset of all values with global share > ``phi``,
    from bounded per-batch state (< ceil(1/phi) survivors per Arrow
    batch), no shuffle. NULL is a value (``value_counts(dropna=False)``
    — ADVICE r10): a null whose share exceeds phi survives like any
    other candidate, matching ``groupBy().count()`` semantics."""
    if not 0 < phi < 1:
        raise ValueError(f"phi must be in (0,1), got {phi}")
    k = math.ceil(1.0 / phi)
    out_schema = StructType([df.schema[col]])

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            n_b = len(pdf)
            if not n_b:
                continue
            vc = pdf[col].value_counts(dropna=False)
            keep = vc[vc * k > n_b]
            if len(keep):
                yield pd.DataFrame({col: keep.index})

    return df.select(col).mapInPandas(gen, schema=out_schema)


def exact_heavy_hitters(
    df: DataFrame, col: str, phi: float
) -> DataFrame:
    """All values of ``col`` with frequency strictly above
    ``phi * count(df)``, with their EXACT counts — two scans of ``df``
    total (ADVICE r10: the global row count rides pass 1 as per-batch
    marker rows instead of a third ``df.count()`` scan), zero wide
    shuffle. NULL-safe end to end: candidates keep nulls
    (``dropna=False``) and the probe join matches on ``<=>``, so a
    null heavy hitter is reported exactly like ``groupBy().count()``
    would. Returns columns ``(col, cnt)``."""
    if not 0 < phi < 1:
        raise ValueError(f"phi must be in (0,1), got {phi}")
    if col == "__n":
        raise ValueError("column name __n is reserved by the marker rows")
    k = math.ceil(1.0 / phi)
    field = df.schema[col]
    out_schema = StructType(
        [
            # nullable COPY: the per-batch marker rows carry NULL in
            # this field, and declaring it non-null (e.g. a column
            # derived from spark.range) would let codegen elide null
            # checks over the pass-1 frame — undefined behavior
            StructField(field.name, field.dataType, True),
            StructField("__n", LongType(), True),
        ]
    )

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            n_b = len(pdf)
            if not n_b:
                continue
            vc = pdf[col].value_counts(dropna=False)
            keep = vc[vc * k > n_b]
            out = pd.DataFrame({col: keep.index, "__n": None})
            marker = pd.DataFrame({col: [None], "__n": [n_b]})
            yield pd.concat([out, marker], ignore_index=True)

    # pass-1 output is bounded (<= k candidates + 1 marker per batch) —
    # cache it so the total and the candidate set are two jobs over a
    # few kilobytes, not two more scans of df. The registry swap_cache
    # slot (keyed on the input's semantic hash) bounds the storage to
    # ONE live entry per call shape — the old localCheckpoint here
    # leaked block-manager blocks on every invocation (ADVICE r11).
    from ..queries.registry import swap_cache

    try:
        token = f"{df.semanticHash()}:{col}:{phi}"
    except Exception:  # pragma: no cover — semanticHash always present
        token = f"{id(df)}:{col}:{phi}"
    pass1 = swap_cache(
        "exact_heavy_hitters.pass1",
        token,
        df.select(col).mapInPandas(gen, schema=out_schema),
    )
    total = pass1.agg(F.sum("__n")).collect()[0][0] or 0
    cand = (
        pass1.filter(F.col("__n").isNull())
        .select(F.col(col).alias("__cand"))
        .distinct()
    )
    return (
        df.join(
            F.broadcast(cand),
            F.col(col).eqNullSafe(F.col("__cand")),
            "left_semi",
        )
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > phi * total)
    )
