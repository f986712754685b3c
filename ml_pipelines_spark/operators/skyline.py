"""2-D Pareto frontier (skyline) — the "best tradeoff" query: keep every
row not dominated by another (dominated = some other row is >= on both
criteria and > on at least one). Curation uses it to pick documents that
are simultaneously long AND high-quality without committing to a single
weighting of the two.

Scale shape: the naive construction is the oracle's NOT EXISTS — a
quadratic self-join. The distributed construction here is TWO-PHASE,
exploiting that the frontier operator is idempotent and union-compatible
(frontier(A ∪ B) = frontier(frontier(A) ∪ frontier(B)) — any globally
dominated point is dominated by a chain ending at a partition survivor):

  1. per-partition frontier via mapInPandas (numpy sort, O(n log n) per
     partition, no shuffle);
  2. the surviving candidates — typically O(sqrt n) of a partition for
     anti-correlated criteria — are coalesced into one task for the
     final frontier pass.

Phase 2 is single-task over CANDIDATES only (like the global top-k
window in ranked_topk, it sees per-partition survivors, not data). For a
pathological input where the frontier IS the dataset (perfectly
anti-correlated unique points) phase 1 prunes nothing; that input makes
every skyline algorithm output O(n) and is not the curation case.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _frontier_pdf(pdf: pd.DataFrame, x: str, y: str) -> pd.DataFrame:
    """Exact 2-D maximal points of one pandas batch.

    Sort by (x desc, y desc); walk x-groups in descending order keeping
    rows that tie the group's max y AND strictly beat the best y seen at
    any larger x — duplicates of a frontier point are kept (neither
    strictly dominates the other), matching the NOT EXISTS semantics.
    """
    if pdf.empty:
        return pdf
    s = pdf.sort_values([x, y], ascending=[False, False], kind="mergesort")
    keep_idx = []
    best_y = float("-inf")
    for _, grp in s.groupby(x, sort=False):
        gy = grp[y].iloc[0]  # group max (sorted desc)
        if gy > best_y:
            keep_idx.extend(grp.index[grp[y] == gy].tolist())
            best_y = gy
    return pdf.loc[sorted(keep_idx)]


def pareto_front_2d(df: DataFrame, x: str, y: str) -> DataFrame:
    """Rows of ``df`` on the maximize-(x, y) Pareto frontier."""
    schema = df.schema

    def local(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = _frontier_pdf(pdf, x, y)
            if not out.empty:
                yield out

    def final(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pdfs = [p for p in batches if not p.empty]
        if pdfs:
            allc = pd.concat(pdfs).reset_index(drop=True)
            yield _frontier_pdf(allc, x, y)

    candidates = df.mapInPandas(local, schema=schema)
    # Final pass over per-partition survivors only. coalesce(1), not
    # repartition(1): no shuffle — candidate partitions stream into one
    # task.
    return candidates.coalesce(1).mapInPandas(final, schema=schema)
