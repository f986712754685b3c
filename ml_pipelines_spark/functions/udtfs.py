"""User-defined table functions (Spark 4 ``@udtf``) — the generator
surface of the UDF family (SURVEY.md §2.9).

These complete the pluggable-UDF API demonstration: scalar pandas UDFs
(geometry kernel), GROUPED_AGG UDAF (quantiles), grouped-map
(tracks), mapInPandas (images/audio/CVAT) — and here SQL-callable
table functions usable with LATERAL joins.

UDTFs evaluate row-at-a-time in Python: right for ergonomics (SQL
surface, arbitrary fan-out per row), wrong for hot paths — the
expression twins (functions.text.word_shingles) stay the 100 TB path,
and the test suite pins the two implementations to identical output.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="idx: int, shingle: string")
class WordShinglesUDTF:
    """LATERAL-joinable word-shingle generator: one row per k-shingle of
    the whitespace-tokenized, lowercased, trimmed text — the same
    normalization as functions.text.word_shingles.

    SQL: ``SELECT d.doc_id, s.* FROM docs d,
    LATERAL word_shingles_udtf(d.text, 3) s``.
    """

    def eval(self, text: str, k: int):
        if text is None or k is None or k <= 0:
            return
        toks = text.strip().lower().split()
        for i in range(max(0, len(toks) - k + 1)):
            yield i, " ".join(toks[i : i + k])


def register_udtfs(spark) -> None:
    """Register all engine UDTFs for SQL use."""
    spark.udtf.register("word_shingles_udtf", WordShinglesUDTF)
