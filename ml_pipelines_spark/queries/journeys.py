"""Event-sequence pattern queries — MATCH_RECOGNIZE shapes over the
events table (operators/journeys.py).

The signup→view→purchase funnel, two ways at once: ``n_matches`` counts
non-overlapping completed funnels with NO error inside a single run
(the regex ``s[^e]*?v[^e]*?p`` — lazy quantifiers, identical leftmost
semantics in Java regex and RE2); ``funnel_depth`` measures how far the
ordered steps progressed at least once (chained instr/substr, pure
arithmetic on both engines). The oracle rebuilds the same journey
strings with ``string_agg(... ORDER BY ts, event_id)`` and the same
regex/instr logic in DuckDB, so a mismatch in event ordering, code
mapping, match semantics, or the cap-free aggregation breaks the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import query
from .relational import t

_CODES = {
    "click": "c",
    "error": "e",
    "purchase": "p",
    "signup": "s",
    "view": "v",
}

_CODE_SQL = (
    "CASE event_type WHEN 'click' THEN 'c' WHEN 'error' THEN 'e' "
    "WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's' "
    "WHEN 'view' THEN 'v' ELSE '_' END"
)

_PATTERN = "s[^e]*?v[^e]*?p"


@query(
    "sequence_match_funnel",
    f"""
    WITH j AS (
        SELECT user_id,
               string_agg({_CODE_SQL}, '' ORDER BY ts, event_id)
                   AS journey
        FROM events GROUP BY user_id
    ), d AS (
        SELECT user_id, journey, instr(journey, 's') AS i1 FROM j
    ), d2 AS (
        SELECT *, CASE WHEN i1 > 0
                       THEN instr(substr(journey, i1 + 1), 'v')
                       ELSE 0 END AS r2
        FROM d
    ), d3 AS (
        SELECT *, CASE WHEN r2 > 0
                       THEN instr(substr(journey, i1 + r2 + 1), 'p')
                       ELSE 0 END AS r3
        FROM d2
    )
    SELECT user_id,
           CAST(length(journey) AS BIGINT) AS journey_len,
           CAST(len(regexp_extract_all(journey, '{_PATTERN}'))
                AS BIGINT) AS n_matches,
           CAST(CASE WHEN i1 > 0 THEN 1 ELSE 0 END
                + CASE WHEN r2 > 0 THEN 1 ELSE 0 END
                + CASE WHEN r3 > 0 THEN 1 ELSE 0 END
                AS BIGINT) AS funnel_depth
    FROM d3
    """,
)
def sequence_match_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.journeys import (
        event_code,
        funnel_depth,
        journey_strings,
        match_count,
    )

    ev = t(spark, sf_dir, "events")
    j = journey_strings(
        ev, "user_id", ["ts", "event_id"], event_code("event_type", _CODES)
    )
    return j.select(
        "user_id",
        F.length("journey").cast("long").alias("journey_len"),
        match_count("journey", _PATTERN).cast("long").alias("n_matches"),
        funnel_depth("journey", "svp").cast("long").alias("funnel_depth"),
    )
