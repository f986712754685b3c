"""As-of join query — each event picks up the user's latest order at or
before the event timestamp. The oracle is DuckDB's *native* ASOF JOIN,
so the window-union construction in operators.asof is checked against an
independent first-class implementation of the semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from .registry import query
from .relational import t


@query(
    "asof_join_events",
    """
    WITH ro AS (
        SELECT o_custkey AS user_id, o_orderdate AS ots,
               MAX(o_orderkey) AS last_orderkey
        FROM orders GROUP BY 1, 2
    )
    SELECT e.event_id, e.user_id, r.last_orderkey
    FROM events e
    ASOF LEFT JOIN ro r ON e.user_id = r.user_id AND r.ots <= e.ts
    """,
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    # dedupe the right side to one row per (user, ts) so the as-of match
    # is well-defined in both engines
    ro = (
        t(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").alias("ts"),
        )
        .agg(F.max("o_orderkey").alias("last_orderkey"))
    )
    out = asof_join(
        ev, ro, key_cols=["user_id"], ts_col="ts",
        right_payload=["last_orderkey"],
    )
    return out.select("event_id", "user_id", "last_orderkey")
