"""Time-series join queries — as-of and point-in-interval range joins
over the events table.

The as-of oracle is DuckDB's *native* ASOF JOIN, so the window-union
construction in operators.asof is checked against an independent
first-class implementation of the semantics. The range-join oracle is a
plain inequality join — DuckDB plans it as its own (IE-join) range
join — checking the bin-bucketed equi-join rewrite against an
independent execution strategy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..operators.rangejoin import range_join
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


@query(
    "range_join_events",
    """
    WITH iv AS (
        SELECT event_id AS interval_id, user_id,
               ts AS start_ts, ts + INTERVAL 1 DAY AS end_ts
        FROM events WHERE event_type = 'purchase'
    )
    SELECT iv.interval_id,
           COUNT(*) AS n_points,
           ROUND(SUM(p.value), 4) AS sum_value
    FROM iv JOIN events p
      ON p.user_id = iv.user_id
     AND p.ts >= iv.start_ts AND p.ts < iv.end_ts
     AND p.event_type = 'click'
    GROUP BY iv.interval_id
    """,
)
def range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clicks inside the 24 h window after each purchase by the same
    user — bin-bucketed point-in-interval join (operators.rangejoin),
    aggregated per interval. Bin width = the interval length, so each
    interval fans out to at most 2 bin rows."""
    ev = t(spark, sf_dir, "events")
    iv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("interval_id"),
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 1 DAY")).alias("end_ts"),
    )
    pts = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    pairs = range_join(
        pts, iv,
        key_cols=["user_id"], point_col="ts",
        start_col="start_ts", end_col="end_ts",
        bin_width=86400, closed="left",
    )
    return pairs.groupBy("interval_id").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# Numeric band join (operators.rangejoin.band_join): supplier/customer
# account balances within ±1.0 — the |a-b|<=δ reconciliation shape.
# The oracle states the predicate directly (DuckDB's IE-join handles
# it); the Spark side uses the bin rewrite, so the hash-compare proves
# the bucketing loses no pair and admits no extra (bin edges, the
# classic off-by-one surface, are value-checked).
# ---------------------------------------------------------------------------
_BAND_DELTA = 1.0


@query(
    "band_join_balances",
    f"""
    SELECT s.s_suppkey, c.c_custkey,
           ROUND(s.s_acctbal - c.c_acctbal, 2) AS diff
    FROM supplier s JOIN customer c
      ON abs(s.s_acctbal - c.c_acctbal) <= {_BAND_DELTA}
    """,
)
def band_join_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rangejoin import band_join

    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    return band_join(
        supp, cust, "s_acctbal", "c_acctbal", delta=_BAND_DELTA
    ).select(
        "s_suppkey",
        "c_custkey",
        F.round(F.col("s_acctbal") - F.col("c_acctbal"), 2).alias("diff"),
    )
