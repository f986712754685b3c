"""Column-profiling queries.

The profile query uses exact distinct counts so DuckDB can reproduce
the report value-for-value (the operator's default HLL sketch is the
scale path but is engine-specific by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.profile import profile_columns, top_values
from .registry import query
from .relational import t

_PROFILE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]

_BRANCHES = []
for _c in _PROFILE_COLS:
    _numeric = _c != "o_orderstatus"
    _mean = f"(SELECT round(AVG({_c}), 4) FROM orders)" if _numeric else "CAST(NULL AS DOUBLE)"
    _BRANCHES.append(
        f"""
        SELECT '{_c}' AS "column", total,
               (SELECT COUNT(*) FROM orders WHERE {_c} IS NULL) AS nulls,
               (SELECT COUNT(DISTINCT {_c}) FROM orders) AS approx_distinct,
               (SELECT CAST(MIN({_c}) AS VARCHAR) FROM orders) AS min,
               (SELECT CAST(MAX({_c}) AS VARCHAR) FROM orders) AS max,
               {_mean} AS mean
        FROM tot"""
    )


@query(
    "profile_orders",
    "WITH tot AS (SELECT COUNT(*) AS total FROM orders)"
    + " UNION ALL ".join(_BRANCHES),
)
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    rep = profile_columns(orders, _PROFILE_COLS, exact_distinct=True)
    return rep.withColumn("mean", F.round("mean", 4))


@query(
    "top_sources",
    """
    SELECT CAST(source AS VARCHAR) AS value, COUNT(*) AS n
    FROM documents
    GROUP BY source
    ORDER BY n DESC, value ASC
    LIMIT 5
    """,
)
def top_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return top_values(docs, "source", k=5)
