"""Grouped-aggregate pandas UDF (UDAF surface — SURVEY.md §2.9).

The reference exposes no UDAF API; the new engine's custom-aggregate path
is the Arrow-batched GROUPED_AGG pandas UDF. Demonstrated with a numpy
linear-interpolation quantile whose DuckDB twin is quantile_cont — the
whole grouped Arrow transfer is value-checked, not just the arithmetic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import query
from .relational import t


def _quantile_udaf(q: float):
    # Defined lazily: pandas_udf registration needs an active session.
    # np.percentile(..., method='linear') == SQL quantile_cont.
    @F.pandas_udf("double")
    def agg(v: pd.Series) -> float:
        return float(np.percentile(v.to_numpy(), q))

    return agg


@query(
    "grouped_quantile_udaf",
    """
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def grouped_quantile_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # GROUPED_AGG pandas UDFs cannot mix with JVM aggregates in one agg;
    # this aggregation is all-pandas by design.
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(_quantile_udaf(50)("l_extendedprice"), 4).alias("median_price"),
        F.round(_quantile_udaf(90)("l_extendedprice"), 4).alias("p90_price"),
    )
