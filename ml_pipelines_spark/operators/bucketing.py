"""Bucketed tables — co-located joins with NO shuffle at read time.

The one join strategy the manifest layer doesn't cover: when two fact
tables are joined on the same key over and over (orders ⋈ lineitem,
events ⋈ sessions), hash-bucketing BOTH sides into the same number of
buckets at WRITE time pins matching keys to matching files, so every
subsequent sort-merge join elides its Exchange entirely — the shuffle
is paid once at ingest, then amortized over every downstream query. At
100 TB that is the difference between re-shuffling 6 TB of lineitem per
query and reading co-located buckets.

This is Spark's native ``bucketBy`` (Hive-compatible hash bucketing via
``saveAsTable``): bucket metadata lives in the session catalog, the
scan reports one input partition per bucket, and the planner proves
both sides share the partitioning, dropping both Exchanges (and with
``sortBy`` both Sorts' costs shrink to per-bucket merges).

The physical claim — a bucketed equi-join plans WITHOUT a shuffle on
either side — is asserted in tests/test_bucketing.py by counting
Exchange operators in the executed plan.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    name: str,
    key: str,
    n_buckets: int,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a parquet table hash-bucketed (and per-bucket
    sorted) on ``key``. Overwrites an existing table of the same name.
    Bucket metadata lives in the session catalog; joins between tables
    bucketed on the same key with the same ``n_buckets`` plan with no
    Exchange on either side."""
    writer = (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(n_buckets, key)
    )
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(name)


def session_table_name(spark: SparkSession, base: str, scope: str) -> str:
    """A catalog-safe table name unique to (session, scope) — bucketed
    tables are session-catalog objects, so concurrent sessions (driver,
    pytest, bench) must not collide in the shared warehouse dir."""
    raw = f"{base}_{spark.sparkContext.applicationId}_{scope}"
    return re.sub(r"\W", "_", raw)


def count_exchanges(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators in the EXECUTED physical
    plan — the co-location evidence."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(re.findall(r"\bExchange\b", plan))
