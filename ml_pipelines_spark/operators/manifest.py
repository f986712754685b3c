"""Manifest-based file skipping — a minimal Iceberg/Delta-style zone
map over a parquet directory.

At 100 TB the scan-planning cost itself matters: listing a huge
directory and opening every parquet footer to evaluate min/max is an
O(files) metadata storm per query. Table formats fix this by keeping a
MANIFEST — one small table of per-file column bounds — so planning
reads one object and prunes files before the FileIndex ever sees them.
This module implements that contract natively in Spark:

- ``write_manifest_table``: range-layout the data on a sort column
  (repartitionByRange + sortWithinPartitions, so each file owns a tight
  value interval), write it, then derive the per-file (min, max, rows)
  zone map in ONE distributed pass over the just-written files
  (``input_file_name()`` + groupBy) and store it under ``_manifest/``
  — an underscore path, which Spark's FileIndex ignores for data reads
  (the same convention as ``_delta_log``).
- ``read_pruned``: load the manifest (file-count rows, driver-side),
  keep files whose [min, max] interval overlaps the predicate band,
  and read ONLY those, re-applying the band as a residual filter for
  exactness. Files the band misses are never opened — not even their
  footers.

The residual filter makes correctness independent of HOW files were
assigned (range-boundary sampling is not deterministic); the manifest
affects only which files can be skipped, never the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_manifest_table(
    df: DataFrame,
    path: str,
    sort_col: str,
    num_files: int = 16,
) -> None:
    """Write ``df`` range-clustered on ``sort_col`` with a file-level
    zone-map manifest at ``<path>/_manifest``."""
    (
        df.repartitionByRange(num_files, sort_col)
        .sortWithinPartitions(sort_col)
        .write.mode("overwrite")
        .parquet(path)
    )
    spark = df.sparkSession
    zone_map = (
        spark.read.parquet(path)
        .select(
            F.input_file_name().alias("file"),
            F.col(sort_col).alias("v"),
        )
        .groupBy("file")
        .agg(
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    zone_map.coalesce(1).write.mode("overwrite").parquet(f"{path}/_manifest")


def read_pruned(
    spark: SparkSession,
    path: str,
    sort_col: str,
    lo,
    hi,
) -> DataFrame:
    """Read only the files whose zone-map interval overlaps [lo, hi],
    with the band re-applied as a residual filter."""
    manifest = spark.read.parquet(f"{path}/_manifest").collect()
    keep = [
        r["file"]
        for r in manifest
        if not (r["max_v"] < lo or r["min_v"] > hi)
    ]
    band = (F.col(sort_col) >= F.lit(lo)) & (F.col(sort_col) <= F.lit(hi))
    if not keep:
        # empty result with the table's schema (probe one file lazily)
        return spark.read.parquet(path).filter(F.lit(False))
    return spark.read.parquet(*keep).filter(band)


def pruned_file_count(spark: SparkSession, path: str, lo, hi) -> tuple[int, int]:
    """(files kept, files total) for a band — the skipping evidence."""
    manifest = spark.read.parquet(f"{path}/_manifest").collect()
    keep = sum(
        1 for r in manifest if not (r["max_v"] < lo or r["min_v"] > hi)
    )
    return keep, len(manifest)
