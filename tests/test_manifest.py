"""Manifest zone-map pruning: files outside the band are skipped and
the result is identical to the unpruned filter."""

from __future__ import annotations

import shutil
import tempfile

import pyspark.sql.functions as F

from ml_pipelines_spark.operators.manifest import (
    pruned_file_count,
    read_pruned,
    write_manifest_table,
)


def test_manifest_prunes_files_and_preserves_results(spark):
    df = spark.range(0, 20000).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 20000).alias("v")
    )
    d = tempfile.mkdtemp(prefix="mlps_manifest_t_")
    try:
        write_manifest_table(df, d, "k", num_files=16)
        lo, hi = 2500, 4500
        kept, total = pruned_file_count(spark, d, lo, hi)
        # the band covers 10% of a range-clustered table: most of the 16
        # files must be skipped without opening them
        assert total == 16
        assert kept <= 4, f"pruning ineffective: {kept}/{total}"
        got = sorted(
            r.k for r in read_pruned(spark, d, "k", lo, hi).collect()
        )
        assert got == list(range(lo, hi + 1))
        # empty band outside the domain: no files, schema preserved
        empty = read_pruned(spark, d, "k", 10**9, 2 * 10**9)
        assert empty.count() == 0
        assert empty.columns == ["k", "v"]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_manifest_dir_is_invisible_to_data_reads(spark):
    # the _manifest subdir must not leak rows into a plain read
    df = spark.range(0, 100).select(F.col("id").alias("k"))
    d = tempfile.mkdtemp(prefix="mlps_manifest_v_")
    try:
        write_manifest_table(df, d, "k", num_files=4)
        assert spark.read.parquet(d).count() == 100
        assert spark.read.parquet(d).columns == ["k"]
    finally:
        shutil.rmtree(d, ignore_errors=True)
