"""Z-order layout: per-row-group parquet stats must cluster BOTH
columns, unlike a linear sort which clusters only the leading one.
Verified by reading row-group footers with pyarrow."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from ml_pipelines_spark.operators.layout import interleave_bits, write_zordered


def _avg_span_fraction(path: str, col: str) -> float:
    """Mean (row-group max-min span) / (global span) over all files'
    row groups — 1.0 means no clustering, ~0 means tight clustering."""
    lo = hi = None
    spans = []
    metas = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            spans.append((st.min, st.max))
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
    total = hi - lo
    if total == 0:
        return 0.0
    return sum((b - a) for a, b in spans) / (len(spans) * total)


def test_interleave_bits_known_values(spark):
    df = spark.createDataFrame([(0b101, 0b011)], "a long, b long")
    z = df.select(interleave_bits(F.col("a"), F.col("b"), bits=3)).first()[0]
    # a bits -> odd positions, b bits -> even: a=101, b=011 -> 100111
    assert z == 0b100111


def test_zorder_clusters_both_columns(spark, tmp_path):
    # two independent uniform dimensions
    df = spark.range(200_000).select(
        (F.hash("id") % 1000).alias("x"),
        (F.hash(F.col("id") + 1) % 1000).alias("y"),
    ).filter((F.col("x") >= 0) & (F.col("y") >= 0))
    zpath = str(tmp_path / "zorder")
    lpath = str(tmp_path / "linear")
    write_zordered(df, zpath, "x", "y", bits=8, n_files=16)
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    # linear layout: x tightly clustered, y spans ~full domain per group
    assert _avg_span_fraction(lpath, "x") < 0.5
    assert _avg_span_fraction(lpath, "y") > 0.9
    # z-order: BOTH columns clustered well below the full domain
    # (16 morton ranges ~ a 4x4 tiling -> ~1/4-domain spans per group)
    zx, zy = _avg_span_fraction(zpath, "x"), _avg_span_fraction(zpath, "y")
    assert zx < 0.45 and zy < 0.45, (zx, zy)


def test_zordered_read_roundtrip(spark, tmp_path):
    df = spark.range(10_000).select(
        (F.col("id") % 100).alias("x"), (F.col("id") % 97).alias("y"),
        F.col("id").alias("payload"),
    )
    path = str(tmp_path / "z2")
    write_zordered(df, path, "x", "y")
    back = spark.read.parquet(path)
    assert back.count() == 10_000
    assert back.agg(F.sum("payload")).first()[0] == df.agg(F.sum("payload")).first()[0]
