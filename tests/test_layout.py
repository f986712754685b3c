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


# ---------------------------------------------------------------------------
# Round-10: Hilbert-curve layout (VERDICT r09 item 8) — the Morton
# alternative with strictly better locality at 2 columns.
# ---------------------------------------------------------------------------
def test_hilbert_index_bijective_and_unit_step():
    # the two defining properties on a 16x16 grid: every cell gets a
    # distinct position (bijection onto 0..255), and consecutive curve
    # positions are GRID NEIGHBORS (manhattan distance exactly 1 —
    # Morton fails this at every quadrant jump)
    import numpy as np

    from ml_pipelines_spark.operators.layout import _hilbert_index

    n = 16
    xs, ys = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    d = _hilbert_index(xs.ravel(), ys.ravel(), bits=4)
    assert sorted(d.tolist()) == list(range(n * n))
    order = np.argsort(d)
    px, py = xs.ravel()[order], ys.ravel()[order]
    steps = np.abs(np.diff(px)) + np.abs(np.diff(py))
    assert (steps == 1).all()


def test_hilbert_layout_prunes_tighter_than_morton(spark, tmp_path):
    # head-to-head on the rectangle-scan harness: uniform synthetic
    # (x, y), same file count, same probe rectangles. Hilbert's keep
    # sets must be no worse on every probe and strictly better in
    # aggregate; both layouts must return identical (correct) rows.
    from ml_pipelines_spark.operators.filestats import (
        read_pruned_rect,
        write_manifest_table_zordered,
    )

    n = 64
    grid = (
        spark.range(n * n)
        .select(
            (F.col("id") % n).alias("x"),
            (F.col("id") / n).cast("long").alias("y"),
            F.col("id").alias("payload"),
        )
    )
    paths = {}
    # 12 files: deliberately NOT a power of 4 — aligned file counts
    # tile both curves into identical squares and the comparison ties;
    # unaligned curve segments are where Hilbert's unit-step locality
    # pays (Morton segments straddle quadrant jumps)
    for curve in ("morton", "hilbert"):
        p = str(tmp_path / curve)
        write_manifest_table_zordered(
            grid, p, "x", "y", num_files=12, bits=6, curve=curve
        )
        paths[curve] = p
    # probe rectangles deliberately straddling quadrant boundaries —
    # where Morton's jumps cost it files
    probes = [
        (("x", 24, 40), ("y", 24, 40)),
        (("x", 8, 24), ("y", 40, 56)),
        (("x", 16, 48), ("y", 28, 36)),
        (("x", 30, 34), ("y", 0, 63)),
        (("x", 0, 63), ("y", 30, 34)),
        (("x", 20, 44), ("y", 52, 60)),
    ]
    kept = {"morton": 0, "hilbert": 0}
    for band_a, band_b in probes:
        counts = {}
        for curve, p in paths.items():
            out = read_pruned_rect(spark, p, band_a, band_b)
            rows = {r["payload"] for r in out.collect()}
            want = {
                r["payload"]
                for r in grid.filter(
                    F.col("x").between(band_a[1], band_a[2])
                    & F.col("y").between(band_b[1], band_b[2])
                ).collect()
            }
            assert rows == want  # layout never changes results
            opened = out.select(
                F.input_file_name().alias("f")
            ).distinct().count()
            counts[curve] = opened
            kept[curve] += opened
        # per-probe counts wobble ±1 with repartitionByRange's sampled
        # boundaries; the stable signal is the aggregate
        assert counts["hilbert"] <= counts["morton"] + 2
    assert kept["hilbert"] < kept["morton"]
