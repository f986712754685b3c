"""Z-order data layout for multi-column scan locality.

A table sorted linearly on column A prunes row groups only for filters
on A: every row group spans the full domain of B. Interleaving the bits
of (bucketed) A and B into one Morton key and sorting by THAT clusters
the file on both dimensions at once — each row group covers a small
rectangle of (A, B) space, so parquet min/max statistics prune reads
for filters on either column (or both). This is the standard layout
trick for datalake tables queried along two axes (user × time,
project × date).

Construction is scale-clean: per-column min/max come from ONE tiny
aggregate (driver scalars, embedded as literals), bucketing is
``width_bucket`` (no windows, no global sort of ranks), the interleave
is pure bit arithmetic in codegen, and the write is
``repartitionByRange`` on the key + in-partition sort — the same
machinery as any sorted write.

Round 10 adds the HILBERT curve (``hilbert_key``) as an alternative
clustering key: Morton's bit-interleave takes long diagonal jumps at
every quadrant boundary, so an unaligned run of consecutive Morton
values can span distant grid regions; every unit step of a Hilbert
curve is a unit grid step, so equal-length curve segments (= files)
cover squarer, more compact regions and fewer files straddle a query
rectangle. Measured head-to-head on the same rectangle-scan harness
in tests/test_layout.py — Hilbert's aggregate keep set is strictly
smaller at unaligned file counts.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(a: Column, b: Column, bits: int = 8) -> Column:
    """Morton interleave of two non-negative ints of ``bits`` bits each:
    result bit 2i+1 = bit i of a, bit 2i = bit i of b."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(a.cast("long"), i) % 2, 2 * i + 1)
            + F.shiftleft(F.shiftright(b.cast("long"), i) % 2, 2 * i)
        )
    return z


def zorder_key(
    df: DataFrame, col_a: str, col_b: str, bits: int = 8
) -> Column:
    """Z-value expression over equal-width buckets of two numeric
    columns. Min/max are computed once (a driver-scalar aggregate) and
    embedded as literals; ``width_bucket`` then buckets without any
    shuffle or window."""
    row = df.select(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).first()
    amin, amax, bmin, bmax = (float(v) for v in row)
    n = 2**bits

    def bucket(c: str, lo: float, hi: float) -> Column:
        if hi <= lo:
            return F.lit(0).cast("long")
        # width_bucket yields 1..n+1; clamp into 0..n-1
        wb = F.width_bucket(F.col(c).cast("double"), F.lit(lo), F.lit(hi), F.lit(n))
        return F.least(F.greatest(wb - 1, F.lit(0)), F.lit(n - 1)).cast("long")

    return interleave_bits(bucket(col_a, amin, amax), bucket(col_b, bmin, bmax), bits)


def _hilbert_index(x, y, bits: int):
    """Vectorized (x, y) -> Hilbert curve position on a 2^bits × 2^bits
    grid (the classic iterative xy2d with rotate/reflect per level,
    numpy-vectorized). Unlike Morton, every unit step along the curve
    is a unit step on the grid, so equal-length curve segments cover
    squarer, more compact regions — fewer files straddle a query
    rectangle's boundary, which is the whole point of curve layout."""
    import numpy as np

    x = np.asarray(x, dtype=np.int64).copy()
    y = np.asarray(y, dtype=np.int64).copy()
    d = np.zeros_like(x)
    s = np.int64(1) << (bits - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate the quadrant so the curve direction stays consistent
        swap = ry == 0
        refl = swap & (rx == 1)
        xr = np.where(refl, s - 1 - x, x)
        yr = np.where(refl, s - 1 - y, y)
        x = np.where(swap, yr, xr)
        y = np.where(swap, xr, yr)
        s >>= 1
    return d


def hilbert_key(
    df: DataFrame, col_a: str, col_b: str, bits: int = 8
) -> Column:
    """Hilbert-curve twin of ``zorder_key``: same equal-width bucketing
    (driver-scalar min/max, ``width_bucket``, no shuffle), but the
    bucket pair maps to its HILBERT position instead of the Morton
    interleave. The curve index runs as an Arrow-batched pandas UDF —
    a write-time-only cost (8 numpy passes per batch), acceptable
    where a per-row expression tree for the 8-level rotate/reflect
    recursion would blow past codegen limits; reads pay nothing, they
    prune on the same per-file [min, max] stats as any layout."""
    from pyspark.sql.functions import pandas_udf

    row = df.select(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).first()
    amin, amax, bmin, bmax = (float(v) for v in row)
    n = 2**bits

    def bucket(c: str, lo: float, hi: float) -> Column:
        if hi <= lo:
            return F.lit(0).cast("long")
        wb = F.width_bucket(
            F.col(c).cast("double"), F.lit(lo), F.lit(hi), F.lit(n)
        )
        return F.least(F.greatest(wb - 1, F.lit(0)), F.lit(n - 1)).cast(
            "long"
        )

    @pandas_udf("long")
    def _h(xs: pd.Series, ys: pd.Series) -> pd.Series:
        return pd.Series(
            _hilbert_index(xs.to_numpy(), ys.to_numpy(), bits)
        )

    return _h(bucket(col_a, amin, amax), bucket(col_b, bmin, bmax))


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    bits: int = 8,
    n_files: int | None = None,
) -> None:
    """Write parquet clustered by the Z-order of (col_a, col_b):
    range-partition on the z-value (balanced output files), sort within
    partitions, drop the key. Row-group min/max stats then prune scans
    filtered on either column."""
    z = df.withColumn("__z", zorder_key(df, col_a, col_b, bits))
    parts = n_files or df.sparkSession.sparkContext.defaultParallelism
    (
        z.repartitionByRange(parts, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


# ---------------------------------------------------------------------------
# Small-file compaction
# ---------------------------------------------------------------------------

def _list_data_files(spark, path: str) -> list[tuple[str, int]]:
    """(path, bytes) of every data file under ``path``, via the Hadoop
    FileSystem API — works for any scheme Spark can read (gs://, s3a://,
    hdfs://, file:). Metadata-only; no data is read."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out = []
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if not name.startswith("_") and not name.startswith("."):
            out.append((st.getPath().toString(), st.getLen()))
    return out


def compact(
    spark,
    path: str,
    target_file_bytes: int = 128 << 20,
    partition_cols: list[str] | None = None,
    schema=None,
) -> dict:
    """Rewrite a parquet table so files approach ``target_file_bytes``.

    Streaming ingestion and per-micro-batch writes leave datalake tables
    as thousands of KB-sized files; at 100 TB the *file count* becomes
    the bottleneck (driver listing time, task-per-file scheduling, row
    groups too small for effective stats pruning). Compaction is the
    standing maintenance op that rewrites a table into
    ``ceil(total_bytes / target)`` right-sized files.

    Partitioned tables keep their layout: rows are hash-routed on
    (partition columns + a deterministic salt) so each hive partition is
    written by ~``files_per_partition`` tasks, where that count is sized
    from the table's real bytes — one file per partition when partitions
    are small, several when they aren't. The rewrite lands in a temp dir
    and swaps in via rename, so readers never observe a half-compacted
    table; the swap is the same pattern as any blind-overwrite job and
    is safe to re-run.
    """
    from pyspark.sql import functions as F

    files = _list_data_files(spark, path)
    total = sum(b for _, b in files)
    n_out = max(1, -(-total // target_file_bytes))

    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.parquet(path)

    tmp = path.rstrip("/") + "__compact_tmp"
    if partition_cols:
        n_parts = df.select(*partition_cols).distinct().count()
        per_part = max(1, n_out // max(1, n_parts))
        data_cols = [c for c in df.columns if c not in partition_cols]
        salt = F.pmod(F.xxhash64(*data_cols), F.lit(per_part))
        (
            df.withColumn("__salt", salt)
            .repartition(max(n_out, n_parts), *partition_cols, "__salt")
            .drop("__salt")
            .write.mode("overwrite")
            .partitionBy(*partition_cols)
            .parquet(tmp)
        )
    else:
        df.repartition(n_out).write.mode("overwrite").parquet(tmp)

    jvm = spark._jvm
    fs = jvm.org.apache.hadoop.fs.Path(path).getFileSystem(
        spark._jsc.hadoopConfiguration()
    )
    fs.delete(jvm.org.apache.hadoop.fs.Path(path), True)
    fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), jvm.org.apache.hadoop.fs.Path(path))
    after = _list_data_files(spark, path)
    return {
        "files_before": len(files),
        "files_after": len(after),
        "bytes": total,
        "target_file_bytes": target_file_bytes,
    }
