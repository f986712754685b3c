"""Feather / Arrow-IPC source — lossless migration path for reference
feather snapshots (TrainDatasets.py:195, create_coco_from_feather.py:132-133
read ``pyarrow.feather`` files; SURVEY.md §1.1.3 maps snapshots to parquet,
this module reads the EXISTING feather files directly so migration needs no
pre-conversion step).

Spark has no built-in feather reader. Feather v2 IS the Arrow IPC file
format, so the idiomatic Spark path is ``mapInArrow`` over a DataFrame of
file paths: each executor task opens its files with pyarrow and yields the
record batches as-is — Arrow end-to-end, no pandas materialization, no
row-at-a-time Python.

Scale posture:
- File LISTING is driver-side metadata work (same as any FileIndex);
  the bytes are read on executors, one task per path group, so a
  directory of N files parallelizes across min(N, parallelism) tasks.
- Schema comes from ONE footer probe (or the caller), never a
  schema-inference pass over every file.
- ``columns=`` prunes at the IPC reader, so unprojected columns are
  never decoded (feather v2 lays out columns independently).
- A single giant feather file does NOT split (IPC files are not
  block-splittable the way parquet row groups are) — that is inherent
  to the format; the migration move for repeat querying is one
  ``read_feather(...).write.parquet(...)`` hop, after which everything
  is a parquet scan with real pushdown.
"""

from __future__ import annotations

import glob
import os
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

_FEATHER_EXTS = (".feather", ".arrow", ".ipc")


def _expand_paths(paths: str | list[str]) -> list[str]:
    """Resolve files/dirs/globs to a sorted list of feather files."""
    if isinstance(paths, str):
        paths = [paths]
    out: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            for ext in _FEATHER_EXTS:
                out.extend(glob.glob(os.path.join(p, f"*{ext}")))
        elif os.path.isfile(p):
            out.append(p)
        else:
            out.extend(glob.glob(p))
    files = sorted(set(out))
    if not files:
        raise FileNotFoundError(f"no feather files under {paths!r}")
    return files


def read_feather(
    spark: SparkSession,
    paths: str | list[str],
    columns: list[str] | None = None,
) -> DataFrame:
    """Read feather v1/v2 (Arrow IPC) files as a DataFrame.

    ``paths``: file, directory, glob, or list thereof. All files must
    share a schema (first file's footer is the contract; a drifted file
    fails loudly at read time rather than silently unioning).
    ``columns``: optional projection, pruned inside the IPC reader.
    """
    import pyarrow as pa
    import pyarrow.feather as feather

    from pyspark.sql.pandas.types import from_arrow_schema

    files = _expand_paths(paths)
    # One driver-side FOOTER-ONLY probe pins the schema. pa.ipc.open_file
    # reads just the footer/metadata of an Arrow-file (feather v2) blob —
    # a zstd-compressed multi-GB snapshot costs O(KB) here, where
    # feather.read_table would decompress the whole file into driver
    # memory (memory_map only helps uncompressed files). Feather v1
    # (legacy) has no Arrow-file footer; fall back to a full read for
    # that format only.
    try:
        with pa.memory_map(files[0]) as source:
            arrow_schema = pa.ipc.open_file(source).schema
    except pa.ArrowInvalid:  # legacy feather v1
        arrow_schema = feather.read_table(
            files[0], columns=columns, memory_map=True
        ).schema
    else:
        if columns is not None:
            arrow_schema = pa.schema(
                [arrow_schema.field(c) for c in columns]
            )
    spark_schema = from_arrow_schema(arrow_schema, prefer_timestamp_ntz=True)

    parallelism = spark.sparkContext.defaultParallelism
    paths_df = spark.createDataFrame(
        [(p,) for p in files], "__path string"
    ).repartition(min(len(files), parallelism))

    want_names = list(arrow_schema.names)

    def read_batches(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for path_batch in it:
            for path in path_batch.column("__path").to_pylist():
                table = feather.read_table(
                    path, columns=columns, memory_map=True
                )
                # enforce the probed contract: same columns, same types
                # (cast covers benign drift like int32 vs int64 files;
                # incompatible drift raises with the offending path)
                try:
                    table = table.select(want_names).cast(arrow_schema)
                except (KeyError, pa.ArrowInvalid, pa.ArrowNotImplementedError) as e:
                    raise ValueError(f"schema drift in {path}: {e}") from e
                yield from table.to_batches()

    return paths_df.mapInArrow(read_batches, spark_schema)


def write_feather(
    df: DataFrame,
    dest_dir: str,
    compression: str = "zstd",
) -> int:
    """Write a DataFrame as feather v2 (Arrow IPC) files, one file per
    partition, executor-side — the reverse migration path (producing
    snapshots a pyarrow/pandas consumer like the reference's
    TrainDatasets.py:195 reads directly).

    Each task converts its Arrow batches straight to one
    ``part-{NNNNN}.feather`` under ``dest_dir``; no pandas
    materialization, no driver collect. Returns the number of files
    written. ``dest_dir`` must be on a filesystem reachable from the
    executors (shared FS / fuse mount; same contract as any Spark sink).
    Empty partitions write nothing, so file count <= partition count.
    """
    import pyarrow as pa
    import pyarrow.feather as feather

    os.makedirs(dest_dir, exist_ok=True)
    spark_schema = df.schema

    from pyspark.sql.pandas.types import to_arrow_schema

    arrow_schema = to_arrow_schema(spark_schema)
    count_schema = pa.schema([pa.field("files", pa.int64())])

    def write_partition(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        batches = list(it)
        if batches:
            table = pa.Table.from_batches(batches, schema=arrow_schema)
            path = os.path.join(dest_dir, f"part-{pid:05d}.feather")
            feather.write_feather(table, path, compression=compression)
            n = 1
        else:
            n = 0
        yield pa.RecordBatch.from_pylist([{"files": n}], schema=count_schema)

    from pyspark.sql.types import LongType, StructField, StructType

    counts = df.mapInArrow(
        write_partition, StructType([StructField("files", LongType())])
    )
    return sum(r["files"] for r in counts.collect())


def feather_to_parquet(
    spark: SparkSession,
    src: str | list[str],
    dest: str,
    partition_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """One-hop migration: feather snapshot(s) → (optionally partitioned)
    parquet. After this, every downstream query gets parquet pushdown,
    splittable scans, and footer statistics — the reference's feather
    read (TrainDatasets.py:195) becomes a plain ``read_table``."""
    df = read_feather(spark, src)
    writer = df.write.mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(dest)
