"""Manifest-based file skipping with versioned snapshots — a minimal
Iceberg/Delta-style table layer over parquet directories.

At 100 TB the scan-planning cost itself matters: listing a huge
directory and opening every parquet footer to evaluate min/max is an
O(files) metadata storm per query. Table formats fix this by keeping a
MANIFEST — one small table of per-file column bounds — so planning
reads one object and prunes files before the FileIndex ever sees them.
And because each write lands as a new immutable SNAPSHOT with its own
manifest, readers get time travel and writers never disturb a running
query. This module implements that contract natively in Spark:

- ``write_manifest_table``: each call appends snapshot ``v=N`` (data
  files under ``<path>/v=N/``, zone map under
  ``<path>/_manifest/v=N/``). Data is range-laid-out on a sort column
  (repartitionByRange + sortWithinPartitions, so each file owns a
  tight value interval); the per-file (min, max, rows) map is derived
  in ONE distributed pass over the just-written files
  (``input_file_name()`` + groupBy). ``_manifest`` is an underscore
  path, which Spark's FileIndex ignores for data reads (the
  ``_delta_log`` convention).
- ``read_pruned``: load one snapshot's manifest (file-count rows,
  driver-side), keep files whose [min, max] interval overlaps the
  predicate band, and read ONLY those, re-applying the band as a
  residual filter for exactness. Files the band misses are never
  opened — not even their footers. ``version=None`` reads the latest
  snapshot; any earlier version stays readable forever (time travel).

The residual filter makes correctness independent of HOW files were
assigned (range-boundary sampling is not deterministic); the manifest
affects only which files can be skipped, never the result.

Scale bound, stated: planning collects the manifest to the driver —
O(files) rows of a few hundred bytes. That holds comfortably to ~10^6
files per snapshot (the compactor exists precisely to keep file counts
there); past that, ``build_manifest_list`` adds the manifest-of-
manifests tier (Iceberg manifest lists): the manifest itself is
range-sharded and a tiny per-shard bounds table lets
``read_pruned_two_tier`` plan a band read touching only the metadata
shards the band overlaps — the same zone-map trick one level up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def versions(spark: SparkSession, path: str) -> list[int]:
    """Snapshot versions present at ``path``, ascending."""
    vs = (
        spark.read.parquet(f"{path}/_manifest")
        .select("v")
        .distinct()
        .collect()
    )
    return sorted(int(r["v"]) for r in vs)


def write_manifest_table(
    df: DataFrame,
    path: str,
    sort_col: str,
    num_files: int = 16,
) -> int:
    """Append ``df`` as the next snapshot of the manifest table at
    ``path``; returns the new version number."""
    spark = df.sparkSession
    try:
        version = versions(spark, path)[-1] + 1
    except Exception:  # first snapshot: no manifest dir yet
        version = 1
    data_dir = f"{path}/v={version}"
    (
        df.repartitionByRange(num_files, sort_col)
        .sortWithinPartitions(sort_col)
        .write.mode("errorifexists")
        .parquet(data_dir)
    )
    zone_map = (
        spark.read.parquet(data_dir)
        .select(
            F.input_file_name().alias("file"),
            F.col(sort_col).alias("v_"),
        )
        .groupBy("file")
        .agg(
            F.min("v_").alias("min_v"),
            F.max("v_").alias("max_v"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    zone_map.coalesce(1).write.mode("errorifexists").parquet(
        f"{path}/_manifest/v={version}"
    )
    return version


def _manifest_rows(spark: SparkSession, path: str, version: int | None):
    mf = spark.read.parquet(f"{path}/_manifest")
    v = version if version is not None else versions(spark, path)[-1]
    return [r for r in mf.collect() if int(r["v"]) == v], v


def read_pruned(
    spark: SparkSession,
    path: str,
    sort_col: str,
    lo,
    hi,
    version: int | None = None,
) -> DataFrame:
    """Read only the files of one snapshot whose zone-map interval
    overlaps [lo, hi], with the band re-applied as a residual filter.
    ``version=None`` = latest snapshot; earlier versions time-travel."""
    manifest, v = _manifest_rows(spark, path, version)
    keep = [
        r["file"]
        for r in manifest
        if not (r["max_v"] < lo or r["min_v"] > hi)
    ]
    band = (F.col(sort_col) >= F.lit(lo)) & (F.col(sort_col) <= F.lit(hi))
    if not keep:
        # empty result with the snapshot's schema (lazy probe)
        return spark.read.parquet(f"{path}/v={v}").filter(F.lit(False))
    out = spark.read.parquet(*keep).filter(band)
    dels = _delete_keys(
        spark, path, v, min_origin=min(_file_origin(f) for f in keep)
    )
    if dels is not None:
        out = _apply_tombstones(out, dels, sort_col)
    return out


def pruned_file_count(
    spark: SparkSession,
    path: str,
    lo,
    hi,
    version: int | None = None,
) -> tuple[int, int]:
    """(files kept, files total) for a band — the skipping evidence."""
    manifest, _ = _manifest_rows(spark, path, version)
    keep = sum(
        1 for r in manifest if not (r["max_v"] < lo or r["min_v"] > hi)
    )
    return keep, len(manifest)


def read_snapshot(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Full read of one snapshot (latest when ``version`` is None) —
    through the manifest's FILE LIST, so snapshots composed by
    metadata-only appends (files living under several ``v=`` dirs)
    read correctly."""
    manifest, v = _manifest_rows(spark, path, version)
    files = [r["file"] for r in manifest]
    if not files:
        return spark.read.parquet(f"{path}/v={v}").filter(F.lit(False))
    out = spark.read.parquet(*files)
    dels = _delete_keys(
        spark, path, v, min_origin=min(_file_origin(f) for f in files)
    )
    if dels is not None:
        key = [c for c in dels.columns if c != "v"][0]
        out = _apply_tombstones(out, dels, key)
    return out


def compact_snapshot(
    spark: SparkSession,
    path: str,
    sort_col: str,
    target_rows: int,
) -> int:
    """Compact the latest snapshot into ~``target_rows``-row files,
    appended as a NEW snapshot (the old one stays readable — compaction
    under snapshot isolation, the Iceberg/Delta OPTIMIZE shape).

    The file count is planned from the MANIFEST alone (sum of per-file
    row counts — no data scan, no footer reads); the rewrite is one
    range-repartition pass. The small-file problem this solves is a
    100 TB killer: a streaming or per-batch writer leaves thousands of
    KB-sized files whose per-file open/seek overhead dominates scans
    and whose zone-map intervals overlap; compaction restores
    tight-interval, right-sized files and re-derives the zone map.
    """
    manifest, v = _manifest_rows(spark, path, None)
    total = sum(int(r["n_rows"]) for r in manifest)
    n_files = max(1, -(-total // target_rows))
    return write_manifest_table(
        read_snapshot(spark, path, v), path, sort_col, num_files=n_files
    )


def append_snapshot(
    df: DataFrame,
    path: str,
    sort_col: str,
    num_files: int = 4,
) -> int:
    """Append ``df`` to the table as a new snapshot WITHOUT rewriting
    existing data: only the new rows land as files (under the new
    version's directory); the new manifest is the previous manifest's
    rows PLUS the new files' zone-map rows. This is the table-format
    append — at 100 TB an ingest batch costs the batch, never the
    table, and readers of older versions are untouched. Returns the new
    version."""
    spark = df.sparkSession
    try:
        prev = versions(spark, path)[-1]
    except Exception:
        prev = None
    version = (prev or 0) + 1
    data_dir = f"{path}/v={version}"
    (
        df.repartitionByRange(num_files, sort_col)
        .sortWithinPartitions(sort_col)
        .write.mode("errorifexists")
        .parquet(data_dir)
    )
    new_rows = (
        spark.read.parquet(data_dir)
        .select(
            F.input_file_name().alias("file"),
            F.col(sort_col).alias("v_"),
        )
        .groupBy("file")
        .agg(
            F.min("v_").alias("min_v"),
            F.max("v_").alias("max_v"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    if prev is not None:
        carried = (
            spark.read.parquet(f"{path}/_manifest")
            .filter(F.col("v") == prev)
            .select("file", "min_v", "max_v", "n_rows")
        )
        new_rows = carried.unionByName(new_rows)
    new_rows.coalesce(1).write.mode("errorifexists").parquet(
        f"{path}/_manifest/v={version}"
    )
    return version


def stream_append_sink(
    stream_df: DataFrame,
    path: str,
    sort_col: str,
    checkpoint_dir: str,
    num_files: int = 4,
):
    """writeStream sink: each micro-batch appends one snapshot via
    ``append_snapshot`` (metadata-only reuse of all prior files).
    Batches replayed after a failure are made idempotent by the ledger:
    a batch id that already produced a version is skipped. Returns the
    StreamingQuery; callers stop it."""
    import json
    import os

    ledger = os.path.join(checkpoint_dir, "applied_batches.json")

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        applied = {}
        if os.path.exists(ledger):
            with open(ledger) as fh:
                applied = json.load(fh)
        if str(batch_id) in applied:
            return
        v = append_snapshot(batch_df, path, sort_col, num_files)
        applied[str(batch_id)] = v
        with open(ledger, "w") as fh:
            json.dump(applied, fh)

    return (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def merge_snapshot(
    spark: SparkSession,
    path: str,
    sort_col: str,
    updates: DataFrame,
    num_files: int = 4,
) -> int:
    """Copy-on-write MERGE (upsert keyed on ``sort_col``) into the
    latest snapshot, appended as a new version — the Delta/Iceberg
    MERGE shape with FILE-LEVEL pruning:

    1. The updates' key interval is read from a 1-row aggregate; files
       whose zone-map interval does not overlap it are CARRIED into the
       new manifest untouched (metadata only — never opened).
    2. Only the overlapping files are read; their rows lose to update
       rows on key collision (anti-join), the union is rewritten as
       fresh range-laid files, and the new manifest = carried rows +
       rewritten files' zone map.

    At 100 TB a MERGE touching one day's key range costs that key
    range, not the table. The rewritten-file count is planned from the
    data actually rewritten. Returns the new version.

    Pruning granularity, stated: "touched" is decided by the updates'
    single [min, max] INTERVAL — right for the common contiguous-range
    upsert (a day, an id block), pessimal for updates scattered across
    the key domain (two far-apart keys mark everything between them
    touched). Scattered workloads should either batch updates by range
    or take the merge-on-read path (``delete_from_snapshot`` + append),
    which touches nothing; a per-file key-set semi-join test would cost
    a shuffle per MERGE to save rewrites the tombstone path avoids for
    free.
    """
    manifest, prev = _manifest_rows(spark, path, None)
    bounds = updates.agg(
        F.min(sort_col).alias("lo"), F.max(sort_col).alias("hi")
    ).collect()[0]
    lo, hi = bounds["lo"], bounds["hi"]
    touched = [
        r for r in manifest if not (r["max_v"] < lo or r["min_v"] > hi)
    ]
    carried = [
        r for r in manifest if (r["max_v"] < lo or r["min_v"] > hi)
    ]
    version = prev + 1
    data_dir = f"{path}/v={version}"
    if touched:
        touched_files = [r["file"] for r in touched]
        old_rows = spark.read.parquet(*touched_files)
        dels = _delete_keys(
            spark,
            path,
            prev,
            min_origin=min(_file_origin(f) for f in touched_files),
        )
        if dels is not None:
            # honor tombstones: a rewrite must not resurrect deleted
            # rows — origin-scoped, so a key re-inserted after its
            # delete is NOT re-killed here
            old_rows = _apply_tombstones(old_rows, dels, sort_col)
        survivors = old_rows.join(
            updates.select(sort_col).distinct(), sort_col, "left_anti"
        )
        merged = survivors.unionByName(updates)
    else:
        merged = updates
    (
        merged.repartitionByRange(num_files, sort_col)
        .sortWithinPartitions(sort_col)
        .write.mode("errorifexists")
        .parquet(data_dir)
    )
    new_rows = (
        spark.read.parquet(data_dir)
        .select(
            F.input_file_name().alias("file"),
            F.col(sort_col).alias("v_"),
        )
        .groupBy("file")
        .agg(
            F.min("v_").alias("min_v"),
            F.max("v_").alias("max_v"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    if carried:
        carried_df = spark.createDataFrame(
            [
                (r["file"], r["min_v"], r["max_v"], r["n_rows"])
                for r in carried
            ],
            new_rows.schema,
        )
        new_rows = carried_df.unionByName(new_rows)
    new_rows.coalesce(1).write.mode("errorifexists").parquet(
        f"{path}/_manifest/v={version}"
    )
    return version


def build_manifest_list(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    num_shards: int = 8,
) -> int:
    """Second metadata tier — the Iceberg "manifest list" shape. The
    one-tier layout collects the WHOLE manifest to the driver at plan
    time, which is fine to ~10^6 files and a metadata storm past it.
    This call rewrites one snapshot's manifest as ``num_shards``
    range-sharded parquet files (``_manifest_shards/v=N/``, ranged on
    ``min_v`` so each shard owns a contiguous slice of the key domain)
    plus a tiny MANIFEST LIST (``_manifest_list/v=N/``): one row per
    shard file with that shard's aggregate [min(min_v), max(max_v)]
    bounds and file/row counts — the same zone-map trick one level up.
    Planning then reads the list (O(shards) rows), opens only the
    shards whose aggregate interval overlaps the predicate band, and
    never touches the rest of the metadata — so plan cost scales with
    the band's share of the table, not the table's file count.
    Returns the number of shard files written."""
    manifest, v = _manifest_rows(spark, path, version)
    rows = spark.createDataFrame(
        [(r["file"], r["min_v"], r["max_v"], r["n_rows"]) for r in manifest],
        "file string, min_v bigint, max_v bigint, n_rows bigint",
    )
    shards_dir = f"{path}/_manifest_shards/v={v}"
    (
        rows.repartitionByRange(num_shards, "min_v")
        .sortWithinPartitions("min_v")
        .write.mode("errorifexists")
        .parquet(shards_dir)
    )
    listing = (
        spark.read.parquet(shards_dir)
        .select(
            F.input_file_name().alias("shard_file"),
            "min_v",
            "max_v",
            "n_rows",
        )
        .groupBy("shard_file")
        .agg(
            F.min("min_v").alias("shard_min"),
            F.max("max_v").alias("shard_max"),
            F.count(F.lit(1)).alias("n_files"),
            F.sum("n_rows").alias("n_rows"),
        )
    )
    listing.coalesce(1).write.mode("errorifexists").parquet(
        f"{path}/_manifest_list/v={v}"
    )
    return spark.read.parquet(f"{path}/_manifest_list/v={v}").count()


def _list_rows(spark: SparkSession, path: str, version: int | None):
    lst = spark.read.parquet(f"{path}/_manifest_list")
    v = version if version is not None else versions(spark, path)[-1]
    return [r for r in lst.collect() if int(r["v"]) == v], v


def read_pruned_two_tier(
    spark: SparkSession,
    path: str,
    sort_col: str,
    lo,
    hi,
    version: int | None = None,
) -> DataFrame:
    """Band read planned through the manifest LIST: collect the list
    (O(shards) rows), open ONLY the manifest shards whose aggregate
    interval overlaps [lo, hi], prune data files from those shards'
    rows, then read the surviving data files with the band re-applied
    as a residual filter (and tombstones honored, like ``read_pruned``).
    Shards — and therefore the file-level metadata of everything
    outside the band — are never opened. Conservative-correct: a data
    file overlapping the band forces its shard's aggregate bounds to
    overlap too, so shard pruning can skip only shards with no
    qualifying file."""
    listing, v = _list_rows(spark, path, version)
    shard_files = [
        r["shard_file"]
        for r in listing
        if not (r["shard_max"] < lo or r["shard_min"] > hi)
    ]
    band = (F.col(sort_col) >= F.lit(lo)) & (F.col(sort_col) <= F.lit(hi))
    if not shard_files:
        return spark.read.parquet(f"{path}/v={v}").filter(F.lit(False))
    manifest = spark.read.parquet(*shard_files).collect()
    keep = [
        r["file"]
        for r in manifest
        if not (r["max_v"] < lo or r["min_v"] > hi)
    ]
    if not keep:
        return spark.read.parquet(f"{path}/v={v}").filter(F.lit(False))
    out = spark.read.parquet(*keep).filter(band)
    dels = _delete_keys(
        spark, path, v, min_origin=min(_file_origin(f) for f in keep)
    )
    if dels is not None:
        out = _apply_tombstones(out, dels, sort_col)
    return out


def pruned_shard_count(
    spark: SparkSession,
    path: str,
    lo,
    hi,
    version: int | None = None,
) -> tuple[int, int]:
    """(manifest shards opened, shards total) for a band — the
    second-tier skipping evidence, parallel to ``pruned_file_count``."""
    listing, _ = _list_rows(spark, path, version)
    kept = sum(
        1
        for r in listing
        if not (r["shard_max"] < lo or r["shard_min"] > hi)
    )
    return kept, len(listing)


def _file_origin(file: str) -> int:
    """Version whose write created ``file`` — the last ``v=N`` path
    segment. Every writer here lands data under ``<path>/v=N/``, so the
    origin is recoverable from the path alone (no footer read)."""
    import re

    return int(re.findall(r"/v=(\d+)/", file)[-1])


def _delete_keys(
    spark: SparkSession,
    path: str,
    version: int,
    min_origin: int | None = None,
) -> DataFrame | None:
    """Tombstones visible to a reader of ``version``. A tombstone of
    version D only applies to rows from files written BEFORE D
    (Delta/Iceberg delete semantics — see ``_apply_tombstones``), so
    when the caller knows the snapshot's oldest file origin, tombstones
    with ``v <= min_origin`` match nothing and are pruned here; after a
    compaction (all origins = compacted version) that prunes EVERY
    older tombstone, which is how compaction clears delete debt without
    mutating ``_deletes``."""
    try:
        dels = spark.read.parquet(f"{path}/_deletes")
    except Exception:
        return None
    dels = dels.filter(F.col("v") <= version)
    if min_origin is not None:
        dels = dels.filter(F.col("v") > min_origin)
    return dels if dels.limit(1).count() else None


def _apply_tombstones(out: DataFrame, dels: DataFrame, key: str) -> DataFrame:
    """Anti-join ``out`` against tombstones, scoped by origin: a
    tombstone of version D removes a key only from rows whose file was
    written before D. A later append/merge that re-inserts the key
    lands in a file with origin >= D and survives — matching
    ``merge_snapshot``'s upsert contract and Delta/Iceberg semantics
    (a delete applies to the data that existed when it was issued)."""
    d = dels.select(
        F.col(key).alias("_del_key"), F.col("v").alias("_del_v")
    )
    out = out.withColumn(
        "_origin",
        F.regexp_extract(F.input_file_name(), r".*/v=(\d+)/", 1).cast(
            "long"
        ),
    )
    # key equality keeps this a hash anti-join (the version bound rides
    # as a residual condition); AQE broadcasts when the tombstones are
    # small, so no hint — delete-heavy tables shouldn't be forced to
    # broadcast millions of keys.
    return out.join(
        d,
        (F.col(key) == F.col("_del_key"))
        & (F.col("_origin") < F.col("_del_v")),
        "left_anti",
    ).drop("_origin")


def delete_from_snapshot(
    spark: SparkSession,
    path: str,
    sort_col: str,
    keys: DataFrame,
) -> int:
    """MERGE-ON-READ delete: record the keys as a tombstone sidecar
    (``_deletes/v=N``) and carry the previous manifest verbatim — ZERO
    data files touched. Readers of version >= N anti-join the
    accumulated tombstones; readers of older versions see the rows
    (tombstones are version-scoped). ``compact_snapshot`` PURGES:
    its rewrite reads through the tombstone filter, so the compacted
    snapshot carries no delete debt.

    The copy-on-write twin is ``merge_snapshot`` (rewrites overlapping
    files); delete-heavy workloads take tombstones now and pay the
    rewrite once at compaction — the Delta/Iceberg deletion-vector
    trade. Returns the new version.
    """
    manifest, prev = _manifest_rows(spark, path, None)
    version = prev + 1
    keys.select(F.col(sort_col)).distinct().withColumn(
        "v", F.lit(version)
    ).coalesce(1).write.mode("append").partitionBy("v").parquet(
        f"{path}/_deletes"
    )
    carried = spark.createDataFrame(
        [
            (r["file"], r["min_v"], r["max_v"], r["n_rows"])
            for r in manifest
        ],
        "file string, min_v bigint, max_v bigint, n_rows bigint",
    )
    carried.coalesce(1).write.mode("errorifexists").parquet(
        f"{path}/_manifest/v={version}"
    )
    return version
