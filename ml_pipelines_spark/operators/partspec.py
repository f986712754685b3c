"""Partition-spec evolution — Iceberg-style per-file partition tuples.

Hive layout bakes ONE partitioning into the directory tree forever; at
100 TB the right partitioning changes as the table grows (status works
at GB scale, ingest month at TB scale), and rewriting history to adopt
the new layout is exactly the O(table) cost a table format exists to
avoid. Iceberg solves this by recording each data file's partition
TUPLE (under the spec that produced it) in table metadata instead of in
the path: old files keep their old spec, new files use the new one, and
the planner prunes every file under the spec it was written with
(Iceberg format spec, "Partition Evolution"). This module implements
that contract natively in Spark:

- ``write_spec_snapshot``: appends ``df`` as the next table version,
  physically grouped so every data file holds exactly ONE value tuple
  of the ACTIVE spec's columns; the manifest row carries the file's
  tuple as a ``map<col,string>`` (a column absent from the map means
  the file predates — or postdates — that spec).
- ``read_spec_pruned``: keeps a file iff EVERY equality predicate on a
  column PRESENT in the file's tuple matches the tuple; a predicate on
  a column the file's spec never recorded keeps the file (the residual
  filter restores exactness). Pruning is metadata-only — skipped files
  are never opened, not even their footers.

Spec transforms (``month(ts)``, ``bucket(n, key)``, ``truncate(w)``)
are expressed by materializing the transform as a real column before
writing; the manifest then prunes on transformed values exactly like
identity ones. Partition columns must be non-null (enforced at write —
a null would vanish into Hive's default-partition dir and stop matching
any equality predicate).

Reference parity: permaling/ml-pipelines partitions datasets once, by
``image_name``/``item_id``, and its own TODO regrets the choice
(TrainDatasets.py:383-385 "partition only by item_id - it will be
faster"). Spec evolution is the operation that regret calls for.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST = "_specmanifest"


def spec_versions(spark: SparkSession, path: str) -> list[int]:
    """Table versions present at ``path``, ascending."""
    vs = (
        spark.read.parquet(f"{path}/{_MANIFEST}")
        .select("v")
        .distinct()
        .collect()
    )
    return sorted(int(r["v"]) for r in vs)


def write_spec_snapshot(
    df: DataFrame, path: str, spec_cols: list[str],
    stats_col: str | None = None,
) -> int:
    """Append ``df`` as the next version under the ACTIVE spec
    ``spec_cols``; prior versions' files are carried forward verbatim
    (append semantics — an ingest batch costs the batch, never the
    table). Returns the new version number.

    Physical layout: one directory per spec tuple (shadow ``_p_*``
    partition columns so the REAL columns stay inside the files —
    explicit-file-list reads must not depend on path parsing), one file
    per tuple. The manifest row stores the tuple as map<col,string>,
    plus — when ``stats_col`` is set — that column's per-file
    [min, max] (Iceberg column stats), so band predicates prune files
    INSIDE surviving tuples. Files written without stats (or with stats
    on another column) are conservatively kept by band reads.
    """
    spark = df.sparkSession
    missing = [c for c in spec_cols if c not in df.columns]
    if missing:
        raise KeyError(f"spec columns not in frame: {missing}")
    null_hits = df.filter(
        " OR ".join(f"{c} IS NULL" for c in spec_cols)
    ).limit(1).count()
    if null_hits:
        raise ValueError(f"null partition value in spec {spec_cols}")
    try:
        version = spec_versions(spark, path)[-1] + 1
    except Exception:  # first snapshot: no manifest yet
        version = 1
    # same atomic commit point as the manifest table layer
    from .manifest import CommitConflict, _claim_version

    if not _claim_version(spark, path, version):
        raise CommitConflict(
            f"spec write to {path} lost the claim for v={version}"
        )
    data_dir = f"{path}/v={version}"
    shadows = [f"_p_{c}" for c in spec_cols]
    # _v_* twins carry the EXACT string value inside the files:
    # directory-read partition inference re-types dir names ("007" ->
    # int 7 -> "7"), which would silently break _keep's string
    # equality for numeric-looking or boolean values; the in-file twin
    # is inference-proof
    values = [f"_v_{c}" for c in spec_cols]
    out = df
    for c, pc, vc in zip(spec_cols, shadows, values):
        out = out.withColumn(pc, F.col(c).cast("string")).withColumn(
            vc, F.col(c).cast("string")
        )
    (
        out.repartition(*[F.col(pc) for pc in shadows])
        .write.mode("errorifexists")
        .partitionBy(*shadows)
        .parquet(data_dir)
    )
    back = spark.read.parquet(data_dir)
    stat_cols = [stats_col] if stats_col else []
    new_rows = (
        back.select(
            F.input_file_name().alias("file"), *values, *stat_cols
        )
        .groupBy("file")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[F.first(F.col(vc)).alias(pc) for pc, vc in zip(shadows, values)],
            *(
                [
                    F.min(F.col(stats_col).cast("double")).alias("stat_min"),
                    F.max(F.col(stats_col).cast("double")).alias("stat_max"),
                ]
                if stats_col
                else [
                    F.lit(None).cast("double").alias("stat_min"),
                    F.lit(None).cast("double").alias("stat_max"),
                ]
            ),
        )
        .select(
            "file",
            "n_rows",
            F.create_map(
                *chain.from_iterable(
                    (F.lit(c), F.col(pc))
                    for c, pc in zip(spec_cols, shadows)
                )
            ).alias("part"),
            F.lit(version).alias("origin"),
            F.lit(stats_col).cast("string").alias("stat_col"),
            "stat_min",
            "stat_max",
        )
    )
    if version > 1:
        carried = (
            spark.read.parquet(f"{path}/{_MANIFEST}")
            .filter(F.col("v") == version - 1)
            .select(
                "file", "n_rows", "part", "origin",
                "stat_col", "stat_min", "stat_max",
            )
        )
        new_rows = carried.unionByName(new_rows)
    new_rows.coalesce(1).write.mode("errorifexists").parquet(
        f"{path}/{_MANIFEST}/v={version}"
    )
    return version


def _manifest_rows(spark: SparkSession, path: str, version: int | None):
    rows = spark.read.parquet(f"{path}/{_MANIFEST}").collect()
    vs = sorted({int(r["v"]) for r in rows})
    v = version if version is not None else vs[-1]
    if v not in vs:
        raise ValueError(f"no version v={v} at {path}")
    return [r for r in rows if int(r["v"]) == v], v


def _norm(v) -> str:
    """Caller-value -> manifest-string normalization: the manifest
    stores Spark's cast-to-string rendering, so booleans are
    lowercase."""
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def _keep(row, eq: dict) -> bool:
    part = row["part"] or {}
    return all(
        part[c] == _norm(v) for c, v in eq.items() if c in part
    )


def _keep_band(row, band) -> bool:
    """File-stats overlap check: keep unless this file carries stats
    for the band's column that prove disjointness (unknown stats or a
    different stats column keep the file — conservative)."""
    if band is None:
        return True
    col, lo, hi = band
    if row["stat_col"] != col or row["stat_min"] is None:
        return True
    return not (row["stat_max"] < lo or row["stat_min"] > hi)


def read_spec_pruned(
    spark: SparkSession,
    path: str,
    eq: dict,
    version: int | None = None,
    band: tuple | None = None,
) -> DataFrame:
    """Read one version through per-file spec pruning: a file written
    under a spec that RECORDS a predicate column must match it; a file
    whose spec never recorded the column survives pruning and is
    filtered by the residual predicate instead. ``band=(col, lo, hi)``
    additionally skips files whose recorded [min, max] stats for that
    column miss the band (both prunings are metadata-only; residual
    filters restore exactness). ``version=None`` reads the latest;
    earlier versions time-travel."""
    manifest, v = _manifest_rows(spark, path, version)
    keep = [
        r["file"]
        for r in manifest
        if _keep(r, eq) and _keep_band(r, band)
    ]
    if not keep:
        all_files = [r["file"] for r in manifest]
        if all_files:
            # schema from a real data file (a directory probe would
            # infer spurious partition columns like compaction's g=)
            out = spark.read.parquet(all_files[0]).filter(F.lit(False))
        else:
            out = spark.read.parquet(f"{path}/v={v}").filter(
                F.lit(False)
            )
    else:
        out = spark.read.parquet(*keep)
    # explicit-file-list reads may still infer the shadow dirs as
    # partition columns; the real columns live inside the files
    out = out.drop(
        *[
            c
            for c in out.columns
            if c.startswith("_p_") or c.startswith("_v_")
        ]
    )
    for c, val in eq.items():
        out = out.filter(F.col(c) == F.lit(val))
    if band is not None:
        col, lo, hi = band
        out = out.filter(
            (F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi))
        )
    return out


def spec_pruned_file_count(
    spark: SparkSession,
    path: str,
    eq: dict,
    version: int | None = None,
    band: tuple | None = None,
) -> tuple[int, int]:
    """(files kept, files total) for the predicate — the evidence that
    pruning works per-spec (and per-band), checked physically in
    tests."""
    manifest, _ = _manifest_rows(spark, path, version)
    kept = sum(
        1 for r in manifest if _keep(r, eq) and _keep_band(r, band)
    )
    return kept, len(manifest)


def compact_spec_snapshot(spark: SparkSession, path: str) -> int:
    """OPTIMIZE for the spec-evolved table: rewrite the LATEST version
    so every partition tuple owns exactly one file (appends under the
    same spec accumulate one file per snapshot per tuple — planning
    cost grows with file count, and small files waste scan setup at
    100 TB). The rewrite groups by each file's recorded tuple, so files
    written under DIFFERENT specs stay separate (their tuples have
    different keys) and the new manifest preserves every tuple
    verbatim. Readers of older versions are untouched (new version,
    new files). Returns the new version."""
    manifest, prev = _manifest_rows(spark, path, None)
    version = prev + 1
    from .manifest import CommitConflict, _claim_version

    if not _claim_version(spark, path, version):
        raise CommitConflict(
            f"spec compaction at {path} lost the claim for v={version}"
        )
    data_dir = f"{path}/v={version}"
    # group files by identical tuple; one output file per group
    groups: dict[tuple, list] = {}
    for r in manifest:
        key = tuple(sorted((r["part"] or {}).items()))
        groups.setdefault(key, []).append(r["file"])
    rows = []
    for gi, (key, files) in enumerate(sorted(groups.items())):
        part_dir = f"{data_dir}/g={gi}"
        df = spark.read.parquet(*files)
        df = df.drop(
            *[
                c
                for c in df.columns
                if c.startswith("_p_") or c.startswith("_v_")
            ]
        )
        df.coalesce(1).write.mode("errorifexists").parquet(part_dir)
        # per-file row counts from the written files themselves (the
        # group total would be wrong if coalesce ever emits >1 part,
        # and a driver-side df.count() re-scans the group's inputs)
        back = spark.read.parquet(part_dir)
        per_file = (
            back.select(F.input_file_name().alias("file"))
            .groupBy("file")
            .count()
            .collect()
        )
        for r2 in per_file:
            rows.append(
                (r2["file"], int(r2["count"]), dict(key), version)
            )
    new_manifest = spark.createDataFrame(
        rows,
        "file string, n_rows bigint, part map<string,string>,"
        " origin int",
    ).select(
        "file", "n_rows", "part", "origin",
        # compaction merges files whose stats may differ; recomputing
        # them needs a stats_col the caller no longer passes — the
        # rewritten files carry NO stats and band reads keep them
        # conservatively (correct, just unpruned until the next
        # stats-bearing write)
        F.lit(None).cast("string").alias("stat_col"),
        F.lit(None).cast("double").alias("stat_min"),
        F.lit(None).cast("double").alias("stat_max"),
    )
    new_manifest.coalesce(1).write.mode("errorifexists").parquet(
        f"{path}/{_MANIFEST}/v={version}"
    )
    return version


def stream_spec_append_sink(
    stream_df: DataFrame,
    path: str,
    spec_cols: list[str],
    checkpoint_dir: str,
    stats_col: str | None = None,
):
    """writeStream sink for the spec table: each micro-batch appends
    one version via ``write_spec_snapshot`` under the CURRENT spec —
    streaming ingest and partition-spec evolution compose, so the spec
    can change between restarts without touching ingested history.
    Batches replayed after a failure are idempotent via the ledger (a
    batch id that already produced a version is skipped). Returns the
    StreamingQuery; callers stop it."""
    from .manifest import ledgered_batch_sink

    return ledgered_batch_sink(
        stream_df,
        checkpoint_dir,
        lambda batch_df: write_spec_snapshot(
            batch_df, path, spec_cols, stats_col=stats_col
        ),
    )
