"""Optimistic-concurrency append branches: publish / rebase / conflict
semantics and their physical claims (rename not rewrite, refused
branches leave the table untouched)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from ml_pipelines_spark.operators.manifest import (
    abort_branch,
    publish_branch,
    read_snapshot,
    stage_branch,
    versions,
    write_manifest_table,
)


@pytest.fixture()
def table(spark):
    out = tempfile.mkdtemp(prefix="branch_test_")
    base = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("val")
    )
    write_manifest_table(base, out, "k", num_files=2)
    yield out
    shutil.rmtree(out, ignore_errors=True)


def _rows(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("val")
    )


def test_publish_without_interleaver(spark, table):
    base = stage_branch(_rows(spark, 100, 150), table, "k", "a")
    assert base == 1
    # invisible until published
    assert read_snapshot(spark, table).count() == 100
    v, status = publish_branch(spark, table, "a")
    assert (v, status) == (2, "published")
    assert read_snapshot(spark, table).count() == 150
    assert versions(spark, table) == [1, 2]


def test_disjoint_branch_rebases(spark, table):
    stage_branch(_rows(spark, 100, 150), table, "k", "a")
    stage_branch(_rows(spark, 200, 240), table, "k", "b")
    publish_branch(spark, table, "a")
    v, status = publish_branch(spark, table, "b")
    assert (v, status) == (3, "rebased")
    snap = read_snapshot(spark, table)
    assert snap.count() == 190
    # rebase is a rename: every manifest file path lives under a v= dir
    # and the branch staging area is gone
    man = (
        spark.read.parquet(f"{table}/_manifest")
        .filter(F.col("v") == 3)
        .collect()
    )
    assert all("/v=" in r["file"] for r in man)
    assert all("_branches" not in r["file"] for r in man)
    # staged bounds carried verbatim into the manifest
    b_rows = [r for r in man if "/v=3/" in r["file"]]
    assert sum(r["n_rows"] for r in b_rows) == 40
    assert min(r["min_v"] for r in b_rows) == 200
    assert max(r["max_v"] for r in b_rows) == 239


def test_overlap_is_conflict_and_leaves_table_untouched(spark, table):
    stage_branch(_rows(spark, 100, 150), table, "k", "a")
    stage_branch(_rows(spark, 140, 180), table, "k", "b")  # overlaps a
    publish_branch(spark, table, "a")
    v, status = publish_branch(spark, table, "b")
    assert (v, status) == (None, "conflict")
    assert versions(spark, table) == [1, 2]
    assert read_snapshot(spark, table).count() == 150
    # conflicted branch stays staged for retry/abort, then abort purges
    assert spark.read.parquet(
        f"{table}/_branches/b/manifest"
    ).count() > 0
    abort_branch(spark, table, "b")
    with pytest.raises(Exception):
        spark.read.parquet(f"{table}/_branches/b/manifest").collect()


def test_conflict_is_range_based_not_version_based(spark, table):
    # b overlaps the BASE table's range but not the interloper's —
    # appends against old data commute, so it must still publish
    stage_branch(_rows(spark, 100, 150), table, "k", "a")
    stage_branch(_rows(spark, 300, 320), table, "k", "b")
    publish_branch(spark, table, "a")
    v, status = publish_branch(spark, table, "b")
    assert (v, status) == (3, "rebased")
    assert read_snapshot(spark, table).count() == 170
