"""Incremental append scan (operators/appends.py) + the table-appends
streaming source (sources/table_appends_datasource.py): version-range
file diffs must return exactly the appended rows, every non-append
commit in range must RAISE (silently re-reading compacted rows is a
correctness bug for an incremental consumer), and the streaming twin
must deliver one micro-batch per version under the rate limit, pick up
versions committed after the stream starts, and resume from the
checkpointed version offset without re-reading delivered rows."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from ml_pipelines_spark.operators.appends import (
    NonAppendHistoryError,
    appended_files,
    read_appends,
)
from ml_pipelines_spark.operators.manifest import (
    append_snapshot,
    write_manifest_table,
)


def _frame(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("x")
    )


@pytest.fixture()
def table3(spark):
    """v1 = 100 rows, v2 = +50, v3 = +10 (append-only)."""
    tbl = tempfile.mkdtemp(prefix="mlps_app_") + "/t"
    write_manifest_table(_frame(spark, 0, 100), tbl, "k", num_files=2)
    append_snapshot(_frame(spark, 100, 150), tbl, "k", num_files=2)
    append_snapshot(_frame(spark, 150, 160), tbl, "k", num_files=1)
    yield tbl
    shutil.rmtree(tbl.rsplit("/", 1)[0], ignore_errors=True)


def test_read_appends_ranges(spark, table3):
    assert read_appends(spark, table3, 0).count() == 160
    mid = read_appends(spark, table3, 1)
    assert mid.count() == 60
    assert {
        r["_commit_version"]
        for r in mid.select("_commit_version").distinct().collect()
    } == {2, 3}
    assert read_appends(spark, table3, 2, 3).count() == 10
    # empty range: zero rows, schema intact
    empty = read_appends(spark, table3, 3, 3)
    assert empty.count() == 0
    assert set(empty.columns) == {"k", "x", "_commit_version"}
    # rows exactly equal the later slices
    got = sorted(r["k"] for r in mid.collect())
    assert got == list(range(100, 160))


def test_appended_files_metadata(spark, table3):
    added, to_v = appended_files(spark, table3, 0)
    assert to_v == 3
    assert sum(r["n_rows"] for r in added) == 160
    assert {r["version"] for r in added} == {1, 2, 3}
    with pytest.raises(ValueError):
        appended_files(spark, table3, 5)


def test_compaction_in_range_raises(spark, table3):
    from ml_pipelines_spark.operators.manifest import compact_snapshot

    compact_snapshot(spark, table3, "k", target_rows=200)
    with pytest.raises(NonAppendHistoryError, match="removed"):
        read_appends(spark, table3, 1)
    # a span that ends before the compaction is still readable
    assert read_appends(spark, table3, 1, 3).count() == 60


def test_mor_delete_in_range_raises(spark, table3):
    from ml_pipelines_spark.operators.posdeletes import delete_where

    delete_where(spark, table3, F.col("k") % 10 == 0)
    with pytest.raises(NonAppendHistoryError, match="delete"):
        read_appends(spark, table3, 1)
    assert read_appends(spark, table3, 1, 3).count() == 60


def test_restore_in_range_raises(spark, table3):
    from ml_pipelines_spark.operators.manifest import restore_snapshot

    restore_snapshot(spark, table3, 1)
    with pytest.raises(NonAppendHistoryError, match="RESTORE"):
        read_appends(spark, table3, 1)


def test_schema_event_raises(spark, table3):
    from ml_pipelines_spark.operators.manifest import rename_column

    rename_column(spark, table3, "x", "y")
    with pytest.raises(NonAppendHistoryError, match="schema"):
        read_appends(spark, table3, 1)


def _drain(spark, reader, name):
    q = (
        reader.load()
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        batches = [
            p for p in q.recentProgress if p["numInputRows"] > 0
        ]
    finally:
        q.stop()
    return spark.table(name), batches


def test_stream_one_batch_per_version(spark, table3):
    from ml_pipelines_spark.sources.table_appends_datasource import (
        TableAppendsDataSource,
    )

    spark.dataSource.register(TableAppendsDataSource)
    out, batches = _drain(
        spark,
        spark.readStream.format("table_appends")
        .option("path", table3)
        .option("maxVersionsPerTrigger", 1),
        "tap_by_version",
    )
    assert len(batches) == 3
    per_v = {
        r["_commit_version"]: r["n"]
        for r in out.groupBy("_commit_version")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert per_v == {1: 100, 2: 50, 3: 10}
    spark.catalog.dropTempView("tap_by_version")


def test_stream_starting_version_and_live_append(spark, table3):
    from ml_pipelines_spark.sources.table_appends_datasource import (
        TableAppendsDataSource,
    )

    spark.dataSource.register(TableAppendsDataSource)
    name = "tap_live"
    q = (
        spark.readStream.format("table_appends")
        .option("path", table3)
        .option("startingVersion", 1)
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.table(name).count() == 60  # v2+v3 only
        append_snapshot(_frame(spark, 160, 170), table3, "k", num_files=1)
        q.processAllAvailable()
        rows = spark.table(name)
        assert rows.count() == 70
        assert (
            rows.filter(F.col("_commit_version") == 4).count() == 10
        )
    finally:
        q.stop()
    spark.catalog.dropTempView(name)


def test_stream_checkpoint_resume(spark, table3):
    from ml_pipelines_spark.sources.table_appends_datasource import (
        TableAppendsDataSource,
    )

    spark.dataSource.register(TableAppendsDataSource)
    ckpt = tempfile.mkdtemp(prefix="mlps_app_ck_")
    out_dir = tempfile.mkdtemp(prefix="mlps_app_out_")
    try:
        def run_once():
            q = (
                spark.readStream.format("table_appends")
                .option("path", table3)
                .load()
                .writeStream.format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()

        run_once()
        assert spark.read.parquet(out_dir).count() == 160
        # restart after a new commit: ONLY v4 flows (offset resumed)
        append_snapshot(_frame(spark, 160, 170), table3, "k", num_files=1)
        run_once()
        got = spark.read.parquet(out_dir)
        assert got.count() == 170
        assert (
            got.groupBy("_commit_version").count().filter(
                F.col("count") > 0
            ).count()
            == 4
        )
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(out_dir, ignore_errors=True)


def test_stream_refuses_non_append_span(spark, table3):
    from ml_pipelines_spark.operators.posdeletes import delete_where
    from ml_pipelines_spark.sources.table_appends_datasource import (
        TableAppendsDataSource,
    )

    delete_where(spark, table3, F.col("k") % 10 == 0)
    spark.dataSource.register(TableAppendsDataSource)
    q = (
        spark.readStream.format("table_appends")
        .option("path", table3)
        .load()
        .writeStream.format("memory")
        .queryName("tap_bad")
        .outputMode("append")
        .start()
    )
    try:
        with pytest.raises(Exception, match="delete|NonAppend"):
            q.processAllAvailable()
    finally:
        q.stop()
    # starting AFTER the delete commit is clean
    out, _ = _drain(
        spark,
        spark.readStream.format("table_appends")
        .option("path", table3)
        .option("startingVersion", 4),
        "tap_after",
    )
    assert out.count() == 0
    spark.catalog.dropTempView("tap_after")


def test_stream_refuses_restore_and_schema_event_spans(spark, table3):
    # _restores/_schema_events are FLAT sidecars (the version is a
    # column, not a v=N dir) — the streaming guard must read them,
    # not just list partitions (r12 self-review fix)
    from ml_pipelines_spark.operators.manifest import (
        rename_column,
        restore_snapshot,
    )
    from ml_pipelines_spark.sources.table_appends_datasource import (
        TableAppendsDataSource,
        _fs_and_root,
        _sidecar_versions_in,
    )

    restore_snapshot(spark, table3, 1)      # v4 (removes v2/v3 files)
    rename_column(spark, table3, "x", "y")  # v5 schema event
    fs, root = _fs_and_root(table3)
    assert _sidecar_versions_in(fs, root, "_restores", 0, 99) == [4]
    assert _sidecar_versions_in(fs, root, "_schema_events", 0, 99) == [5]
    assert _sidecar_versions_in(fs, root, "_restores", 4, 99) == []
    assert _sidecar_versions_in(fs, root, "_none_such", 0, 99) == []

    spark.dataSource.register(TableAppendsDataSource)
    # a span crossing the restore/rename must refuse (the guard now
    # fires BEFORE the file-removal fallback would)
    q = (
        spark.readStream.format("table_appends")
        .option("path", table3)
        .load()
        .writeStream.format("memory")
        .queryName("tap_rs")
        .outputMode("append")
        .start()
    )
    try:
        with pytest.raises(Exception, match="RESTORE|schema"):
            q.processAllAvailable()
    finally:
        q.stop()
