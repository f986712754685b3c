"""Manifest zone-map pruning + versioned snapshots: files outside the
band are skipped, results equal the unpruned filter, and earlier
snapshots stay readable (time travel)."""

from __future__ import annotations

import shutil
import tempfile

import pyspark.sql.functions as F

from ml_pipelines_spark.operators.manifest import (
    pruned_file_count,
    read_pruned,
    versions,
    write_manifest_table,
)


def test_manifest_prunes_files_and_preserves_results(spark):
    df = spark.range(0, 20000).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 20000).alias("x")
    )
    d = tempfile.mkdtemp(prefix="mlps_manifest_t_")
    try:
        assert write_manifest_table(df, d, "k", num_files=16) == 1
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
        assert empty.columns == ["k", "x"]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_manifest_snapshots_time_travel(spark):
    d = tempfile.mkdtemp(prefix="mlps_manifest_v_")
    try:
        v1 = spark.range(0, 1000).select(F.col("id").alias("k"))
        v2 = spark.range(5000, 5500).select(F.col("id").alias("k"))
        assert write_manifest_table(v1, d, "k", num_files=4) == 1
        assert write_manifest_table(v2, d, "k", num_files=4) == 2
        assert versions(spark, d) == [1, 2]
        # latest snapshot: only v2's domain exists
        assert read_pruned(spark, d, "k", 0, 10**6).count() == 500
        # time travel: v1 unchanged after the v2 write
        got_v1 = read_pruned(spark, d, "k", 0, 10**6, version=1)
        assert got_v1.count() == 1000
        # pruning works per snapshot
        kept, total = pruned_file_count(spark, d, 0, 100, version=1)
        assert total == 4 and kept == 1
        kept2, total2 = pruned_file_count(spark, d, 0, 100, version=2)
        assert total2 == 4 and kept2 == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_manifest_dir_is_invisible_to_snapshot_reads(spark):
    # the _manifest subdir must not leak rows into a plain read of a
    # snapshot's data directory
    df = spark.range(0, 100).select(F.col("id").alias("k"))
    d = tempfile.mkdtemp(prefix="mlps_manifest_i_")
    try:
        write_manifest_table(df, d, "k", num_files=4)
        snap = spark.read.parquet(f"{d}/v=1")
        assert snap.count() == 100
        assert snap.columns == ["k"]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_compact_snapshot_reduces_files_under_isolation(spark):
    d = tempfile.mkdtemp(prefix="mlps_manifest_c_")
    try:
        df = spark.range(0, 8000).select(F.col("id").alias("k"))
        write_manifest_table(df, d, "k", num_files=16)  # 16 tiny files
        from ml_pipelines_spark.operators.manifest import (
            compact_snapshot,
            read_snapshot,
        )

        v2 = compact_snapshot(spark, d, "k", target_rows=2000)
        assert v2 == 2
        kept, total = pruned_file_count(spark, d, 0, 10**9, version=2)
        assert total == 4  # 8000 rows / 2000-row target
        # same data, snapshot isolation: v1 still has 16 files
        assert read_snapshot(spark, d, 2).count() == 8000
        assert pruned_file_count(spark, d, 0, 10**9, version=1)[1] == 16
        # pruning on the compacted layout still works
        k2, t2 = pruned_file_count(spark, d, 0, 1000, version=2)
        assert k2 == 1 and t2 == 4
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_append_snapshot_is_metadata_only(spark):
    import os

    d = tempfile.mkdtemp(prefix="mlps_manifest_a_")
    try:
        from ml_pipelines_spark.operators.manifest import (
            append_snapshot,
            read_snapshot,
        )

        a = spark.range(0, 1000).select(F.col("id").alias("k"))
        b = spark.range(1000, 1500).select(F.col("id").alias("k"))
        assert append_snapshot(a, d, "k", num_files=4) == 1
        # capture v=1's data files, then append
        v1_files = sorted(
            os.path.join(r, f)
            for r, _, fs in os.walk(f"{d}/v=1")
            for f in fs
            if f.endswith(".parquet")
        )
        assert append_snapshot(b, d, "k", num_files=2) == 2
        # v1 data files untouched (metadata-only append)
        v1_after = sorted(
            os.path.join(r, f)
            for r, _, fs in os.walk(f"{d}/v=1")
            for f in fs
            if f.endswith(".parquet")
        )
        assert v1_files == v1_after
        # latest snapshot = union; v1 time-travels to just a
        assert read_snapshot(spark, d).count() == 1500
        assert read_snapshot(spark, d, 1).count() == 1000
        # manifest of v2 carries v1's files + 2 new ones
        kept, total = pruned_file_count(spark, d, 0, 10**9, version=2)
        assert total == 6
        # band pruning reaches across both generations
        kept2, _ = pruned_file_count(spark, d, 1000, 1240, version=2)
        assert kept2 == 1
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stream_append_sink_builds_snapshots(spark):
    import uuid

    from ml_pipelines_spark.operators.manifest import (
        read_snapshot,
        stream_append_sink,
        versions,
    )

    src_dir = tempfile.mkdtemp(prefix="mlps_manifest_src_")
    tbl = tempfile.mkdtemp(prefix="mlps_manifest_tbl_")
    ckpt = tempfile.mkdtemp(prefix="mlps_manifest_ck_") + f"/{uuid.uuid4().hex}"
    try:
        df = spark.range(0, 600).select(F.col("id").alias("k"))
        df.repartition(3).write.mode("overwrite").parquet(src_dir)
        schema = spark.read.parquet(src_dir).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src_dir)
        )
        q = stream_append_sink(stream, tbl, "k", ckpt, num_files=2)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        vs = versions(spark, tbl)
        assert len(vs) == 3  # one snapshot per micro-batch
        assert read_snapshot(spark, tbl).count() == 600
        # each earlier snapshot is a strict prefix of the ingest
        counts = [read_snapshot(spark, tbl, v).count() for v in vs]
        assert counts == sorted(counts) and counts[-1] == 600
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)
        shutil.rmtree(tbl, ignore_errors=True)


def test_merge_snapshot_rewrites_only_overlapping_files(spark):
    d = tempfile.mkdtemp(prefix="mlps_manifest_m_")
    try:
        from ml_pipelines_spark.operators.manifest import (
            merge_snapshot,
            read_snapshot,
        )

        base = spark.range(0, 8000).select(
            F.col("id").alias("k"), F.lit(1).alias("gen")
        )
        write_manifest_table(base, d, "k", num_files=16)
        # upsert a narrow band: half updates (keys exist), half inserts
        ups = spark.range(2000, 2500).select(
            F.col("id").alias("k"), F.lit(2).alias("gen")
        ).unionByName(
            spark.range(100000, 100100).select(
                F.col("id").alias("k"), F.lit(2).alias("gen")
            )
        )
        v2 = merge_snapshot(spark, d, "k", ups, num_files=2)
        assert v2 == 2
        snap = read_snapshot(spark, d, 2)
        assert snap.count() == 8000 + 100  # 500 replaced, 100 inserted
        gens = {r.k: r.gen for r in snap.filter("k >= 1990 and k < 2510").collect()}
        assert all(g == 2 for k, g in gens.items() if 2000 <= k < 2500)
        assert all(g == 1 for k, g in gens.items() if k < 2000 or k >= 2500)
        # carried files appear verbatim in the new manifest (same paths)
        m1 = {r["file"] for r in spark.read.parquet(f"{d}/_manifest").filter("v = 1").collect()}
        m2 = {r["file"] for r in spark.read.parquet(f"{d}/_manifest").filter("v = 2").collect()}
        carried = m1 & m2
        # the 100..(insert tail) band overlaps [2000, 100099]; files
        # fully below 2000 must be carried untouched
        assert len(carried) >= 3, (len(m1), len(m2), len(carried))
        # v1 time-travel unchanged
        assert read_snapshot(spark, d, 1).filter("gen = 2").count() == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_delete_tombstones_are_merge_on_read(spark):
    import os

    d = tempfile.mkdtemp(prefix="mlps_manifest_d_")
    try:
        from ml_pipelines_spark.operators.manifest import (
            compact_snapshot,
            delete_from_snapshot,
            read_pruned,
            read_snapshot,
        )

        base = spark.range(0, 2000).select(F.col("id").alias("k"))
        write_manifest_table(base, d, "k", num_files=8)
        files_before = sorted(
            os.path.join(r, f)
            for r, _, fs in os.walk(f"{d}/v=1")
            for f in fs
        )
        dels = spark.range(500, 600).select(F.col("id").alias("k"))
        v2 = delete_from_snapshot(spark, d, "k", dels)
        assert v2 == 2
        # zero data files touched
        files_after = sorted(
            os.path.join(r, f)
            for r, _, fs in os.walk(f"{d}/v=1")
            for f in fs
        )
        assert files_before == files_after
        # latest read excludes tombstoned keys; v1 time-travels them back
        assert read_snapshot(spark, d).count() == 1900
        assert read_snapshot(spark, d, 1).count() == 2000
        # pruned band read honors tombstones too
        assert read_pruned(spark, d, "k", 400, 700).count() == 201
        # compaction purges: rewrite drops the deleted rows for good
        v3 = compact_snapshot(spark, d, "k", target_rows=1000)
        assert read_snapshot(spark, d, v3).count() == 1900
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_tombstones_are_version_scoped_to_older_data(spark):
    """A delete applies only to data that existed when it was issued
    (Delta/Iceberg semantics): a later MERGE or append that re-inserts
    a deleted key must survive reads of the later snapshot, while the
    delete-time snapshot still time-travels correctly."""
    d = tempfile.mkdtemp(prefix="mlps_manifest_rs_")
    try:
        from ml_pipelines_spark.operators.manifest import (
            append_snapshot,
            compact_snapshot,
            delete_from_snapshot,
            merge_snapshot,
            read_pruned,
            read_snapshot,
        )

        base = spark.range(0, 100).select(
            F.col("id").alias("k"), F.lit("old").alias("tag")
        )
        write_manifest_table(base, d, "k", num_files=4)           # v1
        dels = spark.range(10, 20).select(F.col("id").alias("k"))
        delete_from_snapshot(spark, d, "k", dels)                 # v2
        assert read_snapshot(spark, d, 2).count() == 90
        # v3: MERGE re-inserts 5 of the deleted keys
        ups = spark.range(10, 15).select(
            F.col("id").alias("k"), F.lit("new").alias("tag")
        )
        v3 = merge_snapshot(spark, d, "k", ups, num_files=2)
        got = {
            (r.k, r.tag)
            for r in read_snapshot(spark, d, v3).filter("k < 25").collect()
        }
        expect = (
            {(k, "old") for k in range(10)}
            | {(k, "new") for k in range(10, 15)}
            | {(k, "old") for k in range(20, 25)}
        )
        assert got == expect
        assert read_snapshot(spark, d, v3).count() == 95
        # pruned band read agrees
        assert read_pruned(spark, d, "k", 0, 24, version=v3).count() == 20
        # time travel: the delete-time snapshot still hides all 10 keys
        assert read_snapshot(spark, d, 2).count() == 90
        # v4: plain append re-inserts 2 more deleted keys — survives too
        app = spark.range(15, 17).select(
            F.col("id").alias("k"), F.lit("app").alias("tag")
        )
        v4 = append_snapshot(app, d, "k", num_files=1)
        assert read_snapshot(spark, d, v4).count() == 97
        # a FRESH delete still removes a re-inserted key going forward
        v5 = delete_from_snapshot(
            spark, d, "k", spark.range(10, 11).select(F.col("id").alias("k"))
        )
        assert read_snapshot(spark, d, v5).count() == 96
        # compaction clears delete debt: after the rewrite every file's
        # origin is the compacted version, so no tombstone applies
        v6 = compact_snapshot(spark, d, "k", target_rows=1000)
        assert read_snapshot(spark, d, v6).count() == 96
        from ml_pipelines_spark.operators.manifest import _delete_keys

        assert _delete_keys(spark, d, v6, min_origin=v6) is None
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_manifest_list_two_tier_prunes_shards(spark):
    """Second tier: a narrow band opens only the manifest SHARDS whose
    aggregate bounds overlap — metadata for the rest of the table is
    never read — and the result still equals the unpruned filter."""
    from ml_pipelines_spark.operators.manifest import (
        build_manifest_list,
        pruned_shard_count,
        read_pruned_two_tier,
    )

    df = spark.range(0, 40000).select(
        F.col("id").alias("k"), (F.col("id") * 3 % 40000).alias("x")
    )
    d = tempfile.mkdtemp(prefix="mlps_manifest_2t_")
    try:
        assert write_manifest_table(df, d, "k", num_files=64) == 1
        n_shards = build_manifest_list(spark, d, num_shards=8)
        assert n_shards == 8
        lo, hi = 5000, 9000
        s_kept, s_total = pruned_shard_count(spark, d, lo, hi)
        assert s_total == 8
        # a 10% band over a range-sharded manifest: most shards skipped
        assert s_kept <= 3, f"shard pruning ineffective: {s_kept}/{s_total}"
        got = sorted(
            r.k
            for r in read_pruned_two_tier(spark, d, "k", lo, hi).collect()
        )
        assert got == list(range(lo, hi + 1))
        # two-tier result == one-tier result == plain filter
        one = sorted(r.k for r in read_pruned(spark, d, "k", lo, hi).collect())
        assert got == one
        # empty band outside the domain: zero shards opened
        assert pruned_shard_count(spark, d, 10**9, 2 * 10**9)[0] == 0
        empty = read_pruned_two_tier(spark, d, "k", 10**9, 2 * 10**9)
        assert empty.count() == 0
        assert empty.columns == ["k", "x"]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_manifest_list_honors_tombstones(spark):
    """The two-tier read path applies MoR tombstones exactly like the
    one-tier path: deleted keys inside the band are absent."""
    from ml_pipelines_spark.operators.manifest import (
        build_manifest_list,
        delete_from_snapshot,
        read_pruned_two_tier,
    )

    df = spark.range(0, 8000).select(F.col("id").alias("k"))
    d = tempfile.mkdtemp(prefix="mlps_manifest_2t_del_")
    try:
        write_manifest_table(df, d, "k", num_files=16)
        dels = spark.range(1000, 1100).select(F.col("id").alias("k"))
        v2 = delete_from_snapshot(spark, d, "k", dels)
        build_manifest_list(spark, d, version=v2, num_shards=4)
        got = sorted(
            r.k
            for r in read_pruned_two_tier(
                spark, d, "k", 900, 1200, version=v2
            ).collect()
        )
        assert got == list(range(900, 1000)) + list(range(1100, 1201))
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_schema_evolution_add_rename_drop(spark):
    """Metadata-only ALTER TABLE: add (with default), rename, drop —
    zero data files touched; per-origin event replay; time travel
    shows the pre-evolution schema."""
    from ml_pipelines_spark.operators.manifest import (
        add_column,
        append_snapshot,
        drop_column,
        read_snapshot_evolved,
        rename_column,
    )

    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("cents")
    )
    d = tempfile.mkdtemp(prefix="mlps_manifest_evo_")
    try:
        write_manifest_table(df, d, "k", num_files=4)
        import os

        files_v1 = {
            f for f in os.listdir(f"{d}/v=1") if f.endswith(".parquet")
        }
        v2 = add_column(spark, d, "channel", "string", "'store'")
        # new files carry the column physically
        batch = spark.range(100, 120).select(
            F.col("id").alias("k"),
            (F.col("id") * 2).alias("cents"),
            F.lit("web").alias("channel"),
        )
        append_snapshot(batch, d, "k", num_files=2)
        rename_column(spark, d, "cents", "price_cents")
        latest = read_snapshot_evolved(spark, d)
        assert set(latest.columns) == {"k", "price_cents", "channel"}
        rows = {r.k: (r.price_cents, r.channel) for r in latest.collect()}
        assert len(rows) == 120
        assert rows[5] == (10, "store")  # old rows read the default
        assert rows[110] == (220, "web")  # new rows keep their value
        # time travel to before the evolution: original schema
        v1 = read_snapshot_evolved(spark, d, version=1)
        assert set(v1.columns) == {"k", "cents"}
        # add/rename touched zero v=1 data files
        assert {
            f for f in os.listdir(f"{d}/v=1") if f.endswith(".parquet")
        } == files_v1
        # drop is metadata-only too
        drop_column(spark, d, "channel")
        assert set(read_snapshot_evolved(spark, d).columns) == {
            "k",
            "price_cents",
        }
        # the evolved reader at v2 sees the add but not the rename
        at_v2 = read_snapshot_evolved(spark, d, version=v2)
        assert set(at_v2.columns) == {"k", "cents", "channel"}
        assert all(r.channel == "store" for r in at_v2.collect())
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_schema_evolution_tombstones_across_rename(spark):
    """A MoR delete issued under the OLD key name still applies after
    the key column is renamed (tombstone keys forward-map through
    renames issued after the delete)."""
    from ml_pipelines_spark.operators.manifest import (
        delete_from_snapshot,
        read_snapshot_evolved,
        rename_column,
    )

    df = spark.range(0, 50).select(F.col("id").alias("k"))
    d = tempfile.mkdtemp(prefix="mlps_manifest_evo_del_")
    try:
        write_manifest_table(df, d, "k", num_files=4)
        dels = spark.range(10, 15).select(F.col("id").alias("k"))
        delete_from_snapshot(spark, d, "k", dels)
        rename_column(spark, d, "k", "key_id")
        got = sorted(r.key_id for r in read_snapshot_evolved(spark, d).collect())
        assert got == [x for x in range(50) if not (10 <= x < 15)]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_restore_snapshot_metadata_only(spark):
    """RESTORE rolls the table state back to an earlier version without
    reading or writing any data file; deletes and schema events issued
    after the source version stop applying; post-restore writes and
    deletes apply normally; full history still time-travels."""
    import os

    from ml_pipelines_spark.operators.manifest import (
        delete_from_snapshot,
        merge_snapshot,
        read_snapshot,
        restore_snapshot,
    )

    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("val")
    )
    d = tempfile.mkdtemp(prefix="mlps_manifest_restore_")
    try:
        write_manifest_table(df, d, "k", num_files=4)
        dirs_before = sorted(
            p for p in os.listdir(d) if p.startswith("v=")
        )
        # v2: upsert changes 50..59; v3: MoR delete 0..9
        upd = spark.range(50, 60).select(
            F.col("id").alias("k"), F.lit(-1).alias("val")
        )
        merge_snapshot(spark, d, "k", upd)
        dels = spark.range(0, 10).select(F.col("id").alias("k"))
        v3 = delete_from_snapshot(spark, d, "k", dels)
        assert read_snapshot(spark, d, v3).count() == 90
        # v4: restore to v1 — exact original state
        v4 = restore_snapshot(spark, d, 1)
        got = {r.k: r.val for r in read_snapshot(spark, d, v4).collect()}
        assert got == {k: k * 10 for k in range(100)}
        # metadata-only: no new data directory appeared for v4
        assert sorted(
            p
            for p in os.listdir(d)
            if p.startswith("v=") and p != "v=2"
        ) == dirs_before
        # intermediate history still time-travels
        at_v2 = {r.k: r.val for r in read_snapshot(spark, d, 2).collect()}
        assert at_v2[55] == -1 and len(at_v2) == 100
        assert read_snapshot(spark, d, v3).count() == 90
        # a FRESH delete after the restore applies
        delete_from_snapshot(
            spark, d, "k", spark.range(0, 5).select(F.col("id").alias("k"))
        )
        assert read_snapshot(spark, d).count() == 95
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_restore_shadows_schema_events(spark):
    """Restoring to a pre-rename version shows the original schema;
    ALTERs issued after the restore apply again."""
    from ml_pipelines_spark.operators.manifest import (
        add_column,
        read_snapshot_evolved,
        rename_column,
        restore_snapshot,
    )

    df = spark.range(0, 20).select(F.col("id").alias("k"))
    d = tempfile.mkdtemp(prefix="mlps_manifest_restore_schema_")
    try:
        write_manifest_table(df, d, "k", num_files=2)
        rename_column(spark, d, "k", "key_id")
        assert set(read_snapshot_evolved(spark, d).columns) == {"key_id"}
        restore_snapshot(spark, d, 1)
        assert set(read_snapshot_evolved(spark, d).columns) == {"k"}
        add_column(spark, d, "tag", "string", "'x'")
        assert set(read_snapshot_evolved(spark, d).columns) == {"k", "tag"}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_expire_snapshots_gc(spark):
    """EXPIRE drops old manifests (ending their time travel), deletes
    only UNREFERENCED data files (metadata-carried files survive), and
    purges dead tombstone sidecars after compaction."""
    import os

    import pytest

    from ml_pipelines_spark.operators.manifest import (
        append_snapshot,
        compact_snapshot,
        delete_from_snapshot,
        expire_snapshots,
        read_snapshot,
        versions,
    )

    df = spark.range(0, 100).select(F.col("id").alias("k"))
    d = tempfile.mkdtemp(prefix="mlps_manifest_expire_")
    try:
        write_manifest_table(df, d, "k", num_files=4)
        batch = spark.range(100, 120).select(F.col("id").alias("k"))
        append_snapshot(batch, d, "k", num_files=2)  # v2 carries v1 files
        # expire keeping v2 only: v1's manifest goes but its FILES stay
        # (v2's manifest references them)
        n_exp, n_del = expire_snapshots(spark, d, keep_last=1)
        assert (n_exp, n_del) == (1, 0)
        assert versions(spark, d) == [2]
        assert os.path.isdir(f"{d}/v=1")  # carried files survive
        assert read_snapshot(spark, d).count() == 120
        with pytest.raises(Exception):
            read_snapshot(spark, d, 1).count()
        # now delete + compact: compaction rewrites everything, so a
        # second expire reclaims v1/v2 data files AND the tombstones
        dels = spark.range(0, 10).select(F.col("id").alias("k"))
        delete_from_snapshot(spark, d, "k", dels)  # v3
        compact_snapshot(spark, d, "k", target_rows=60)  # v4
        n_exp, n_del = expire_snapshots(spark, d, keep_last=1)
        assert versions(spark, d) == [4]
        assert n_exp == 2 and n_del > 0
        assert not os.path.isdir(f"{d}/v=1")
        assert not os.path.isdir(f"{d}/v=2")
        assert not os.path.exists(f"{d}/_deletes/v=3")  # debt purged
        got = sorted(r.k for r in read_snapshot(spark, d).collect())
        assert got == list(range(10, 120))
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_write_audit_publish(spark):
    """Staged snapshots are invisible until published; a failed audit
    aborts without a trace; publish is a metadata rename that refuses
    stale stages."""
    import os

    import pytest

    from ml_pipelines_spark.operators.manifest import (
        abort_staged,
        delete_from_snapshot,
        publish_staged,
        read_snapshot,
        read_staged,
        stage_snapshot,
        versions,
    )

    df = spark.range(0, 50).select(F.col("id").alias("k"))
    d = tempfile.mkdtemp(prefix="mlps_manifest_wap_")
    try:
        write_manifest_table(df, d, "k", num_files=2)
        bad = spark.range(1000, 1020).select(F.col("id").alias("k"))
        sv = stage_snapshot(bad, d, "k", num_files=1)
        # invisible to readers
        assert versions(spark, d) == [1]
        assert read_snapshot(spark, d).count() == 50
        # audit sees the would-be state
        assert read_staged(spark, d, sv).count() == 70
        # audit fails -> abort removes data + staged manifest
        abort_staged(spark, d, sv)
        assert not os.path.isdir(f"{d}/v={sv}")
        assert versions(spark, d) == [1]
        # stage again, audit passes, publish
        good = spark.range(50, 70).select(F.col("id").alias("k"))
        sv2 = stage_snapshot(good, d, "k", num_files=1)
        assert publish_staged(spark, d, sv2) == sv2
        assert versions(spark, d) == [1, sv2]
        assert read_snapshot(spark, d).count() == 70
        # a pending stage HOLDS its version slot: now that the delete
        # path claims versions too (round 10), a concurrent delete
        # CONFLICTS instead of silently overtaking the stage
        from ml_pipelines_spark.operators.manifest import (
            CommitConflict,
            _release_claim,
        )

        sv3 = stage_snapshot(
            spark.range(70, 80).select(F.col("id").alias("k")), d, "k", 1
        )
        keys = spark.range(0, 5).select(F.col("id").alias("k"))
        with pytest.raises(CommitConflict):
            delete_from_snapshot(spark, d, "k", keys)
        # stale stage: simulate a CRASHED stage-holder (its claim
        # released, stage files left behind) — the table advances past
        # the slot, and publish must refuse the stale stage
        _release_claim(spark, d, sv3)
        delete_from_snapshot(spark, d, "k", keys)
        with pytest.raises(ValueError):
            publish_staged(spark, d, sv3)
        abort_staged(spark, d, sv3)
        assert read_snapshot(spark, d).count() == 65
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_tags_resolve_retag_and_drop(spark):
    """Named refs: tag/resolve/read-by-ref, last-write-wins retag,
    drop tombstones, clear errors on unknown names."""
    import pytest

    from ml_pipelines_spark.operators.manifest import (
        append_snapshot,
        drop_tag,
        list_tags,
        read_snapshot,
        resolve_ref,
        tag_snapshot,
        write_manifest_table,
    )

    d = tempfile.mkdtemp(prefix="mlps_tags_")
    try:
        base = spark.range(0, 100).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("val")
        )
        write_manifest_table(base, d, "k", num_files=2)
        append_snapshot(
            spark.range(100, 150).select(
                F.col("id").alias("k"), (F.col("id") * 2).alias("val")
            ),
            d,
            "k",
        )
        assert tag_snapshot(spark, d, "prod", version=1) == 1
        assert tag_snapshot(spark, d, "latest-good") == 2  # default latest
        assert list_tags(spark, d) == {"prod": 1, "latest-good": 2}
        assert read_snapshot(spark, d, ref="prod").count() == 100
        assert read_snapshot(spark, d, ref="latest-good").count() == 150
        # retag moves the name (last write wins)
        assert tag_snapshot(spark, d, "prod", version=2) == 2
        assert resolve_ref(spark, d, "prod") == 2
        drop_tag(spark, d, "latest-good")
        with pytest.raises(ValueError, match="latest-good"):
            resolve_ref(spark, d, "latest-good")
        with pytest.raises(ValueError, match="no tag"):
            drop_tag(spark, d, "never-existed")
        with pytest.raises(ValueError, match="no snapshot"):
            tag_snapshot(spark, d, "bad", version=99)
        with pytest.raises(ValueError, match="version OR ref"):
            read_snapshot(spark, d, version=1, ref="prod")
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_tagged_versions_survive_expire(spark):
    """The retention contract: expire_snapshots(keep_last=1) keeps a
    TAGGED old version readable (time travel by name intact), expires
    untagged ones, and collects the version once its tag is dropped."""
    import pytest

    from ml_pipelines_spark.operators.manifest import (
        append_snapshot,
        drop_tag,
        expire_snapshots,
        read_snapshot,
        tag_snapshot,
        versions,
        write_manifest_table,
    )

    d = tempfile.mkdtemp(prefix="mlps_tags_gc_")
    try:
        def rows(lo, hi):
            return spark.range(lo, hi).select(
                F.col("id").alias("k"), (F.col("id") * 2).alias("val")
            )

        write_manifest_table(rows(0, 100), d, "k", num_files=2)   # v1
        append_snapshot(rows(100, 150), d, "k")                   # v2
        append_snapshot(rows(150, 160), d, "k")                   # v3
        append_snapshot(rows(160, 200), d, "k")                   # v4
        tag_snapshot(spark, d, "prod", version=2)
        expired, _deleted = expire_snapshots(spark, d, keep_last=1)
        # v1 and v3 expire; v2 (tagged) and v4 (latest) are retained
        assert expired == 2
        assert versions(spark, d) == [2, 4]
        assert read_snapshot(spark, d, ref="prod").count() == 150
        assert read_snapshot(spark, d).count() == 200
        with pytest.raises(ValueError, match="no snapshot v=1"):
            read_snapshot(spark, d, version=1).count()
        # drop the tag: the next expire collects v2
        drop_tag(spark, d, "prod")
        expired, _ = expire_snapshots(spark, d, keep_last=1)
        assert expired == 1
        assert versions(spark, d) == [4]
        assert read_snapshot(spark, d).count() == 200
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_compaction_composes_with_schema_events(spark):
    """ADVICE r10 (medium): compact_small_files on a table with prior
    add/rename events must rewrite through the EVOLVED pipeline — the
    new files get origin = compaction version (replaying no events), so
    they must physically carry the current logical schema, while the
    untouched big file keeps replaying its events."""
    import os

    from ml_pipelines_spark.operators.manifest import (
        add_column,
        append_snapshot,
        compact_small_files,
        read_snapshot_evolved,
        rename_column,
    )

    d = tempfile.mkdtemp(prefix="mlps_compact_evo_")
    try:
        # one BIG file (stays), then alters, then small appended files
        big = spark.range(0, 900).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("cents")
        )
        write_manifest_table(big.coalesce(1), d, "k", num_files=1)
        add_column(spark, d, "channel", "string", "'store'")
        rename_column(spark, d, "cents", "price_cents")
        for lo in (900, 920):
            batch = spark.range(lo, lo + 20).select(
                F.col("id").alias("k"),
                (F.col("id") * 2).alias("price_cents"),
                F.lit("web").alias("channel"),
            )
            append_snapshot(batch.coalesce(1), d, "k", num_files=1)
        before = {
            r.k: (r.price_cents, r.channel)
            for r in read_snapshot_evolved(spark, d).collect()
        }
        v = compact_small_files(spark, d, "k", target_rows=100)
        after_df = read_snapshot_evolved(spark, d)
        assert set(after_df.columns) == {"k", "price_cents", "channel"}
        after = {
            r.k: (r.price_cents, r.channel) for r in after_df.collect()
        }
        assert after == before
        # the rewritten files physically carry the CURRENT schema
        import pyarrow.parquet as pq

        new_files = [
            f"{d}/v={v}/{f}"
            for f in os.listdir(f"{d}/v={v}")
            if f.endswith(".parquet")
        ]
        assert new_files
        for f in new_files:
            names = set(pq.read_schema(f).names)
            assert {"k", "price_cents", "channel"} <= names
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_full_compaction_composes_with_schema_events(spark):
    from ml_pipelines_spark.operators.manifest import (
        compact_snapshot,
        read_snapshot_evolved,
        rename_column,
    )

    d = tempfile.mkdtemp(prefix="mlps_compactfull_evo_")
    try:
        df = spark.range(0, 300).select(F.col("id").alias("k"))
        write_manifest_table(df, d, "k", num_files=3)
        rename_column(spark, d, "k", "key_id")
        compact_snapshot(spark, d, "key_id", target_rows=100)
        got = sorted(
            r.key_id for r in read_snapshot_evolved(spark, d).collect()
        )
        assert got == list(range(300))
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_merge_on_read_after_key_rename(spark):
    """ADVICE r10: the MoR victim scan reads old files through the
    evolved pipeline, so an upsert keyed by the CURRENT (renamed) name
    still finds and kills matched rows in pre-rename files."""
    from ml_pipelines_spark.operators.manifest import (
        read_snapshot_evolved,
        rename_column,
    )
    from ml_pipelines_spark.operators.posdeletes import merge_on_read

    d = tempfile.mkdtemp(prefix="mlps_mor_evo_")
    try:
        df = spark.range(0, 100).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("val")
        )
        write_manifest_table(df, d, "k", num_files=4)
        rename_column(spark, d, "k", "key_id")
        upd = spark.range(40, 45).select(
            F.col("id").alias("key_id"), F.lit(-1).alias("val")
        )
        merge_on_read(spark, d, upd, "key_id")
        got = {
            r.key_id: r.val
            for r in read_snapshot_evolved(spark, d).collect()
        }
        assert len(got) == 100
        assert all(got[k] == -1 for k in range(40, 45))
        assert got[39] == 390 and got[45] == 450
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_empty_key_delete_commits(spark):
    """Self-review r11: deleting an EMPTY key set writes no _deletes
    partition; the pre-commit verify must still commit the (no-op)
    version instead of raising CommitConflict forever."""
    from ml_pipelines_spark.operators.manifest import (
        delete_from_snapshot,
        read_snapshot,
    )

    d = tempfile.mkdtemp(prefix="mlps_emptydel_")
    try:
        base = spark.range(0, 40).select(F.col("id").alias("k"))
        write_manifest_table(base, d, "k", num_files=2)
        empty = spark.range(0, 0).select(F.col("id").alias("k"))
        v = delete_from_snapshot(spark, d, "k", empty)
        assert v == 2
        assert read_snapshot(spark, d).count() == 40
    finally:
        shutil.rmtree(d, ignore_errors=True)
