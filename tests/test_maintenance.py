"""Table maintenance ops: small-file compaction (operators.layout.compact)
and keyed MERGE upsert (io.merge_upsert)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ml_pipelines_spark.io import merge_upsert
from ml_pipelines_spark.operators.layout import _list_data_files, compact


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_compact_unpartitioned(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(0, 10000).select("id", (F.col("id") % 7).alias("v"))
    df.repartition(64).write.parquet(path)
    before = _rows(spark.read.parquet(path))
    assert len(_list_data_files(spark, path)) >= 64

    stats = compact(spark, path, target_file_bytes=1 << 30)
    assert stats["files_after"] == 1
    assert stats["files_before"] >= 64
    assert _rows(spark.read.parquet(path)) == before


def test_compact_partitioned_preserves_layout(spark, tmp_path):
    path = str(tmp_path / "p")
    df = spark.range(0, 5000).select(
        "id", (F.col("id") % 4).alias("p"), (F.col("id") * 3).alias("v")
    )
    df.repartition(32).write.partitionBy("p").parquet(path)
    before = _rows(spark.read.parquet(path).select("id", "p", "v"))
    n_before = len(_list_data_files(spark, path))
    assert n_before >= 100  # 4 partitions x 32 writers

    stats = compact(
        spark, path, target_file_bytes=1 << 30, partition_cols=["p"]
    )
    # one file per hive partition once everything fits the target
    assert stats["files_after"] == 4
    assert _rows(spark.read.parquet(path).select("id", "p", "v")) == before
    # hive layout intact
    assert sorted(os.listdir(path))[:1] == ["p=0"] or any(
        d.startswith("p=") for d in os.listdir(path)
    )


def test_merge_upsert(spark, tmp_path):
    path = str(tmp_path / "m")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "c", 40)],
        ["k", "p", "v"],
    )
    base.write.partitionBy("p").parquet(path)
    untouched_before = {
        f for f, _ in _list_data_files(spark, path) if "/p=c/" in f
    }

    updates = spark.createDataFrame(
        [(2, "a", 99), (5, "b", 50)], ["k", "p", "v"]
    )
    merge_upsert(spark, path, updates, key_cols=["k"], partition_cols=["p"])

    got = _rows(spark.read.parquet(path).select("k", "p", "v"))
    assert got == [(1, "a", 10), (2, "a", 99), (3, "b", 30), (4, "c", 40), (5, "b", 50)]
    # partition c was neither read-rewritten nor deleted
    untouched_after = {
        f for f, _ in _list_data_files(spark, path) if "/p=c/" in f
    }
    assert untouched_after == untouched_before


def test_merge_upsert_idempotent(spark, tmp_path):
    path = str(tmp_path / "i")
    spark.createDataFrame([(1, "a", 1), (2, "b", 2)], ["k", "p", "v"]).write.partitionBy(
        "p"
    ).parquet(path)
    updates = spark.createDataFrame([(1, "a", 7)], ["k", "p", "v"])
    merge_upsert(spark, path, updates, ["k"], ["p"])
    merge_upsert(spark, path, updates, ["k"], ["p"])
    assert _rows(spark.read.parquet(path).select("k", "p", "v")) == [
        (1, "a", 7),
        (2, "b", 2),
    ]


def test_evolve_read_across_schema_generations(spark, tmp_path):
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from ml_pipelines_spark.io import evolve_read

    path = str(tmp_path / "evolve")
    # generation 1: (id, name) — 'name' later renamed to 'label'
    spark.createDataFrame([(1, "a"), (2, "b")], ["id", "name"]).write.parquet(path)
    # generation 2: (id, label, score) — renamed column + new column
    spark.createDataFrame(
        [(3, "c", 0.5)], ["id", "label", "score"]
    ).write.mode("append").parquet(path)

    target = StructType(
        [
            StructField("id", LongType()),
            StructField("label", StringType()),
            StructField("score", DoubleType()),
            StructField("source", StringType()),
        ]
    )
    got = sorted(
        tuple(r)
        for r in evolve_read(
            spark,
            path,
            target,
            renames={"name": "label"},
            defaults={"score": 0.0, "source": "legacy"},
        ).collect()
    )
    assert got == [
        (1, "a", 0.0, "legacy"),
        (2, "b", 0.0, "legacy"),
        (3, "c", 0.5, "legacy"),
    ]


def test_cdc_apply_latest_wins_and_partition_bound(spark, tmp_path):
    from pyspark.sql import functions as F

    from ml_pipelines_spark.io import cdc_apply

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "a"), (3, 30.0, "b"), (4, 40.0, "c")],
        "k long, v double, p string",
    )
    base.write.partitionBy("p").parquet(path)
    untouched_before = sorted(
        f for f, _ in _list_data_files(spark, path) if "/p=c/" in f
    )

    changes = spark.createDataFrame(
        [
            # k=1: U then D -> deleted (latest wins)
            (1, 11.0, "a", "U", 1),
            (1, 11.0, "a", "D", 2),
            # k=2: D then U -> survives with the update
            (2, 20.0, "a", "D", 1),
            (2, 25.0, "a", "U", 2),
            # k=3: plain update
            (3, 33.0, "b", "U", 1),
            # k=5: insert into partition b
            (5, 55.0, "b", "I", 1),
        ],
        "k long, v double, p string, op string, seq long",
    )
    cdc_apply(spark, path, changes, key_cols=["k"], partition_cols=["p"])
    got = {
        r["k"]: (r["v"], r["p"])
        for r in spark.read.parquet(path).collect()
    }
    assert got == {2: (25.0, "a"), 3: (33.0, "b"), 4: (40.0, "c"), 5: (55.0, "b")}

    # untouched partition files are bit-identical (never read or written)
    untouched_after = sorted(
        f for f, _ in _list_data_files(spark, path) if "/p=c/" in f
    )
    assert untouched_before == untouched_after

    # replaying the same batch is a no-op (same-seq delete outranks the
    # update of its own key; upserted rows re-assert their values)
    cdc_apply(spark, path, changes, key_cols=["k"], partition_cols=["p"])
    again = {
        r["k"]: (r["v"], r["p"])
        for r in spark.read.parquet(path).collect()
    }
    assert again == got
