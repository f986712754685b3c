"""RocksDB state-store backend seam (streaming/state_backend.py): the
same stateful operators must produce IDENTICAL results under the
default hash-map provider and the RocksDB provider, the context
manager must actually engage RocksDB (asserted via the query's
rocksdb* state-operator metrics, not just the conf), and the session
conf must be restored afterward. At sandbox volume RocksDB is the
slower path (JNI + serde with no memory pressure to relieve) — the
point of the seam is that production state >> heap flips that, and
the switch is one line."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from ml_pipelines_spark.queries.relational import t
from ml_pipelines_spark.streaming import (
    read_stream,
    rocksdb_state_conf,
    state_backend,
    stream_dedup,
)
from ml_pipelines_spark.streaming.state_backend import (
    _PROVIDER_KEY,
    ROCKSDB_PROVIDER,
)


@pytest.fixture(scope="module")
def dup_stream_dir(spark):
    """Events written TWICE (two files) — cross-batch duplicates."""
    d = tempfile.mkdtemp(prefix="mlps_rocks_")
    ev = t(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "event_type", "ts"
    )
    ev.coalesce(1).write.mode("append").parquet(d)
    ev.coalesce(1).write.mode("append").parquet(d)
    yield d, ev.schema, ev.count()
    shutil.rmtree(d, ignore_errors=True)


def _drain_dedup(spark, d, schema, name):
    stream = read_stream(spark, d, schema, max_files_per_trigger=1)
    deduped = stream_dedup(
        stream, keys=["event_id"], ts_col="ts", watermark="10 minutes"
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        progress = q.lastProgress
    finally:
        q.stop()
    rows = {
        (r["event_id"],)
        for r in spark.table(name).select("event_id").collect()
    }
    spark.catalog.dropTempView(name)
    return rows, progress


def test_rocksdb_dedup_matches_default_provider(spark, dup_stream_dir):
    d, schema, n_unique = dup_stream_dir
    base_rows, base_prog = _drain_dedup(spark, d, schema, "rb_base")
    with state_backend(spark, "rocksdb"):
        assert spark.conf.get(_PROVIDER_KEY) == ROCKSDB_PROVIDER
        rocks_rows, rocks_prog = _drain_dedup(spark, d, schema, "rb_rocks")
    # identical dedup output, equal to the distinct key count
    assert rocks_rows == base_rows
    assert len(rocks_rows) == n_unique
    # RocksDB actually engaged: its state-operator custom metrics are
    # rocksdb*-prefixed; the hash-map provider has none of them
    rocks_metrics = rocks_prog["stateOperators"][0]["customMetrics"]
    assert any(k.startswith("rocksdb") for k in rocks_metrics), rocks_metrics
    base_metrics = base_prog["stateOperators"][0]["customMetrics"]
    assert not any(k.startswith("rocksdb") for k in base_metrics)


@pytest.mark.slow  # alternative-state-backend equivalence (~8s)
def test_rocksdb_sessionize_matches_default_provider(spark, dup_stream_dir):
    # the custom applyInPandasWithState sessionizer under RocksDB:
    # closed sessions must be bit-identical to the default provider's
    from ml_pipelines_spark.streaming import sessionize_with_timeout

    ev = t(spark, "/root/testdata/sf0.001", "events").select(
        F.col("user_id").cast("string").alias("key"),
        F.col("ts").cast("timestamp").alias("ts"),
    )
    d = tempfile.mkdtemp(prefix="mlps_rocksess_")
    try:
        ev.coalesce(1).write.mode("overwrite").parquet(d)
        sentinel = spark.createDataFrame(
            [("__s__", "2030-01-01 00:00:00")], ["key", "ts"]
        ).select("key", F.col("ts").cast("timestamp").alias("ts"))
        sentinel.repartition(1).write.mode("append").parquet(d)

        def run(name):
            stream = (
                spark.readStream.schema(spark.read.parquet(d).schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(d)
            )
            out = sessionize_with_timeout(
                stream, "key", "ts", gap_minutes=360, watermark="1 minute"
            )
            q = (
                out.writeStream.format("memory")
                .queryName(name)
                .outputMode("append")
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
            rows = frozenset(
                map(tuple, spark.table(name).collect())
            )
            spark.catalog.dropTempView(name)
            return rows

        base = run("sess_base")
        with state_backend(spark, "rocksdb", bounded_memory_mb=256):
            rocks = run("sess_rocks")
        assert base == rocks
        assert len(base) > 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_state_backend_restores_conf(spark):
    try:
        before = spark.conf.get(_PROVIDER_KEY)
    except Exception:
        before = None
    with state_backend(spark, "rocksdb", bounded_memory_mb=128):
        conf = rocksdb_state_conf(bounded_memory_mb=128)
        for k, v in conf.items():
            assert spark.conf.get(k) == v
    try:
        after = spark.conf.get(_PROVIDER_KEY)
    except Exception:
        after = None
    assert after == before
    with pytest.raises(ValueError):
        with state_backend(spark, "lmdb"):
            pass
