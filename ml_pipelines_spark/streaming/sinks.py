"""Streaming maintenance sinks — foreachBatch wiring from a stream into
the incremental-maintenance operators.

Structured Streaming's file/kafka sinks are append-only; maintaining a
KEYED table (a rollup that must update in place) needs foreachBatch: each
micro-batch runs a normal batch job against the stored table. Pairing it
with ``operators.incremental.incremental_rollup`` gives the standing
100 TB ingest shape — events stream in, only the touched dates are
re-aggregated and rewritten, history partitions never read.

Exactly-once caveat, stated rather than hidden: foreachBatch is
at-least-once on retry. ``incremental_rollup`` folds deltas, so a
replayed batch would double-count; production retry-safety needs a
processed-batch-id ledger next to the table (checked here, one tiny
read) — the same idempotence ledger any foreachBatch upsert uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.incremental import incremental_rollup, init_rollup


def rollup_stream_sink(
    stream_events: DataFrame,
    rollup_path: str,
    checkpoint_dir: str,
):
    """Start a streaming query that folds each micro-batch of events into
    the stored rollup at ``rollup_path``. Returns the StreamingQuery.

    Batch ids already applied are recorded under
    ``<rollup_path>/_applied_batches`` so a retried micro-batch is a
    no-op instead of a double-count.
    """
    ledger = rollup_path.rstrip("/") + "/_applied_batches"

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        mark = f"{ledger}/batch={batch_id}"
        if _exists(spark, mark):
            return
        if not _exists(spark, rollup_path.rstrip("/") + "/_SUCCESS") and not _has_partitions(
            spark, rollup_path
        ):
            init_rollup(batch_df, rollup_path)
        else:
            incremental_rollup(spark, rollup_path, batch_df)
        _touch(spark, mark)

    return (
        stream_events.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath, jvm


def _exists(spark: SparkSession, path: str) -> bool:
    fs, hpath, _ = _fs(spark, path)
    return fs.exists(hpath)


def _has_partitions(spark: SparkSession, path: str) -> bool:
    fs, hpath, _ = _fs(spark, path)
    if not fs.exists(hpath):
        return False
    for st in fs.listStatus(hpath):
        if st.getPath().getName().startswith("event_date="):
            return True
    return False


def _touch(spark: SparkSession, path: str) -> None:
    fs, hpath, _ = _fs(spark, path)
    fs.mkdirs(hpath)
