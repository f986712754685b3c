"""Structured Streaming equivalence: the same tumbling/session plans that
pass the batch oracle must produce identical results when fed through a
real file stream with a watermark."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from ml_pipelines_spark.queries.relational import t
from ml_pipelines_spark.streaming import read_stream, tumbling_agg


@pytest.fixture(scope="module")
def event_stream_dir(spark):
    """Events written as multiple parquet files into a temp dir —
    simulates a growing stream directory (3 micro-batch files)."""
    d = tempfile.mkdtemp(prefix="mlps_stream_")
    ev = t(spark, "/root/testdata/sf0.001", "events")
    ev.repartition(3).write.mode("overwrite").parquet(d)
    yield d, ev.schema
    shutil.rmtree(d, ignore_errors=True)


def test_tumbling_stream_matches_batch(spark, event_stream_dir):
    d, schema = event_stream_dir
    batch_df = spark.read.schema(schema).parquet(d)
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    ]
    expected = {
        (r["window"]["start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in tumbling_agg(batch_df, "ts", "1 hour", ["event_type"], aggs).collect()
    }

    stream = read_stream(spark, d, schema, max_files_per_trigger=1)
    out = tumbling_agg(
        stream, "ts", "1 hour", ["event_type"], aggs, watermark="1 day"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["window"]["start"], r["event_type"]): (r["n_events"], r["sum_value"])
            for r in spark.sql("SELECT * FROM tumbling_test").collect()
        }
    finally:
        q.stop()
    assert got == expected
    assert len(got) > 0
