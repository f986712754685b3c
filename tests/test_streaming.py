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


def test_running_totals_state_accumulates(spark, event_stream_dir):
    """applyInPandasWithState carries per-key state across micro-batches:
    lifetime totals after draining the stream must equal the batch
    aggregate, while per-batch counts stay partial."""
    from ml_pipelines_spark.streaming import running_totals

    d, schema = event_stream_dir
    batch_df = spark.read.schema(schema).parquet(d)
    expected = {
        r["event_type"]: (r["n"], round(r["total"], 2))
        for r in batch_df.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }

    stream = read_stream(spark, d, schema, max_files_per_trigger=1)
    out = running_totals(stream, "event_type", "value")
    q = (
        out.writeStream.format("memory")
        .queryName("running_totals_test")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT * FROM running_totals_test"
        ).collect()
    finally:
        q.stop()
    # one emission per key per micro-batch (3 files) → last emission per
    # key holds the lifetime totals
    last = {}
    for r in rows:
        last[r["event_type"]] = (r["total_events"], round(r["total_value"], 2))
    assert last == expected
    per_key_emissions = {}
    for r in rows:
        per_key_emissions.setdefault(r["event_type"], []).append(r["batch_events"])
    # state accumulated across more than one batch for at least one key
    assert any(len(v) > 1 for v in per_key_emissions.values())


def test_stream_dedup_first_wins(spark, event_stream_dir):
    from ml_pipelines_spark.streaming import stream_dedup

    d, schema = event_stream_dir
    stream = read_stream(spark, d, schema, max_files_per_trigger=1)
    out = stream_dedup(stream, ["user_id"], "ts", "1 day")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT user_id, count(*) AS c FROM dedup_test GROUP BY 1").collect()
    finally:
        q.stop()
    assert len(got) > 0
    assert all(r["c"] == 1 for r in got)


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


def test_enrich_stream_matches_batch_join(spark, event_stream_dir):
    """Stream-static join: draining the file stream through the
    enrichment join must equal the batch join, including dim misses
    (left join keeps unmatched stream rows with nulls)."""
    import tempfile

    from ml_pipelines_spark.streaming.windows import enrich_stream

    d, schema = event_stream_dir
    ev = t(spark, "/root/testdata/sf0.001", "events")
    # dimension covering only half the users -> exercises left-join misses
    dim = (
        ev.select("user_id").distinct()
        .filter(F.col("user_id") % 2 == 0)
        .withColumn("segment", F.concat(F.lit("seg_"), F.col("user_id") % 3))
    )
    expected = sorted(
        (r["event_id"], r["segment"])
        for r in ev.join(F.broadcast(dim), "user_id", "left")
        .select("event_id", "segment")
        .collect()
    )

    stream = read_stream(spark, d, schema)
    enriched = enrich_stream(stream, dim, on="user_id", how="left")
    out_rows = []

    def sink(batch_df, _bid):
        out_rows.extend(batch_df.select("event_id", "segment").collect())

    q = (
        enriched.writeStream.foreachBatch(sink)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="mlps_ck_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted((r["event_id"], r["segment"]) for r in out_rows)
    assert got == expected


def test_stream_stream_interval_join_matches_batch(spark, event_stream_dir):
    """Both sides streaming: clicks joined to purchase windows must
    equal the batch bin-bucketed range join over the same data."""
    import tempfile

    from ml_pipelines_spark.operators.rangejoin import range_join
    from ml_pipelines_spark.streaming.joins import interval_join_streams

    d, schema = event_stream_dir
    ev = t(spark, "/root/testdata/sf0.001", "events")
    iv_batch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("interval_id"),
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 1 DAY")).alias("end_ts"),
    )
    pt_batch = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("point_id"), "ts"
    )
    expected = sorted(
        (r["point_id"], r["interval_id"])
        for r in range_join(
            pt_batch, iv_batch, ["user_id"], "ts", "start_ts", "end_ts",
            bin_width=86400,
        ).collect()
    )

    stream = read_stream(spark, d, schema)
    iv_s = stream.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("interval_id"),
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 1 DAY")).alias("end_ts"),
    )
    pt_s = read_stream(spark, d, schema).filter(
        F.col("event_type") == "click"
    ).select("user_id", F.col("event_id").alias("point_id"), "ts")
    joined = interval_join_streams(
        pt_s, iv_s, ["user_id"], "ts", "start_ts", "end_ts",
        point_watermark="365 days", interval_watermark="365 days",
    )
    out = []

    def sink(batch_df, _bid):
        out.extend(batch_df.select("point_id", "interval_id").collect())

    q = (
        joined.writeStream.foreachBatch(sink)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="mlps_ck_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert sorted((r["point_id"], r["interval_id"]) for r in out) == expected


@pytest.mark.slow  # streaming-vs-batch equivalence soak (~32s)
def test_rollup_stream_sink_matches_batch(spark, event_stream_dir):
    """foreachBatch + incremental_rollup over a 3-file stream must leave
    the stored rollup equal to the single-shot batch rollup."""
    import tempfile

    from ml_pipelines_spark.operators.incremental import _rollup, read_rollup
    from ml_pipelines_spark.streaming.sinks import rollup_stream_sink

    d, schema = event_stream_dir
    rollup_dir = tempfile.mkdtemp(prefix="mlps_rollup_")
    ckpt = tempfile.mkdtemp(prefix="mlps_ckpt_")
    stream = read_stream(spark, d, schema, max_files_per_trigger=1)
    q = rollup_stream_sink(stream, rollup_dir, ckpt)
    q.awaitTermination(120)

    events = t(spark, "/root/testdata/sf0.001", "events")
    cols = ["event_date", "event_type", "n_events", "sum_value"]
    got = sorted(
        tuple(r)
        for r in read_rollup(spark, rollup_dir)
        .withColumn("sum_value", F.round("sum_value", 6))
        .select(*cols)
        .collect()
    )
    want = sorted(
        tuple(r)
        for r in _rollup(events)
        .withColumn("sum_value", F.round("sum_value", 6))
        .select(*cols)
        .collect()
    )
    assert got == want

    shutil.rmtree(rollup_dir, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)


class TestTransformWithStateSeam:
    """Spark 4 transformWithStateInPandas — capability-gated twin of
    running_totals. The TWS driver worker needs google.protobuf (absent
    in this container), so the seam test asserts whichever branch this
    runtime has: a real replay equivalence when available, the
    documented up-front RuntimeError otherwise (never a crashed stream).
    """

    def test_tws_branch(self, spark, sf_dir):
        import pytest as _pytest

        from ml_pipelines_spark.streaming import (
            running_totals_tws,
            tws_available,
        )

        ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
            "event_type", "value"
        )
        if not tws_available():
            with _pytest.raises(RuntimeError, match="google.protobuf"):
                running_totals_tws(ev, "event_type", "value")
            return
        # Real branch: 2-file replay, lifetime totals == batch aggregate.
        import tempfile
        import uuid

        import pyspark.sql.functions as F

        d = tempfile.mkdtemp(prefix="mlps_tws_t_")
        name = f"twst_{uuid.uuid4().hex}"
        ev.repartition(2).write.mode("overwrite").parquet(d)
        schema = spark.read.parquet(d).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(d)
        )
        out = running_totals_tws(stream, "event_type", "value")
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = {
            r["event_type"]: r["total_events"]
            for r in spark.table(name)
            .groupBy("event_type")
            .agg(F.max("total_events").alias("total_events"))
            .collect()
        }
        want = {
            r["event_type"]: r["n"]
            for r in ev.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert got == want


@pytest.mark.slow  # stateful outer-join soak (~26s)
def test_outer_interval_join_matches_batch_left_join(spark, sf_dir):
    # Stored-interval form: unmatched points emit null-padded once both
    # watermarks pass their window; a far-future sentinel drains the
    # tail in the finite replay.
    import shutil
    import tempfile
    import time
    import uuid

    import pyspark.sql.functions as F

    from ml_pipelines_spark.streaming.joins import (
        outer_interval_join_streams,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type"
    )
    points = ev.filter("event_type = 'click'").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    intervals = ev.filter("event_type = 'purchase'").select(
        "user_id",
        F.col("ts").alias("i_start"),
        (F.col("ts") + F.expr("INTERVAL 12 HOURS")).alias("i_end"),
    )
    d1 = tempfile.mkdtemp(prefix="mlps_oij_p_")
    d2 = tempfile.mkdtemp(prefix="mlps_oij_i_")
    name = f"oij_{uuid.uuid4().hex}"
    try:
        points.repartition(2).write.mode("overwrite").parquet(d1)
        intervals.repartition(2).write.mode("overwrite").parquet(d2)
        sp = spark.createDataFrame(
            [(-1, "2030-01-01 00:00:00")], ["user_id", "p_ts"]
        ).select("user_id", F.col("p_ts").cast("timestamp").alias("p_ts"))
        si = spark.createDataFrame(
            [(-1, "2030-01-01 00:00:00", "2030-01-01 00:00:01")],
            ["user_id", "i_start", "i_end"],
        ).select(
            "user_id",
            F.col("i_start").cast("timestamp").alias("i_start"),
            F.col("i_end").cast("timestamp").alias("i_end"),
        )
        time.sleep(1.1)
        sp.coalesce(1).write.mode("append").parquet(d1)
        si.coalesce(1).write.mode("append").parquet(d2)
        s1 = (
            spark.readStream.schema(spark.read.parquet(d1).schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(d1)
        )
        s2 = (
            spark.readStream.schema(spark.read.parquet(d2).schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(d2)
        )
        out = outer_interval_join_streams(
            s1,
            s2,
            key_cols=["user_id"],
            point_ts="p_ts",
            start_ts="i_start",
            end_ts="i_end",
            point_watermark="1 hour",
            interval_watermark="1 hour",
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
        got = (
            spark.table(name)
            .filter("user_id >= 0")
            .groupBy()
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.when(F.col("i_start").isNull(), 1).otherwise(0)
                ).alias("unmatched"),
            )
            .collect()[0]
        )
        ip, ii = points.alias("p"), intervals.alias("i")
        ref = ip.join(
            ii,
            (F.col("p.user_id") == F.col("i.user_id"))
            & (F.col("p_ts") >= F.col("i_start"))
            & (F.col("p_ts") < F.col("i_end")),
            "left",
        )
        want_n = ref.count()
        want_unmatched = ref.filter(F.col("i_start").isNull()).count()
        assert (got.n, got.unmatched) == (want_n, want_unmatched)
    finally:
        shutil.rmtree(d1, ignore_errors=True)
        shutil.rmtree(d2, ignore_errors=True)
        try:
            spark.catalog.dropTempView(name)
        except Exception:
            pass


def test_dedup_within_watermark_suppresses_retries(spark, tmp_path):
    # duplicates with DIFFERENT event times (retries) must be dropped —
    # the case plain dropDuplicates on (key, ts) cannot handle
    import uuid

    import pyspark.sql.functions as F

    from ml_pipelines_spark.streaming import stateful

    rows = [
        ("a", "2024-01-01 10:00:00"),
        ("a", "2024-01-01 10:00:05"),  # retry, later event time
        ("b", "2024-01-01 10:00:01"),
        ("b", "2024-01-01 10:00:02"),  # retry
        ("c", "2024-01-01 10:00:03"),
    ]
    df = spark.createDataFrame(rows, ["k", "ts"]).select(
        "k", F.col("ts").cast("timestamp").alias("ts")
    )
    d = str(tmp_path / "ddw")
    df.coalesce(1).write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(
        spark.read.parquet(d).schema
    ).parquet(d)
    out = stateful.stream_dedup_within_watermark(
        stream, ["k"], "ts", "10 minutes"
    )
    name = f"ddw_{uuid.uuid4().hex}"
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
    got = sorted(r.k for r in spark.table(name).collect())
    assert got == ["a", "b", "c"]


def test_sessionize_with_timeout_emits_on_watermark(spark, tmp_path):
    # two micro-batches: user x's first session must EMIT via the
    # event-time timeout once batch 2's sentinel advances the watermark
    # past its gap deadline — not because more x-data arrived.
    import uuid

    import pyspark.sql.functions as F

    from ml_pipelines_spark.streaming.stateful import sessionize_with_timeout

    b1 = [
        ("x", "2024-01-01 10:00:00"),
        ("x", "2024-01-01 10:05:00"),
        ("y", "2024-01-01 10:02:00"),
    ]
    b2 = [("z", "2024-01-02 09:00:00")]  # watermark pusher
    d = str(tmp_path / "sess")
    import time

    mk = lambda rows: spark.createDataFrame(rows, ["key", "ts"]).select(  # noqa: E731
        "key", F.col("ts").cast("timestamp").alias("ts")
    )
    mk(b1).coalesce(1).write.mode("overwrite").parquet(d)
    time.sleep(1.1)
    mk(b2).coalesce(1).write.mode("append").parquet(d)
    stream = (
        spark.readStream.schema(spark.read.parquet(d).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    out = sessionize_with_timeout(
        stream, "key", "ts", gap_minutes=30, watermark="1 minute"
    )
    name = f"sto_{uuid.uuid4().hex}"
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
    got = {
        r.key: (str(r.session_start), str(r.session_end), r.n_events)
        for r in spark.table(name).collect()
    }
    assert got.get("x") == (
        "2024-01-01 10:00:00",
        "2024-01-01 10:05:00",
        2,
    ), got
    assert got.get("y") == (
        "2024-01-01 10:02:00",
        "2024-01-01 10:02:00",
        1,
    ), got
