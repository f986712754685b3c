"""Event-time window queries over the events table (batch mode — the
same plans run under readStream + watermark; tests/test_streaming.py
proves batch/stream equivalence on a real file stream).

Oracle mapping: tumbling = date_trunc; sliding = each event expanded to
its duration/slide covering windows; session = gaps-and-islands with the
same gap, end = last event + gap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.windows import session_agg, sliding_agg, tumbling_agg
from .registry import query
from .relational import t


def _stamp_replay_wave(dirs, wave: int, seen: set) -> None:
    """Pin FileStreamSource's oldest-modification-first ordering for a
    replay WITHOUT sleeping: stamp the wave's part-files with a
    synthetic, strictly increasing mtime (fixed past epoch + wave; the
    source compares modification time only). The old shape slept 1.1 s
    between waves so filesystem mtimes would tick — pure wall-clock on
    every replay query, ~1-2 s each at sf0.1 (r12 stream profiling).
    Only files not seen in an earlier wave are stamped, so re-appending
    into the same directory keeps earlier waves strictly older."""
    import os

    base = 1_700_000_000 + wave * 100
    for d in dirs if isinstance(dirs, (list, tuple)) else [dirs]:
        for root, _, files in os.walk(d):
            for f in files:
                p = os.path.join(root, f)
                if p in seen or not f.endswith(".parquet"):
                    continue
                os.utime(p, (base, base))
                seen.add(p)

_TS_FMT = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_US = "yyyy-MM-dd HH:mm:ss.SSSSSS"


@query(
    "tumbling_window",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    out = tumbling_agg(
        ev,
        "ts",
        "1 hour",
        keys=["event_type"],
        aggs=[
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        ],
    )
    return out.select(
        F.date_format("window.start", _TS_FMT).alias("window_start"),
        "event_type",
        "n_events",
        "sum_value",
    )


@query(
    "sliding_window",
    """
    WITH expanded AS (
        SELECT u.ws AS window_start, value
        FROM events,
             UNNEST([date_trunc('hour', ts) + INTERVAL (CASE WHEN minute(ts) >= 30 THEN 30 ELSE 0 END) MINUTE,
                     date_trunc('hour', ts) + INTERVAL (CASE WHEN minute(ts) >= 30 THEN 0 ELSE -30 END) MINUTE]) AS u(ws)
    )
    SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM expanded
    GROUP BY 1
    """,
)
def sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    out = sliding_agg(
        ev,
        "ts",
        duration="1 hour",
        slide="30 minutes",
        keys=[],
        aggs=[
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        ],
    )
    return out.select(
        F.date_format("window.start", _TS_FMT).alias("window_start"),
        "n_events",
        "sum_value",
    )


@query(
    "session_window",
    """
    WITH ordered AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 6 HOUR
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    tagged AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM ordered
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           strftime(MAX(ts) + INTERVAL 6 HOUR, '%Y-%m-%d %H:%M:%S.%f') AS session_end,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM tagged
    GROUP BY user_id, session_id
    """,
)
def session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    out = session_agg(
        ev,
        "ts",
        gap="6 hours",
        keys=["user_id"],
        aggs=[
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        ],
    )
    return out.select(
        "user_id",
        F.date_format("session_window.start", _TS_FMT_US).alias("session_start"),
        F.date_format("session_window.end", _TS_FMT_US).alias("session_end"),
        "n_events",
        "sum_value",
    )


# ---------------------------------------------------------------------------
# REAL stateful stream in the correctness gate: unlike the batch-twin
# window queries above, this one actually starts a Structured Streaming
# job — events replayed as a 2-file stream, one micro-batch per file,
# through the applyInPandasWithState running-totals operator — and
# returns the final per-key state. The oracle is the plain batch
# aggregate: if state were dropped, double-counted, or keys mixed across
# batches, lifetime totals would diverge from it. (Temp stream dir +
# memory sink are per-invocation and cleaned up; totals are
# batch-split-invariant, so the result is deterministic.)
# ---------------------------------------------------------------------------
@query(
    "stream_running_totals",
    """
    SELECT event_type,
           COUNT(*) AS total_events,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY event_type
    """,
)
def stream_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile
    import uuid

    from ..streaming import read_stream, running_totals

    ev = t(spark, sf_dir, "events").select("event_type", "value")
    d = tempfile.mkdtemp(prefix="mlps_srt_")
    name = f"srt_{uuid.uuid4().hex}"
    # streaming-aggregate state: pin to 4 partitions for the finite
    # replay (commits x partitions x triggers dominate at this volume)
    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        ev.repartition(2).write.mode("overwrite").parquet(d)
        schema = spark.read.parquet(d).schema
        stream = read_stream(spark, d, schema, max_files_per_trigger=1)
        out = running_totals(stream, "event_type", "value")
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
        # Last emission per key (total_events is strictly increasing
        # across a key's emissions) holds the lifetime totals.
        final = (
            spark.table(name)
            .groupBy("event_type")
            .agg(
                F.max("total_events").alias("total_events"),
                F.max_by("total_value", "total_events").alias("__tv"),
            )
            .select(
                "event_type",
                "total_events",
                F.round("__tv", 2).alias("total_value"),
            )
        )
        # Materialize before the temp dir and memory table go away.
        rows = final.collect()
        return spark.createDataFrame(rows, final.schema)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_sp)
        shutil.rmtree(d, ignore_errors=True)
        try:
            spark.catalog.dropTempView(name)
        except Exception:
            pass  # memory-sink table may not exist if the stream failed


# ---------------------------------------------------------------------------
# Cross-micro-batch stream dedup in the oracle gate: the events file is
# written TWICE into the stream directory (two identical-content
# batches, one per trigger), pushed through the watermarked
# dropDuplicates state, and the surviving rows must equal the original
# table exactly — duplicate suppression across batch boundaries is the
# whole point, and a state bug (eviction too early, key mixing) changes
# the counts. Batch-split-invariant, so the result is deterministic.
# ---------------------------------------------------------------------------
@query(
    "stream_dedup_replay",
    """
    SELECT event_type, COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def stream_dedup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile
    import uuid

    from ..streaming import read_stream, stream_dedup

    ev = t(spark, sf_dir, "events").select("event_id", "event_type", "ts")
    d = tempfile.mkdtemp(prefix="mlps_sdr_")
    name = f"sdr_{uuid.uuid4().hex}"
    # dropDuplicates state: pin to 4 partitions for the finite replay
    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        # same rows written twice -> two files -> two identical batches
        ev.coalesce(1).write.mode("append").parquet(d)
        ev.coalesce(1).write.mode("append").parquet(d)
        schema = spark.read.parquet(d).schema
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
        finally:
            q.stop()
        out = (
            spark.table(name)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"))
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_sp)
        shutil.rmtree(d, ignore_errors=True)
        try:
            spark.catalog.dropTempView(name)
        except Exception:
            pass


# ---------------------------------------------------------------------------
# Stream-static enrichment join under replay: events stream in as two
# micro-batches and every batch joins the broadcast customer dimension
# (streaming.windows.enrich_stream) — the state-free enrichment shape
# that at 100 TB beats a stream-stream join whenever the dimension is
# orders of magnitude smaller than the stream. The memory sink captures
# each batch's APPEND output; the final rollup over the captured rows
# must equal the batch join+aggregate the oracle computes — a dropped
# batch, a double-joined row, or a missed dimension key all diverge.
# ---------------------------------------------------------------------------
@query(
    "stream_enrich_replay",
    """
    SELECT e.event_type, c.c_mktsegment AS segment,
           COUNT(*) AS n_events,
           ROUND(SUM(e.value), 2) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY e.event_type, c.c_mktsegment
    """,
)
def stream_enrich_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile
    import uuid

    from ..streaming import enrich_stream, read_stream

    ev = t(spark, sf_dir, "events").select("user_id", "event_type", "value")
    cust = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    d = tempfile.mkdtemp(prefix="mlps_ser_")
    name = f"ser_{uuid.uuid4().hex}"
    try:
        ev.repartition(2).write.mode("overwrite").parquet(d)
        schema = spark.read.parquet(d).schema
        stream = read_stream(spark, d, schema, max_files_per_trigger=1)
        enriched = enrich_stream(stream, cust, on="user_id", how="inner")
        q = (
            enriched.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        final = (
            spark.table(name)
            .groupBy("event_type", F.col("c_mktsegment").alias("segment"))
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 2).alias("total_value"),
            )
        )
        rows = final.collect()
        return spark.createDataFrame(rows, final.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)
        try:
            spark.catalog.dropTempView(name)
        except Exception:
            pass


# ---------------------------------------------------------------------------
# Stream-STREAM interval join under replay — the attribution shape
# ("purchases within 24h of a signup"), both sides streaming with
# event-time watermarks (streaming.joins.interval_join_streams). The
# range condition is what lets Spark expire join state; here the
# watermark out-lasts the fixture's 30-day span so no row can be
# dropped and the append output is exactly the batch join the oracle
# computes. At production scale the same plan runs with a tight
# watermark and bounded state — that knob, not the plan, is the only
# thing that changes.
# ---------------------------------------------------------------------------
@query(
    "stream_interval_join_replay",
    """
    SELECT p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
           strftime(s.ts, '%Y-%m-%d %H:%M:%S.%f') AS signup_ts,
           p.value
    FROM events p JOIN events s
      ON p.user_id = s.user_id
     AND p.event_type = 'purchase' AND s.event_type = 'signup'
     AND p.ts >= s.ts AND p.ts < s.ts + INTERVAL 24 HOUR
    """,
)
def stream_interval_join_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile
    import uuid

    from ..streaming import read_stream
    from ..streaming.joins import interval_join_streams

    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "value"
    )
    d = tempfile.mkdtemp(prefix="mlps_sij_")
    name = f"sij_{uuid.uuid4().hex}"
    # State-store work is commits x partitions x triggers x two stores;
    # at replay volume that fixed cost dominates, so pin the stateful
    # shuffle to 4 partitions for this query (the knob you RAISE for a
    # real high-volume stream — size state partitions to stream volume).
    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        # Each side gets its OWN pre-filtered, pre-projected replay dir:
        # the streams then carry only the rows and columns they join on
        # (a stream-side filter would instead drag every event through
        # both scans and fill both state stores with rows that can never
        # match — at any scale, push the filter into the source).
        d_p, d_i = f"{d}/points", f"{d}/intervals"
        ev.filter(F.col("event_type") == "purchase").select(
            "user_id", F.col("ts").alias("p_ts"), "value"
        ).repartition(2).write.mode("overwrite").parquet(d_p)
        ev.filter(F.col("event_type") == "signup").select(
            "user_id",
            F.col("ts").alias("s_ts"),
            (F.col("ts") + F.expr("INTERVAL 24 HOURS")).alias("s_end"),
        ).repartition(2).write.mode("overwrite").parquet(d_i)
        points = read_stream(
            spark, d_p, spark.read.parquet(d_p).schema, max_files_per_trigger=1
        )
        intervals = read_stream(
            spark, d_i, spark.read.parquet(d_i).schema, max_files_per_trigger=1
        )
        joined = interval_join_streams(
            points,
            intervals,
            key_cols=["user_id"],
            point_ts="p_ts",
            start_ts="s_ts",
            end_ts="s_end",
            point_watermark="35 days",
            interval_watermark="35 days",
        )
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        final = spark.table(name).select(
            "user_id",
            F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "purchase_ts"
            ),
            F.date_format("s_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "signup_ts"
            ),
            "value",
        )
        rows = final.collect()
        return spark.createDataFrame(rows, final.schema)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_sp)
        shutil.rmtree(d, ignore_errors=True)
        try:
            spark.catalog.dropTempView(name)
        except Exception:
            pass


# ---------------------------------------------------------------------------
# REAL session-window stream in the gate: events replayed as two
# time-split micro-batches through a watermarked session_window
# aggregation (Spark's native merging session state, not the batch
# lag/cumsum rewrite). Session windows reject update mode
# (STREAMING_OUTPUT_MODE.UNSUPPORTED_OPERATION), so the sink runs
# COMPLETE: after the last trigger the memory table IS the final
# session state, arrival-order-independent by construction. The
# watermark out-lasts the fixture span so nothing drops, and the
# oracle is the batch gap-sessionization: dropped state, a session
# split across batches, or a bad merge all change (start, end, n)
# triples.
# ---------------------------------------------------------------------------
@query(
    "stream_session_replay",
    """
    WITH ordered AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         > INTERVAL 6 HOUR
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    tagged AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS session_id
        FROM ordered
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           strftime(MAX(ts) + INTERVAL 6 HOUR, '%Y-%m-%d %H:%M:%S.%f')
               AS session_end,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM tagged
    GROUP BY user_id, session_id
    """,
)
def stream_session_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile
    import uuid

    from ..streaming import read_stream

    ev = t(spark, sf_dir, "events").select("user_id", "ts", "value")
    d = tempfile.mkdtemp(prefix="mlps_ssr_")
    name = f"ssr_{uuid.uuid4().hex}"
    # Merging-session state-store work is commits x partitions x
    # triggers; at replay volume that fixed cost dominates, so pin the
    # stateful shuffle to 4 partitions for this query (same knob as
    # stream_interval_join_replay — RAISE it for a real high-volume
    # stream).
    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        # Two micro-batches split on event time (first half, second
        # half) — sessions spanning the split exercise cross-batch
        # state merging.
        split = "2024-01-16 00:00:00"
        ev.filter(F.col("ts") < split).coalesce(1).write.mode(
            "append"
        ).parquet(d)
        ev.filter(F.col("ts") >= split).coalesce(1).write.mode(
            "append"
        ).parquet(d)
        schema = spark.read.parquet(d).schema
        stream = read_stream(spark, d, schema, max_files_per_trigger=1)
        sess = (
            stream.withWatermark("ts", "40 days")
            .groupBy("user_id", F.session_window("ts", "6 hours"))
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("value").alias("sum_value"),
            )
        )
        q = (
            sess.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        final = spark.table(name).select(
            "user_id",
            F.date_format("session_window.start", _TS_FMT_US).alias(
                "session_start"
            ),
            F.date_format("session_window.end", _TS_FMT_US).alias(
                "session_end"
            ),
            "n_events",
            F.round("sum_value", 2).alias("sum_value"),
        )
        rows = final.collect()
        return spark.createDataFrame(rows, final.schema)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_sp)
        shutil.rmtree(d, ignore_errors=True)
        try:
            spark.catalog.dropTempView(name)
        except Exception:
            pass

# ---------------------------------------------------------------------------
# Watermark lateness audit — BEFORE committing to a watermark delay, a
# pipeline owner wants to know what that delay would DROP under a
# realistic out-of-order arrival. Arrival = event time + a
# deterministic md5 jitter of 0..24 hours (bounded disorder, the
# real shape of late data); the replay splits at arrival day 15, the
# 2-hour watermark advances off batch 1's max EVENT time (Spark's
# rule: the watermark gating batch 2 derives from data seen before
# it), and the report counts batch-2 rows per event type that fall
# behind it — the rows a 2-hour delay would silently drop given
# up-to-24-hour disorder. Pure batch arithmetic on exact integers and
# timestamps; the stream-engine equivalence of the watermark rule is
# pinned by the streaming tests, this query is the capacity-planning
# report.
# ---------------------------------------------------------------------------
_WM_DELAY_MIN = 120
_WM_JITTER_MIN = 1440


@query(
    "watermark_lateness_audit",
    f"""
    WITH arr AS (
        SELECT event_id, ts, event_type,
               ts + to_minutes(
                   ('0x' || substr(md5('jit:' || CAST(event_id AS VARCHAR)),
                                   1, 4))::BIGINT % {_WM_JITTER_MIN})
                   AS arrival
        FROM events
    ),
    split AS (
        SELECT MIN(arrival) + INTERVAL 15 DAY AS split_at FROM arr
    ),
    tagged AS (
        SELECT arr.*, arr.arrival < split.split_at AS in_batch1
        FROM arr CROSS JOIN split
    ),
    wm AS (
        SELECT MAX(ts) - INTERVAL {_WM_DELAY_MIN} MINUTE AS watermark
        FROM tagged WHERE in_batch1
    )
    SELECT event_type,
           CAST(SUM(CASE WHEN NOT in_batch1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_batch2,
           CAST(SUM(CASE WHEN NOT in_batch1 AND ts < wm.watermark
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
           ROUND(SUM(CASE WHEN NOT in_batch1 AND ts < wm.watermark
                          THEN 1 ELSE 0 END) * 1.0
                 / greatest(SUM(CASE WHEN NOT in_batch1 THEN 1 ELSE 0 END),
                            1), 6) AS late_share,
           strftime(MAX(wm.watermark), '%Y-%m-%d %H:%M:%S') AS watermark
    FROM tagged CROSS JOIN wm
    GROUP BY event_type
    """,
)
def watermark_lateness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select("event_id", "ts", "event_type")
    jitter = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("jit:"), F.col("event_id").cast("string"))),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")
        % _WM_JITTER_MIN
    )
    arr = ev.withColumn(
        "arrival",
        F.col("ts")
        + (jitter * F.expr("INTERVAL 1 MINUTE")),
    )
    split = arr.agg(
        (F.min("arrival") + F.expr("INTERVAL 15 DAYS")).alias("split_at")
    )
    tagged = arr.join(F.broadcast(split)).withColumn(
        "in_batch1", F.col("arrival") < F.col("split_at")
    )
    wm = tagged.filter("in_batch1").agg(
        (
            F.max("ts") - F.expr(f"INTERVAL {_WM_DELAY_MIN} MINUTES")
        ).alias("watermark")
    )
    joined = tagged.join(F.broadcast(wm))
    b2 = F.when(~F.col("in_batch1"), 1).otherwise(0)
    late = F.when(
        ~F.col("in_batch1") & (F.col("ts") < F.col("watermark")), 1
    ).otherwise(0)
    return joined.groupBy("event_type").agg(
        F.sum(b2).cast("long").alias("n_batch2"),
        F.sum(late).cast("long").alias("n_late"),
        F.round(
            F.sum(late) * 1.0 / F.greatest(F.sum(b2), F.lit(1)), 6
        ).alias("late_share"),
        F.date_format(F.max("watermark"), "yyyy-MM-dd HH:mm:ss").alias(
            "watermark"
        ),
    )


# ---------------------------------------------------------------------------
# Streaming table ingest under the gate: events replay through
# operators/manifest.stream_append_sink (one snapshot per micro-batch,
# metadata-only appends over prior files, idempotent batch ledger), and
# the LATEST snapshot read back must equal the batch aggregate over the
# whole table — the streaming half of the table-format story,
# value-checked. Earlier snapshots being strict prefixes is asserted in
# tests/test_manifest.py.
# ---------------------------------------------------------------------------
@query(
    "stream_table_ingest_replay",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               / 100.0 AS total_value
    FROM events
    GROUP BY event_type
    """,
)
def stream_table_ingest_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile
    import uuid

    from ..operators.manifest import read_snapshot, stream_append_sink

    ev = t(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("cents"),
    )
    src = tempfile.mkdtemp(prefix="mlps_sti_src_")
    tbl = tempfile.mkdtemp(prefix="mlps_sti_tbl_")
    ckpt = tempfile.mkdtemp(prefix="mlps_sti_ck_") + f"/{uuid.uuid4().hex}"
    try:
        ev.repartition(2).write.mode("overwrite").parquet(src)
        schema = spark.read.parquet(src).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = stream_append_sink(stream, tbl, "event_id", ckpt, num_files=4)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        final = (
            read_snapshot(spark, tbl)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                (F.sum("cents").cast("long") / 100.0).alias("total_value"),
            )
        )
        rows = final.collect()
        return spark.createDataFrame(rows, final.schema)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(tbl, ignore_errors=True)


# ---------------------------------------------------------------------------
# LEFT OUTER stream-stream interval join under the gate — the
# click-attribution question the inner join can't answer: which clicks
# found NO purchase within 24h. Outer emission is watermark-gated
# (a click is declared unmatched only after both watermarks pass its
# window), so the finite replay appends a far-future SENTINEL row to
# both sides to flush the tail, then filters it out — the documented
# pattern for draining outer state in bounded replays. The oracle is
# the batch left range join; matched/unmatched per day must agree
# exactly.
# ---------------------------------------------------------------------------
@query(
    "stream_outer_join_replay",
    """
    WITH clicks AS (
        SELECT user_id, ts AS c_ts FROM events WHERE event_type = 'click'
    ),
    buys AS (
        SELECT user_id AS b_user, ts AS b_ts FROM events
        WHERE event_type = 'purchase'
    ),
    j AS (
        SELECT c.user_id, c.c_ts, b.b_user
        FROM clicks c
        LEFT JOIN buys b
          ON b.b_user = c.user_id
         AND b.b_ts >= c.c_ts
         AND b.b_ts < c.c_ts + INTERVAL 24 HOUR
    )
    SELECT strftime(c_ts, '%Y-%m-%d') AS click_date,
           COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN b_user IS NULL THEN 0 ELSE 1 END) AS BIGINT)
               AS n_matched
    FROM j GROUP BY click_date
    """,
)
def stream_outer_join_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile
    import time
    import uuid

    ev = t(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts")
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("b_user"), F.col("ts").alias("b_ts")
    )
    d1 = tempfile.mkdtemp(prefix="mlps_soj_c_")
    d2 = tempfile.mkdtemp(prefix="mlps_soj_b_")
    name = f"soj_{uuid.uuid4().hex}"
    # The stream-stream join keeps TWO state stores per partition and
    # pays commits x partitions x triggers; the r12 per-trigger profile
    # (BASELINE.md) put ~1 s/batch in addBatch at session partition
    # count. Pin state to 4 partitions for the finite replay — the knob
    # a real deployment RAISES to size state to stream volume.
    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        clicks.repartition(2).write.mode("overwrite").parquet(d1)
        buys.repartition(2).write.mode("overwrite").parquet(d2)
        sentinel_c = spark.createDataFrame(
            [(-1, "2030-01-01 00:00:00")], ["user_id", "c_ts"]
        ).select("user_id", F.col("c_ts").cast("timestamp").alias("c_ts"))
        sentinel_b = spark.createDataFrame(
            [(-1, "2030-01-01 00:00:00")], ["b_user", "b_ts"]
        ).select("b_user", F.col("b_ts").cast("timestamp").alias("b_ts"))
        # the sentinel must be the LAST file each source picks up:
        # FileStreamSource orders by modification time — pinned with
        # synthetic mtimes instead of the old 1.1 s sleep
        seen: set = set()
        _stamp_replay_wave([d1, d2], 0, seen)
        sentinel_c.repartition(1).write.mode("append").parquet(d1)
        sentinel_b.repartition(1).write.mode("append").parquet(d2)
        _stamp_replay_wave([d1, d2], 1, seen)
        # 2 data files arrive in ONE trigger, the sentinel in the next:
        # still a multi-batch replay (watermark advances across
        # triggers, the sentinel batch flushes unmatched outer rows),
        # one state-store micro-batch cheaper than one-file-per-trigger
        # (r12 per-trigger profile: ~1.2 s per extra batch, BASELINE.md)
        s1 = (
            spark.readStream.schema(spark.read.parquet(d1).schema)
            .option("maxFilesPerTrigger", "2")
            .parquet(d1)
        )
        s2 = (
            spark.readStream.schema(spark.read.parquet(d2).schema)
            .option("maxFilesPerTrigger", "2")
            .parquet(d2)
        )
        # the attribution window is derived from c_ts (not a stored
        # interval table), so the join is built inline; the generic
        # stored-interval form is streaming.joins.
        # outer_interval_join_streams, exercised in test_streaming
        p = s1.withWatermark("c_ts", "1 hour")
        i = s2.withWatermark("b_ts", "1 hour")
        j = p.join(
            i,
            (F.col("user_id") == F.col("b_user"))
            & (F.col("b_ts") >= F.col("c_ts"))
            & (F.col("b_ts") < F.col("c_ts") + F.expr("INTERVAL 24 HOURS")),
            "leftOuter",
        )
        q = (
            j.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        final = (
            spark.table(name)
            .filter(F.col("user_id") >= 0)  # drop the sentinel
            .groupBy(
                F.date_format("c_ts", "yyyy-MM-dd").alias("click_date")
            )
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(
                    F.when(F.col("b_user").isNull(), 0).otherwise(1)
                )
                .cast("long")
                .alias("n_matched"),
            )
        )
        rows = final.collect()
        return spark.createDataFrame(rows, final.schema)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_sp)
        shutil.rmtree(d1, ignore_errors=True)
        shutil.rmtree(d2, ignore_errors=True)
        try:
            spark.catalog.dropTempView(name)
        except Exception:
            pass


# ---------------------------------------------------------------------------
# Event-time-timeout sessionizer under the gate: events replay as a
# 2-file stream through streaming.stateful.sessionize_with_timeout
# (6-hour gap), a far-future sentinel row drains every open session
# (emission happens when the WATERMARK passes a session's gap deadline
# — state.hasTimedOut — not when new data arrives), and the closed
# sessions must equal the batch gaps-and-islands segmentation exactly,
# timestamps included. The native-API twin is stream_session_replay;
# this one proves the CUSTOM-state route end-to-end.
# ---------------------------------------------------------------------------
@query(
    "stream_timeout_sessions_replay",
    """
    WITH ordered AS (
        SELECT CAST(user_id AS VARCHAR) AS key, ts,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id)
                         > INTERVAL 6 HOUR
                    OR LAG(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    tagged AS (
        SELECT key, ts,
               SUM(new_session) OVER (PARTITION BY key ORDER BY ts
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS session_id
        FROM ordered
    )
    SELECT key,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
           COUNT(*) AS n_events
    FROM tagged
    GROUP BY key, session_id
    """,
)
def stream_timeout_sessions_replay(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import shutil
    import tempfile
    import time
    import uuid

    from ..streaming.stateful import sessionize_with_timeout

    ev = t(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("key"),
        F.col("ts").cast("timestamp").alias("ts"),
    )
    d = tempfile.mkdtemp(prefix="mlps_sts_")
    name = f"sts_{uuid.uuid4().hex}"
    # applyInPandasWithState keeps one state store per partition and
    # pays commits x partitions x triggers; pin state to 4 partitions
    # for the finite replay (raise for a real high-volume stream).
    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        # time-partitioned replay files: the sessionizer's order
        # contract is per-key time order ACROSS batches
        cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
        ev.filter(F.col("ts") < cut).coalesce(1).write.mode(
            "overwrite"
        ).parquet(d)
        seen: set = set()
        _stamp_replay_wave(d, 0, seen)
        ev.filter(F.col("ts") >= cut).coalesce(1).write.mode(
            "append"
        ).parquet(d)
        _stamp_replay_wave(d, 1, seen)
        sentinel = spark.createDataFrame(
            [("__sentinel__", "2030-01-01 00:00:00")], ["key", "ts"]
        ).select("key", F.col("ts").cast("timestamp").alias("ts"))
        sentinel.repartition(1).write.mode("append").parquet(d)
        _stamp_replay_wave(d, 2, seen)
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
        final = spark.table(name).filter(
            F.col("key") != "__sentinel__"
        ).select(
            "key",
            F.date_format("session_start", _TS_FMT_US).alias(
                "session_start"
            ),
            F.date_format("session_end", _TS_FMT_US).alias("session_end"),
            "n_events",
        )
        rows = final.collect()
        return spark.createDataFrame(rows, final.schema)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_sp)
        shutil.rmtree(d, ignore_errors=True)
        try:
            spark.catalog.dropTempView(name)
        except Exception:
            pass


# ---------------------------------------------------------------------------
# Streaming ingest into the SPEC table — stream_table_ingest_replay's
# twin over operators/partspec: each micro-batch appends one version
# partitioned by the active spec (event_type) with per-file cents
# stats, via the idempotent foreachBatch ledger. The read back goes
# through BOTH metadata prunings (tuple equality on event_type + cents
# band over the per-file stats) and the oracle re-derives the same
# filtered aggregate declaratively — a lost batch, a double-applied
# replay, a wrong tuple, or a band that skips a live file all break
# the hash.
# ---------------------------------------------------------------------------
_SSI_LO, _SSI_HI = 100_00, 700_00


@query(
    "stream_spec_ingest_replay",
    f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) / 100.0 AS band_value,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    WHERE event_type = 'purchase'
      AND CAST(floor(value * 100.0 + 0.5) AS BIGINT)
          BETWEEN {_SSI_LO} AND {_SSI_HI}
    """,
)
def stream_spec_ingest_replay(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import shutil
    import tempfile
    import uuid

    from ..operators.partspec import (
        read_spec_pruned,
        stream_spec_append_sink,
    )

    ev = t(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        "user_id",
        F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("cents"),
    )
    src = tempfile.mkdtemp(prefix="mlps_ssi_src_")
    tbl = tempfile.mkdtemp(prefix="mlps_ssi_tbl_")
    ckpt = tempfile.mkdtemp(prefix="mlps_ssi_ck_") + f"/{uuid.uuid4().hex}"
    try:
        ev.repartition(2).write.mode("overwrite").parquet(src)
        schema = spark.read.parquet(src).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = stream_spec_append_sink(
            stream, tbl, ["event_type"], ckpt, stats_col="cents"
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        final = read_spec_pruned(
            spark,
            tbl,
            {"event_type": "purchase"},
            band=("cents", _SSI_LO, _SSI_HI),
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum("cents").cast("long") / 100.0).alias("band_value"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        rows = final.collect()
        return spark.createDataFrame(rows, final.schema)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(tbl, ignore_errors=True)


# ---------------------------------------------------------------------------
# Streaming CDC-apply under the gate (round 10, second session): a
# 3-batch change stream replays through posdeletes.stream_upsert_sink —
# batch 0 bootstraps the table, batches 1 and 2 UPSERT via
# merge_on_read (matched rows die by DV runs, the batch appends; no
# file rewrites) — and the final snapshot must equal the declarative
# last-writer-wins state. Batch ORDER is what's under test (upserts
# don't commute like appends): the file source processes source files
# oldest-modification-first, pinned here with explicit utimes. A DV
# mis-scope, a batch applied twice (ledger), or out-of-order apply all
# break the hash; n_versions pins one snapshot per batch.
# ---------------------------------------------------------------------------
@query(
    "stream_mor_upsert_replay",
    """
    WITH base AS (
        SELECT o_orderkey AS k, o_orderstatus AS status,
               CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
        FROM orders
    ), final AS (
        SELECT k,
               CASE WHEN k % 5 = 0 THEN 'U2'
                    WHEN k % 3 = 0 THEN 'U1'
                    ELSE status END AS status,
               CASE WHEN k % 5 = 0 THEN cents + 222
                    WHEN k % 3 = 0 THEN cents + 111
                    ELSE cents END AS cents
        FROM base
    )
    SELECT status,
           COUNT(*) AS n_rows,
           CAST(SUM(cents) AS BIGINT) / 100.0 AS total_value,
           CAST(3 AS BIGINT) AS n_versions
    FROM final
    GROUP BY status
    ORDER BY status
    """,
)
def stream_mor_upsert_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob as _glob
    import os
    import shutil
    import tempfile
    import uuid

    from ..operators.manifest import read_snapshot, versions
    from ..operators.posdeletes import stream_upsert_sink

    base = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.floor(F.col("o_totalprice") * 100.0 + 0.5)
        .cast("long")
        .alias("cents"),
    )
    b1 = base.filter(F.col("k") % 3 == 0).select(
        "k",
        F.lit("U1").alias("status"),
        (F.col("cents") + 111).alias("cents"),
    )
    b2 = base.filter(F.col("k") % 5 == 0).select(
        "k",
        F.lit("U2").alias("status"),
        (F.col("cents") + 222).alias("cents"),
    )
    src = tempfile.mkdtemp(prefix="mlps_cdc_src_")
    tbl = tempfile.mkdtemp(prefix="mlps_cdc_tbl_")
    ckpt = tempfile.mkdtemp(prefix="mlps_cdc_ck_") + f"/{uuid.uuid4().hex}"
    try:
        # one file per batch, modification times strictly increasing so
        # the file source replays them in CDC order. The three writes
        # are independent — submit them from a pool (guide §2.6) so the
        # single-task coalesce(1) writes overlap instead of serializing
        # three jobs; the CDC order comes from the mtime stamp applied
        # AFTER all writes land, not from write completion order.
        from concurrent.futures import ThreadPoolExecutor

        def _write(i_b):
            i, b = i_b
            spark.sparkContext.setJobDescription(f"mor fixture b{i}")
            stage = f"{src}/_stage{i}"
            b.coalesce(1).write.parquet(stage)
            part = _glob.glob(f"{stage}/part-*.parquet")[0]
            dst = f"{src}/b{i}.parquet"
            shutil.move(part, dst)
            shutil.rmtree(stage)
            return i, dst

        with ThreadPoolExecutor(max_workers=3) as pool:
            for i, dst in pool.map(_write, enumerate((base, b1, b2))):
                os.utime(dst, (1_700_000_000 + i * 100,) * 2)
        schema = spark.read.parquet(f"{src}/b0.parquet").schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = stream_upsert_sink(stream, tbl, "k", ckpt, num_files=4)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        n_versions = len(versions(spark, tbl))
        final = (
            read_snapshot(spark, tbl)
            .groupBy("status")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                (F.sum("cents").cast("long") / 100.0).alias(
                    "total_value"
                ),
            )
            .withColumn(
                "n_versions", F.lit(n_versions).cast("long")
            )
            .orderBy("status")
        )
        rows = final.collect()
        return spark.createDataFrame(rows, final.schema)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(tbl, ignore_errors=True)
