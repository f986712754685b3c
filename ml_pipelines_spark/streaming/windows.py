"""Tumbling / sliding / session windows over event-time — SURVEY.md §7.

The reference has no streaming at all (SURVEY.md §2.9); this layer adds
the standard Structured Streaming surface in a batch-first shape: every
function works identically on a batch DataFrame (DuckDB-oracle checkable)
and on a streaming DataFrame (with watermark), because Spark's
``window``/``session_window`` aggregations are the same logical operator
in both modes.

Scale posture: event-time aggregation shuffles once on (key, window);
with watermarks the state store evicts closed windows, so state is
bounded by (keys × open windows), independent of stream length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: list[str],
    aggs: list[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Fixed non-overlapping windows; one output row per (keys, window)."""
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(F.window(ts_col, duration), *keys).agg(*aggs)


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: list[str],
    aggs: list[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping windows of ``duration`` every ``slide``; each event
    lands in duration/slide windows."""
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(F.window(ts_col, duration, slide), *keys).agg(*aggs)


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: list[str],
    aggs: list[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Session windows: a session closes after ``gap`` of inactivity;
    window.end is last event + gap (Spark semantics)."""
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(F.session_window(ts_col, gap), *keys).agg(*aggs)


def read_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a (growing) directory — the streaming twin
    of io.read_table. Schemas are mandatory for streaming reads."""
    reader = spark.readStream.schema(schema).format(fmt)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def enrich_stream(
    stream_df: DataFrame,
    dim_df: DataFrame,
    on: list[str] | str,
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static enrichment join: every micro-batch joins against the
    static dimension (re-read per batch if the dim is backed by a table,
    so slowly-changing dims pick up updates between batches).

    State-free — unlike a stream-stream join there is no watermark
    bookkeeping and no join state store; the only cost is the per-batch
    dim broadcast, which is the right trade whenever the dimension is
    orders of magnitude smaller than the stream (the usual enrichment
    shape at any scale). Set ``broadcast_dim=False`` for a dimension too
    big to broadcast — Spark then shuffles each micro-batch instead.
    """
    dim = F.broadcast(dim_df) if broadcast_dim else dim_df
    return stream_df.join(dim, on, how)
