"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no streaming; these are the north-star custom-state
operators a training-data pipeline needs in-flight: running per-key
aggregates (monitoring ingest totals) and exact in-stream deduplication.

State-size posture at scale: running_totals keeps O(keys) fixed-width
state; stream_dedup delegates to Spark's dropDuplicates state store whose
entries expire with the watermark — both bounded independent of stream
length.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RUNNING_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def running_totals_schema(key_field: StructField) -> StructType:
    return StructType(
        [
            key_field,
            StructField("batch_events", LongType()),
            StructField("total_events", LongType()),
            StructField("total_value", DoubleType()),
        ]
    )


def running_totals(
    df: DataFrame,
    key_col: str,
    value_col: str = "value",
) -> DataFrame:
    """Per-key cumulative (count, sum) across micro-batches — emits one
    row per key per batch with batch + lifetime totals.

    The canonical applyInPandasWithState shape: state is a single
    fixed-width tuple per key, updated incrementally; no reprocessing of
    history on any batch.
    """
    key_field = df.schema[key_col]
    out_schema = running_totals_schema(key_field)

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        batch_n = 0
        batch_total = 0.0
        for pdf in pdfs:
            batch_n += len(pdf)
            batch_total += float(pdf[value_col].sum())
        if state.exists:
            (n, total) = state.get
        else:
            n, total = 0, 0.0
        n += batch_n
        total += batch_total
        state.update((n, total))
        yield pd.DataFrame(
            {
                key_field.name: [key[0]],
                "batch_events": [batch_n],
                "total_events": [n],
                "total_value": [total],
            }
        )

    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=RUNNING_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_dedup(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    watermark: str,
) -> DataFrame:
    """Exact in-stream dedup: first occurrence of each key wins; state
    entries older than the watermark are evicted (bounded state)."""
    return df.withWatermark(ts_col, watermark).dropDuplicates(keys)


def tws_available() -> bool:
    """True when transformWithStateInPandas can actually run here.

    The TWS driver worker speaks protobuf to the JVM
    (StreamingPythonRunner); without a working ``google.protobuf`` the
    stream crashes at initialization with
    STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE. Same
    import-availability seam as the PIL/tokenizers codecs.
    """
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def running_totals_tws(
    df: DataFrame,
    key_col: str,
    value_col: str = "value",
) -> DataFrame:
    """running_totals on Spark 4's transformWithStateInPandas API.

    Same semantics and output schema as ``running_totals`` (one row per
    key per batch, lifetime totals carried in per-key state), expressed
    through the modern arbitrary-state processor: state is a named
    ValueState handle instead of the single GroupState tuple, which is
    the API that scales to multiple state variables, TTL, and timers.
    Kept alongside the applyInPandasWithState twin so both stateful
    surfaces stay exercised wherever the runtime supports them.

    Requires a working ``google.protobuf`` (see ``tws_available``) and
    the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass``); raises
    RuntimeError up front when the protobuf seam is missing rather than
    crashing the stream at initialization.
    """
    if not tws_available():
        raise RuntimeError(
            "transformWithStateInPandas needs google.protobuf, which is "
            "not importable in this environment; use running_totals "
            "(applyInPandasWithState) instead"
        )
    from pyspark.sql.streaming import StatefulProcessor

    key_field = df.schema[key_col]
    out_schema = running_totals_schema(key_field)

    class _RunningTotals(StatefulProcessor):
        def init(self, handle) -> None:
            self._totals = handle.getValueState(
                "totals", RUNNING_STATE_SCHEMA
            )

        def handleInputRows(
            self, key: tuple[Any, ...], rows: Iterator[pd.DataFrame], timer_values
        ) -> Iterator[pd.DataFrame]:
            batch_n = 0
            batch_total = 0.0
            for pdf in rows:
                batch_n += len(pdf)
                batch_total += float(pdf[value_col].sum())
            if self._totals.exists():
                n, total = self._totals.get()
            else:
                n, total = 0, 0.0
            n += batch_n
            total += batch_total
            self._totals.update((n, total))
            yield pd.DataFrame(
                {
                    key_field.name: [key[0]],
                    "batch_events": [batch_n],
                    "total_events": [n],
                    "total_value": [total],
                }
            )

        def close(self) -> None:
            pass

    return df.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=_RunningTotals(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )


def stream_dedup_within_watermark(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    watermark: str,
) -> DataFrame:
    """Dedup where duplicates arrive with DIFFERENT event times (retry
    storms, at-least-once producers): ``dropDuplicates`` keys state on
    (keys, exact timestamp) when the ts column is part of the key set,
    or keeps state forever when it isn't; Spark 3.5's
    ``dropDuplicatesWithinWatermark`` instead suppresses any second
    occurrence of the keys within the watermark horizon and evicts
    state once the watermark passes — bounded state AND retry-tolerant
    semantics. First occurrence (in arrival order) wins."""
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


def sessionize_with_timeout(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_minutes: int,
    watermark: str,
) -> DataFrame:
    """Custom sessionizer on applyInPandasWithState with an EVENT-TIME
    TIMEOUT — the GroupState feature the running-totals operator does
    not exercise: a session EMITS when the watermark passes its gap
    deadline (state.hasTimedOut), not when new data happens to arrive.
    Emits one row per CLOSED session: (key, session_start, session_end,
    n_events); sessions still open when the stream ends stay in state
    (drain with a sentinel row past the deadline, as the outer-join
    replay does).

    ORDER CONTRACT: a key's events must arrive time-ordered ACROSS
    micro-batches (within a batch they are sorted here) — the operator
    extends sessions forward from stored state, the same contract as
    any incremental sessionizer. Replays must split files on event
    time, not randomly.

    State per key is one (start, last, count) tuple — O(keys), the
    native session_window equivalent with custom emission control.
    """
    from pyspark.sql.types import TimestampType

    out_schema = StructType(
        [
            StructField("key", StringType()),
            StructField("session_start", TimestampType()),
            StructField("session_end", TimestampType()),
            StructField("n_events", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("start", TimestampType()),
            StructField("last", TimestampType()),
            StructField("n", LongType()),
        ]
    )
    gap_ms = gap_minutes * 60 * 1000

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "key": [key[0]],
                    "session_start": [start],
                    "session_end": [last],
                    "n_events": [n],
                }
            )
            return
        rows = pd.concat(list(pdfs))
        ts = rows[ts_col].sort_values()
        closed = []
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0
        for t in ts:
            if last is not None and (
                t - last
            ).total_seconds() * 1000 > gap_ms:
                closed.append((start, last, n))
                start, last, n = t, t, 1
            else:
                start = t if start is None else start
                last, n = t, n + 1
        state.update((start, last, n))
        # emit when the watermark passes last+gap; a session whose
        # deadline is ALREADY behind the watermark (late-arriving tail
        # data) times out at the next watermark tick instead — Spark
        # rejects timeout timestamps in the past
        deadline = int(last.timestamp() * 1000) + gap_ms
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(deadline, wm + 1))
        if closed:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(closed),
                    "session_start": [c[0] for c in closed],
                    "session_end": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                }
            )

    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
