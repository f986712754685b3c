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
