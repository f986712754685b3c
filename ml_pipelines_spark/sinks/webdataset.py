"""WebDataset-style tar shard sink — the standard container format for
large-scale (multi)modal training data: samples are adjacent members of
tar archives ("shards"), grouped by a shared basename, so a training
loader streams each shard sequentially with zero random I/O.

Spark-first shape: shard assignment is a pure hash of the sample key
(md5-derived — engine-portable, so the manifest is value-checkable
against DuckDB), the DataFrame is shuffled ONCE onto the shard grain,
and each shard's tar file is written executor-side inside one
``applyInPandas`` group — the driver never sees a byte of payload.
Members within a shard are written in sorted key order, making every
tar byte-deterministic for a given input.

Cites the reference's exporters for the role (COCO/YOLO sinks,
create_coco_from_feather.py) — this is the north-star multimodal twin:
where COCO emits one JSON for annotation tools, WebDataset emits
ready-to-stream training shards.
"""

from __future__ import annotations

import os
import tarfile

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

_MANIFEST_SCHEMA = StructType(
    [
        StructField("shard", LongType()),
        StructField("n_samples", LongType()),
        StructField("payload_bytes", LongType()),
    ]
)


def shard_expr(key_col: str, num_shards: int) -> F.Column:
    """Engine-portable shard assignment: md5 of the key's string form,
    first 4 hex digits mod the shard count."""
    return F.pmod(
        F.conv(
            F.substring(F.md5(F.col(key_col).cast("string")), 1, 4), 16, 10
        ).cast("long"),
        F.lit(num_shards),
    )


def write_webdataset(
    df: DataFrame,
    path: str,
    key_col: str,
    payload_cols: dict[str, str],
    num_shards: int = 8,
) -> DataFrame:
    """Write ``df`` as WebDataset tar shards under ``path``.

    ``payload_cols`` maps column name -> member extension; every column
    must be BINARY or STRING (strings are written UTF-8). Each row
    becomes len(payload_cols) tar members named ``<key>.<ext>`` inside
    ``shard-<n>.tar``. Returns the manifest DataFrame
    (shard, n_samples, payload_bytes) — computed from the written
    members inside the same pass.
    """
    os.makedirs(path, exist_ok=True)
    cols = [F.col(key_col).cast("string").alias("__key")]
    for c in payload_cols:
        cols.append(F.col(c))
    staged = df.select(
        shard_expr(key_col, num_shards).alias("__shard"), *cols
    )
    exts = dict(payload_cols)

    def _write(pdf: pd.DataFrame) -> pd.DataFrame:
        from pyspark import TaskContext

        shard = int(pdf["__shard"].iloc[0])
        pdf = pdf.sort_values("__key")
        out = os.path.join(path, f"shard-{shard:05d}.tar")
        # Task retries / speculative attempts may run this group twice,
        # concurrently: each attempt writes its own temp file and
        # atomically renames into place, so shard-N.tar is always ONE
        # complete attempt's bytes, never an interleaving.
        tc = TaskContext.get()
        attempt = tc.taskAttemptId() if tc is not None else os.getpid()
        tmp = os.path.join(
            path, f".shard-{shard:05d}.tar.attempt-{attempt}"
        )
        total = 0
        with tarfile.open(tmp, "w") as tar:
            for _, row in pdf.iterrows():
                for col, ext in exts.items():
                    data = row[col]
                    if data is None:
                        continue
                    if isinstance(data, str):
                        data = data.encode("utf-8")
                    else:
                        data = bytes(data)
                    info = tarfile.TarInfo(name=f"{row['__key']}.{ext}")
                    info.size = len(data)
                    info.mtime = 0  # byte-deterministic archives
                    import io

                    tar.addfile(info, io.BytesIO(data))
                    total += len(data)
        os.replace(tmp, out)
        return pd.DataFrame(
            {
                "shard": [shard],
                "n_samples": [len(pdf)],
                "payload_bytes": [total],
            }
        )

    # Run the write pass EAGERLY, exactly once: the tar write is a side
    # effect, and returning the lazy frame would re-run it on every
    # action against the manifest. The collected manifest is one row
    # per shard — bounded by num_shards, a client-edge read.
    rows = (
        staged.groupBy("__shard")
        .applyInPandas(_write, schema=_MANIFEST_SCHEMA)
        .collect()
    )
    return df.sparkSession.createDataFrame(rows, _MANIFEST_SCHEMA)
