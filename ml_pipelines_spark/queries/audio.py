"""Audio feature-extraction query — the audio modality's driver check
(rows-only: the binary codec is non-SQL by nature; feature math is
closed-form-tested in tests/test_audio.py).

Synthetic clips: every embeddings row becomes a 0.25 s / 8 kHz clip
whose sine frequency and amplitude derive from vec_id, encoded with the
FAUD fake codec inside mapInPandas, then framed into 50 ms windows with
RMS + zero-crossing features.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import BinaryType, LongType, StructField, StructType

from ..operators.audio import audio_frame_features, encode_audio
from .registry import query
from .relational import t

_RATE = 8000
_N = 2000  # 0.25 s


def _clips_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    ids = t(spark, sf_dir, "embeddings").select("vec_id")
    schema = StructType(
        [StructField("vec_id", LongType()), StructField("audio_bytes", BinaryType())]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tt = np.arange(_N) / _RATE
        for pdf in batches:
            rows = []
            for vec_id in pdf["vec_id"]:
                freq = 100.0 + float(vec_id) % 200.0
                amp = 5000.0 + float(vec_id) % 1000.0
                clip = np.round(
                    amp * np.sin(2 * math.pi * freq * tt)
                ).astype(np.int16)
                rows.append((int(vec_id), encode_audio(clip, _RATE)))
            yield pd.DataFrame(rows, columns=["vec_id", "audio_bytes"])

    return ids.mapInPandas(gen, schema=schema)


@query(
    "audio_frame_features",
    """
    SELECT vec_id, CAST(f AS BIGINT) AS frame_idx,
           TRUE AS rms_ok, TRUE AS zc_ok
    FROM embeddings CROSS JOIN (SELECT unnest(generate_series(0, 4)) AS f) fr
    """,
)
def audio_frame_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary codec + frame features, driver-checkable via closed-form
    INVARIANTS: each clip is a known sine (freq/amp derive from vec_id),
    so every 50 ms frame must show RMS within 2% of amp/sqrt(2) and a
    zero-crossing count within +-3 of 2*freq*0.05. The oracle enumerates
    the exact (vec_id, frame_idx) grid — 5 frames per clip — and pins
    both booleans TRUE, so a codec/framing/feature bug changes the row
    set or flips a boolean and fails the hash. Exact feature values stay
    closed-form-tested in tests/test_audio.py.
    """
    from pyspark.sql import functions as F

    feats = audio_frame_features(
        _clips_df(spark, sf_dir), frame_len=400, audio_col="audio_bytes"
    )
    freq = 100.0 + F.col("vec_id") % 200.0
    amp = 5000.0 + F.col("vec_id") % 1000.0
    expected_rms = amp / math.sqrt(2.0)
    expected_zc = 2.0 * freq * (400.0 / _RATE)
    return feats.select(
        "vec_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        (F.abs(F.col("rms") - expected_rms) <= amp * 0.02).alias("rms_ok"),
        (F.abs(F.col("zero_crossings") - expected_zc) <= 3.0).alias("zc_ok"),
    )
