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


# ---------------------------------------------------------------------------
# Audio fingerprint near-dup — the audio twin of image_phash_near_dup,
# completing modality-symmetric dedup (text: minhash/simhash; image:
# phash; audio: energy fingerprint). Clips are FAUD binaries whose int16
# samples are a CLOSED-FORM integer function of the clip seed, so while
# Spark runs the real multimodal plumbing — encode → binary column →
# mapInPandas decode → frame energies → 16-bit fingerprint — DuckDB
# re-derives every sample, every frame energy (exact BIGINT sums),
# every strict-mean threshold bit, the two 8-bit LSH bands, and the
# xor-popcount verify: the full pair set is a cross-engine value
# oracle. Planted dups (doc_id % 10 == 0 re-encoded under id+1e6) make
# the collision path non-vacuous. Scale shape: banded collision join
# (O(clips × 2 bands) shuffle), exact Hamming verify on two longs per
# candidate — never an all-pairs join.
# ---------------------------------------------------------------------------
_FP_FRAMES = 16
_FP_FRAME_LEN = 64
_FP_N = _FP_FRAMES * _FP_FRAME_LEN
_FP_HAM_T = 2


@query(
    "audio_fingerprint_near_dup",
    f"""
    WITH base AS (
        SELECT doc_id AS clip_id, doc_id AS seed FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS clip_id, doc_id AS seed
        FROM documents WHERE doc_id % 10 = 0
    ),
    samp AS (
        SELECT clip_id, (i // {_FP_FRAME_LEN}) AS f,
               ((seed * 7919 + i * 104729) % 2001) - 1000 AS s
        FROM base, unnest(generate_series(0, {_FP_N - 1})) u(i)
    ),
    fe AS (
        SELECT clip_id, f, SUM(s * s) AS e FROM samp GROUP BY clip_id, f
    ),
    tot AS (SELECT clip_id, SUM(e) AS te FROM fe GROUP BY clip_id),
    fp AS (
        SELECT fe.clip_id,
               SUM(CASE WHEN fe.e * {_FP_FRAMES} > tot.te
                        THEN (CAST(1 AS BIGINT) << fe.f) ELSE 0 END) AS fp
        FROM fe JOIN tot USING (clip_id)
        GROUP BY fe.clip_id
    ),
    banded AS (
        SELECT clip_id, 0 AS band_idx, fp % 256 AS band_val, fp FROM fp
        UNION ALL
        SELECT clip_id, 1 AS band_idx, fp // 256 AS band_val, fp FROM fp
    ),
    cand AS (
        SELECT DISTINCT a.clip_id AS id_a, b.clip_id AS id_b,
               a.fp AS fp_a, b.fp AS fp_b
        FROM banded a JOIN banded b
          ON a.band_idx = b.band_idx AND a.band_val = b.band_val
        WHERE a.clip_id < b.clip_id
    )
    SELECT id_a, id_b, CAST(bit_count(xor(fp_a, fp_b)) AS BIGINT) AS hamming
    FROM cand WHERE bit_count(xor(fp_a, fp_b)) <= {_FP_HAM_T}
    """,
)
def audio_fingerprint_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..operators.audio import decode_audio

    docs = t(spark, sf_dir, "documents").select("doc_id")
    base = docs.select(
        F.col("doc_id").alias("clip_id"), F.col("doc_id").alias("seed")
    ).unionByName(
        docs.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1000000).alias("clip_id"),
            F.col("doc_id").alias("seed"),
        )
    )
    clip_schema = StructType(
        [
            StructField("clip_id", LongType()),
            StructField("audio_bytes", BinaryType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        i = np.arange(_FP_N, dtype=np.int64)
        for pdf in batches:
            rows = []
            for clip_id, seed in zip(pdf["clip_id"], pdf["seed"]):
                s = ((int(seed) * 7919 + i * 104729) % 2001) - 1000
                rows.append(
                    (int(clip_id), encode_audio(s.astype(np.int16), _RATE))
                )
            yield pd.DataFrame(rows, columns=["clip_id", "audio_bytes"])

    clips = base.mapInPandas(gen, schema=clip_schema)
    fp_schema = StructType(
        [StructField("clip_id", LongType()), StructField("fp", LongType())]
    )

    def fingerprint(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for clip_id, blob in zip(pdf["clip_id"], pdf["audio_bytes"]):
                samples, _rate = decode_audio(bytes(blob))
                s = samples.astype(np.int64)[:_FP_N]
                e = (s * s).reshape(_FP_FRAMES, _FP_FRAME_LEN).sum(axis=1)
                bits = e * _FP_FRAMES > e.sum()
                fp = int((bits.astype(np.int64) << np.arange(_FP_FRAMES)).sum())
                rows.append((int(clip_id), fp))
            yield pd.DataFrame(rows, columns=["clip_id", "fp"])

    fps = clips.mapInPandas(fingerprint, schema=fp_schema)
    # Materialize the fingerprints once: the banded union has two
    # branches and the self-join consumes both sides, so without a
    # boundary the synth→encode→decode→fingerprint Python kernel (the
    # dominant cost) replays up to 4×. Blocks are ContextCleaner-
    # reclaimed with the plan; at 100 TB this is a written fingerprint
    # table, exactly like the image-phash path's.
    fps = fps.localCheckpoint(eager=True)
    banded = fps.select(
        "clip_id", F.lit(0).alias("band_idx"),
        (F.col("fp") % 256).alias("band_val"), "fp",
    ).unionByName(
        fps.select(
            "clip_id", F.lit(1).alias("band_idx"),
            F.floor(F.col("fp") / 256).cast("long").alias("band_val"), "fp",
        )
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.clip_id") < F.col("b.clip_id")),
        )
        .select(
            F.col("a.clip_id").alias("id_a"),
            F.col("b.clip_id").alias("id_b"),
            F.col("a.fp").alias("fp_a"),
            F.col("b.fp").alias("fp_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return cand.filter(ham <= _FP_HAM_T).select(
        "id_a", "id_b", ham.cast("long").alias("hamming")
    )
