"""Multimodal-column queries — binary image plumbing over mapInPandas.

A deterministic FIMG image is synthesized per ``embeddings`` row (dims
and orientation are closed-form functions of vec_id), pushed through the
*real* binary-column pipeline (encode → mapInPandas decode → transform),
and the resulting metadata is compared against a DuckDB oracle that
computes the same closed forms directly — so the oracle checks the whole
Spark binary/Arrow/mapInPandas path, not just arithmetic.

Pixel-level outputs (checksums after EXIF-normalize / redaction) are
also oracle-checkable because the fake payload is a closed-form pixel
pattern and the transforms are permutation/zeroing operations.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, LongType, StructField, StructType

from ..operators.images import (
    encode_image,
    exif_normalize,
    image_meta,
    pixel_checksum,
    synth_pixels,
)
from .registry import query
from .relational import t


def synth_images_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One FIMG image per embeddings row: width = 8 + vec_id % 24,
    height = 8 + (3 * vec_id) % 24, orientation cycles {1,3,6,8}."""
    base = t(spark, sf_dir, "embeddings").select("vec_id")
    schema = StructType(
        [StructField("vec_id", LongType()),
         StructField("image_bytes", BinaryType())]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        orients = [1, 3, 6, 8]
        for pdf in batches:
            out = []
            for vid in pdf["vec_id"]:
                w = 8 + int(vid) % 24
                h = 8 + (3 * int(vid)) % 24
                px = synth_pixels(w, h, channels=1, seed=int(vid))
                out.append((vid, encode_image(px, orients[int(vid) % 4])))
            yield pd.DataFrame(out, columns=["vec_id", "image_bytes"])

    return base.mapInPandas(gen, schema=schema)


# ---------------------------------------------------------------------------
# Binary decode → typed metadata (the core multimodal plumbing check).
# n_bytes = 10-byte header + w*h; pix_sum has a closed form because
# pixel i = (31*i + 7*seed) % 251.
# ---------------------------------------------------------------------------
_META_CLOSED_FORM = """
    meta AS (
        SELECT vec_id,
               8 + vec_id % 24 AS width,
               8 + (3 * vec_id) % 24 AS height,
               CAST(CASE vec_id % 4 WHEN 0 THEN 1 WHEN 1 THEN 3
                                    WHEN 2 THEN 6 ELSE 8 END AS INT)
                   AS orientation
        FROM embeddings
    )
"""


@query(
    "image_meta_decode",
    "WITH " + _META_CLOSED_FORM + """
    SELECT vec_id, CAST(width AS INT) AS width, CAST(height AS INT) AS height,
           1 AS channels, orientation,
           CAST(10 + width * height AS BIGINT) AS n_bytes
    FROM meta
    """,
)
def image_meta_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    imgs = synth_images_df(spark, sf_dir)
    return image_meta(imgs, "image_bytes").select(
        "vec_id", "width", "height", "channels", "orientation", "n_bytes"
    )


# ---------------------------------------------------------------------------
# EXIF normalization: orientations 6/8 swap dims; pixel multiset is
# preserved (rotation is a permutation), so pix_sum equals the closed-form
# sum over i of (31*i + 7*vec_id) % 251.
# ---------------------------------------------------------------------------
@query(
    "image_exif_normalize",
    "WITH " + _META_CLOSED_FORM + """
    SELECT vec_id,
           CAST(CASE WHEN orientation IN (6, 8) THEN height ELSE width END AS INT)
               AS width,
           CAST(CASE WHEN orientation IN (6, 8) THEN width ELSE height END AS INT)
               AS height,
           1 AS orientation,
           CAST(list_aggregate(
                    list_transform(generate_series(0, width * height - 1),
                                   i -> (31 * i + 7 * vec_id) % 251),
                    'sum') AS BIGINT) AS pix_sum
    FROM meta
    """,
)
def image_exif_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    imgs = exif_normalize(synth_images_df(spark, sf_dir), "image_bytes")
    with_sum = pixel_checksum(imgs, "image_bytes")
    return image_meta(with_sum, "image_bytes").select(
        "vec_id", "width", "height", "orientation", "pix_sum"
    )


# ---------------------------------------------------------------------------
# Video frame sampling: every embeddings row becomes a multi-frame FVID
# blob (concatenated FIMG frames; frame count and per-frame dims are
# closed-form functions of vec_id), sample_frames keeps every 2nd frame
# inside mapInPandas, and each sampled frame is decoded back to typed
# metadata + a pixel checksum. The oracle enumerates the same sampled
# (vec_id, frame_idx) grid and recomputes dims and pixel sums from the
# synth_pixels closed form — a full cross-engine value check of the
# encode → frame-iterate → sample → decode path.
# ---------------------------------------------------------------------------
def synth_videos_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One FVID clip per embeddings row: n_frames = 4 + vec_id % 3,
    frame j is (8 + (vec_id + j) % 5) x (6 + j % 3) with
    seed = 10 * vec_id + j."""
    from ..operators.images import encode_video

    base = t(spark, sf_dir, "embeddings").select("vec_id")
    schema = StructType(
        [StructField("vec_id", LongType()),
         StructField("video_bytes", BinaryType())]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for vid in pdf["vec_id"]:
                v = int(vid)
                frames = [
                    synth_pixels(
                        8 + (v + j) % 5, 6 + j % 3, channels=1,
                        seed=10 * v + j,
                    )
                    for j in range(4 + v % 3)
                ]
                out.append((vid, encode_video(frames)))
            yield pd.DataFrame(out, columns=["vec_id", "video_bytes"])

    return base.mapInPandas(gen, schema=schema)


@query(
    "video_frame_sample",
    """
    WITH frames AS (
        SELECT vec_id, unnest(generate_series(0, 3 + vec_id % 3)) AS j
        FROM embeddings
    ),
    sampled AS (SELECT vec_id, j FROM frames WHERE j % 2 = 0),
    dims AS (
        SELECT vec_id, j AS frame_idx,
               8 + (vec_id + j) % 5 AS w,
               6 + j % 3 AS h
        FROM sampled
    )
    SELECT vec_id, CAST(frame_idx AS INT) AS frame_idx,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(list_aggregate(
                    list_transform(generate_series(0, w * h - 1),
                                   i -> (31 * i + 7 * (10 * vec_id + frame_idx)) % 251),
                    'sum') AS BIGINT) AS pix_sum
    FROM dims
    """,
)
def video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.images import image_meta, pixel_checksum, sample_frames

    vids = synth_videos_df(spark, sf_dir)
    frames = sample_frames(vids, every_k=2, video_col="video_bytes")
    with_sum = pixel_checksum(frames, "image_bytes")
    return image_meta(with_sum, "image_bytes").select(
        "vec_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        "width",
        "height",
        "pix_sum",
    )


# ---------------------------------------------------------------------------
# Nearest-neighbor resize: out pixel (y, x) samples in pixel
# (y*h // out_h, x*w // out_w), so the resized checksum of a synth image
# has a closed form the oracle evaluates directly — the resize kernel's
# index math is value-checked cross-engine, per image.
# ---------------------------------------------------------------------------
_RESIZE_W, _RESIZE_H = 16, 12


@query(
    "image_resize_checksum",
    "WITH " + _META_CLOSED_FORM + f"""
    SELECT vec_id,
           {_RESIZE_W} AS width, {_RESIZE_H} AS height,
           CAST(list_aggregate(
                    list_transform(generate_series(0, {_RESIZE_H * _RESIZE_W} - 1),
                        i -> (31 * (((i // {_RESIZE_W}) * height // {_RESIZE_H}) * width
                                    + ((i % {_RESIZE_W}) * width // {_RESIZE_W}))
                              + 7 * vec_id) % 251),
                    'sum') AS BIGINT) AS pix_sum
    FROM meta
    """,
)
def image_resize_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.images import image_meta, pixel_checksum, resize_images

    imgs = resize_images(
        synth_images_df(spark, sf_dir), _RESIZE_W, _RESIZE_H
    )
    with_sum = pixel_checksum(imgs, "image_bytes")
    return image_meta(with_sum, "image_bytes").select(
        "vec_id", "width", "height", "pix_sum"
    )


# ---------------------------------------------------------------------------
# Segmentation redaction (G6) on RECTANGLE regions: the scanline fill of
# an integer-cornered rectangle zeroes exactly the half-open pixel block
# [y0, y1) x [x0, x1), so the redacted checksum has a closed form —
# total minus the block sum — and the polygon-fill + re-encode + binary
# plumbing is value-checked cross-engine. (General polygons keep their
# numpy golden tests; this pins the Spark-side path.)
# ---------------------------------------------------------------------------
@query(
    "image_redact_checksum",
    "WITH " + _META_CLOSED_FORM + """
    , r AS (
        SELECT vec_id, width, height,
               1 + vec_id % 3 AS x0, 4 + vec_id % 3 AS x1,
               2 AS y0, 3 + vec_id % 4 AS y1
        FROM meta
    )
    SELECT vec_id,
           CAST(
             list_aggregate(
                 list_transform(generate_series(0, width * height - 1),
                     i -> (31 * i + 7 * vec_id) % 251), 'sum')
             - list_aggregate(
                 list_transform(generate_series(0, (y1 - y0) * (x1 - x0) - 1),
                     i -> (31 * ((y0 + i // (x1 - x0)) * width
                                 + x0 + i % (x1 - x0)) + 7 * vec_id) % 251),
                 'sum')
           AS BIGINT) AS pix_sum
    FROM r
    """,
)
def image_redact_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.images import image_meta, pixel_checksum, redact_regions

    imgs = synth_images_df(spark, sf_dir)
    x0 = (1 + F.col("vec_id") % 3).cast("double")
    x1 = (4 + F.col("vec_id") % 3).cast("double")
    y0 = F.lit(2.0)
    y1 = (3 + F.col("vec_id") % 4).cast("double")
    with_regions = imgs.withColumn(
        "regions", F.array(F.array(x0, y0, x1, y0, x1, y1, x0, y1))
    )
    redacted = redact_regions(with_regions, "image_bytes", "regions")
    with_sum = pixel_checksum(redacted, "image_bytes")
    return image_meta(with_sum, "image_bytes").select("vec_id", "pix_sum")


# ---------------------------------------------------------------------------
# Perceptual-hash image near-dup (operators.images.image_ahash +
# ahash_near_dup_pairs): the multimodal member of the dedup family.
# Synthetic corpus: 256 FIMG images at 16x12, pixel seed = vec_id % 32
# (so each seed group holds 8 images), and every odd vec_id//32 carries
# a one-pixel perturbation (+200 mod 251 at flat index 0) — a controlled
# near-duplicate. The REAL pipeline runs: encode -> mapInPandas
# decode+ahash (6x6 grid = 36 bits) -> banded collision join (4 bands x
# 9 bits) -> exact popcount verify. Every stage is closed-form, so the
# DuckDB twin re-derives the hash bit-for-bit (nearest-sample indices,
# strict-mean threshold, band arithmetic, xor popcount) and the pair
# set hash-matches. Grid 6 keeps the oracle in signed-BIGINT territory;
# production default is grid 8 (64-bit, same code path).
# ---------------------------------------------------------------------------
_PH_N = 256
_PH_GRID = 6
_PH_W, _PH_H = 16, 12
_PH_SEEDS = 32


def _phash_images_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = (
        t(spark, sf_dir, "embeddings")
        .select("vec_id")
        .filter(F.col("vec_id") < _PH_N)
    )
    schema = StructType(
        [StructField("vec_id", LongType()),
         StructField("image_bytes", BinaryType())]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for vid in pdf["vec_id"]:
                vid = int(vid)
                px = synth_pixels(_PH_W, _PH_H, 1, seed=vid % _PH_SEEDS)
                if (vid // _PH_SEEDS) % 2 == 1:
                    px[0, 0, 0] = (int(px[0, 0, 0]) + 200) % 251
                out.append((vid, encode_image(px, 1)))
            yield pd.DataFrame(out, columns=["vec_id", "image_bytes"])

    return base.mapInPandas(gen, schema=schema)


# Closed-form re-derivation of the aHash table (vec_id, ahash) for the
# synthetic corpus above — shared by the near-dup pair query and the
# end-to-end image-curation query.
_PH_HASH_CTES = f"""ids AS (
        SELECT vec_id FROM embeddings WHERE vec_id < {_PH_N}
    ),
    pos AS (SELECT unnest(generate_series(0, {_PH_GRID * _PH_GRID - 1})) AS p),
    vals AS (
        SELECT vec_id, p,
               CASE WHEN ((p // {_PH_GRID}) * {_PH_H} // {_PH_GRID}) * {_PH_W}
                         + ((p % {_PH_GRID}) * {_PH_W} // {_PH_GRID}) = 0
                         AND (vec_id // {_PH_SEEDS}) % 2 = 1
                    THEN ((7 * (vec_id % {_PH_SEEDS})) % 251 + 200) % 251
                    ELSE (31 * (((p // {_PH_GRID}) * {_PH_H} // {_PH_GRID}) * {_PH_W}
                                + ((p % {_PH_GRID}) * {_PH_W} // {_PH_GRID}))
                          + 7 * (vec_id % {_PH_SEEDS})) % 251
               END AS v
        FROM ids CROSS JOIN pos
    ),
    m AS (SELECT vec_id, SUM(v) / {_PH_GRID * _PH_GRID}.0 AS mean
          FROM vals GROUP BY vec_id),
    h AS (
        SELECT vals.vec_id,
               CAST(SUM(CASE WHEN vals.v > m.mean
                             THEN (CAST(1 AS BIGINT) << vals.p) ELSE 0 END)
                    AS BIGINT) AS ahash
        FROM vals JOIN m ON vals.vec_id = m.vec_id
        GROUP BY vals.vec_id
    )"""


@query(
    "image_phash_near_dup",
    f"""
    WITH {_PH_HASH_CTES},
    bands AS (
        SELECT vec_id, ahash, b, (ahash >> (9 * b)) & 511 AS v
        FROM h CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS b)
    ),
    cand AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
                        a.ahash AS h_a, b.ahash AS h_b
        FROM bands a JOIN bands b ON a.b = b.b AND a.v = b.v
                                  AND a.vec_id < b.vec_id
    )
    SELECT id_a, id_b,
           CAST(bit_count(xor(h_a, h_b)) AS INT) AS hamming
    FROM cand
    WHERE bit_count(xor(h_a, h_b)) <= 2
    """,
)
def image_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.images import ahash_near_dup_pairs, image_ahash

    imgs = _phash_images_df(spark, sf_dir)
    hashed = image_ahash(imgs, id_col="vec_id", grid=_PH_GRID)
    pairs = ahash_near_dup_pairs(
        hashed, id_col="vec_id", grid=_PH_GRID, bands=4, max_hamming=2
    )
    return pairs.select(
        "id_a", "id_b", F.col("hamming").cast("int").alias("hamming")
    )


# ---------------------------------------------------------------------------
# End-to-end IMAGE curation — the multimodal twin of curate_corpus and
# the reference user's actual pipeline (E1+E3 shapes) expressed in one
# declarative plan on the new engine: skip-tag gate (P6 arrays_overlap,
# TrainDatasets.py:201-211 semantics) → perceptual-hash dedup keeping
# the smallest id → deterministic 90/5/5 hash split (entity-keyed,
# leakage-free by construction). Tags are closed-form (vec_id % 17 ==
# 0 → 'badimage'), the hash table is the shared CTE block, and the
# split thresholds are the same md5-prefix scheme as curate_corpus — so
# the WHOLE pipeline output (survivor id, hash, copy count, split) is
# value-checked cross-engine.
# ---------------------------------------------------------------------------
@query(
    "curate_images",
    f"""
    WITH {_PH_HASH_CTES},
    tagged AS (
        SELECT vec_id, ahash,
               CASE WHEN vec_id % 17 = 0 THEN 'badimage' ELSE 'keep' END AS tag
        FROM h
    ),
    kept AS (SELECT vec_id, ahash FROM tagged WHERE tag <> 'badimage'),
    dedup AS (
        SELECT ahash, MIN(vec_id) AS vec_id, COUNT(*) AS n_copies
        FROM kept GROUP BY ahash
    )
    SELECT vec_id, ahash, n_copies,
           CASE WHEN substr(md5('img' || CAST(vec_id AS VARCHAR)), 1, 4) < 'e666'
                THEN 'train'
                WHEN substr(md5('img' || CAST(vec_id AS VARCHAR)), 1, 4) < 'f333'
                THEN 'val'
                ELSE 'test' END AS split
    FROM dedup
    """,
)
def curate_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.images import image_ahash
    from ..operators.splits import hash_split_expr

    imgs = _phash_images_df(spark, sf_dir)
    tags = F.when(
        F.col("vec_id") % 17 == 0, F.array(F.lit("badimage"))
    ).otherwise(F.array(F.lit("keep")))
    kept = imgs.withColumn("tags", tags).filter(
        ~F.arrays_overlap(F.col("tags"), F.array(F.lit("badimage")))
    )
    hashed = image_ahash(kept, id_col="vec_id", grid=_PH_GRID)
    dedup = hashed.groupBy("ahash").agg(
        F.min("vec_id").alias("vec_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )
    return dedup.select(
        "vec_id",
        "ahash",
        "n_copies",
        hash_split_expr(
            F.col("vec_id"),
            {"train": 0.9, "val": 0.05, "test": 0.05},
            salt="img",
        ).alias("split"),
    )


# ---------------------------------------------------------------------------
# Video scene-cut detection — the temporal twin of video_frame_sample:
# decode EVERY frame of each FVID clip (every_k=1 through the same
# mapInPandas fan-out), checksum each frame's pixels, then flag a cut
# wherever the frame-energy delta |s_j − s_{j−1}| exceeds a threshold
# via a per-video lag window (the kernel → relational composition a
# real scene detector uses, with frame-difference energy as the
# stand-in metric; a real codec slots into the same decode seam). The
# oracle re-derives every frame energy from the synth_pixels closed
# form and replays the lag — deltas and flags are exact integers.
# ---------------------------------------------------------------------------
_CUT_T = 1000


@query(
    "video_scene_cuts",
    f"""
    WITH frames AS (
        SELECT vec_id, unnest(generate_series(0, 3 + vec_id % 3)) AS j
        FROM embeddings
    ),
    energy AS (
        SELECT vec_id, j,
               CAST(list_aggregate(
                   list_transform(
                       generate_series(0, (8 + (vec_id + j) % 5)
                                          * (6 + j % 3) - 1),
                       i -> (31 * i + 7 * (10 * vec_id + j)) % 251),
                   'sum') AS BIGINT) AS s
        FROM frames
    ),
    lagged AS (
        SELECT vec_id, j AS frame_idx,
               s - LAG(s) OVER (PARTITION BY vec_id ORDER BY j) AS d
        FROM energy
    )
    SELECT vec_id, CAST(frame_idx AS INT) AS frame_idx,
           CAST(abs(d) AS BIGINT) AS energy_delta,
           abs(d) > {_CUT_T} AS is_cut
    FROM lagged WHERE d IS NOT NULL
    """,
)
def video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ..operators.images import pixel_checksum, sample_frames

    vids = synth_videos_df(spark, sf_dir)
    frames = sample_frames(vids, every_k=1, video_col="video_bytes")
    energy = pixel_checksum(frames, "image_bytes").select(
        "vec_id", "frame_idx", F.col("pix_sum").alias("s")
    )
    w = Window.partitionBy("vec_id").orderBy("frame_idx")
    lagged = energy.select(
        "vec_id",
        "frame_idx",
        (F.col("s") - F.lag("s").over(w)).alias("d"),
    )
    return lagged.filter(F.col("d").isNotNull()).select(
        "vec_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        F.abs(F.col("d")).cast("long").alias("energy_delta"),
        (F.abs(F.col("d")) > _CUT_T).alias("is_cut"),
    )
