"""Multimodal binary-column operators (SURVEY.md §2.1 S12/S13, §2.8 G6/G7).

Images/video live *inside* tables as opaque ``binary`` columns with typed
metadata — the reference's model (``image_bytes: pa.binary()``
TrainDatasets.py:134, ``crop: pa.binary()`` :464) — and every pixel-level
operation runs as an Arrow-batched ``mapInPandas`` over those columns, so
the plumbing (schema, batching, partitioning) is exactly what a 100 TB
multimodal pipeline needs.

Codec strategy: PIL is preferred when installed; without it (this
container) real JPEG bytes are handled by the pure-numpy baseline codec
in ``jpegmini.py`` (4:4:4/grayscale sequential, EXIF orientation), and
the deterministic **FIMG fake codec** below (magic ``FIMG`` + u16 dims +
channels + EXIF-style orientation + raw payload) remains the fast
oracle-checked test carrier. Only PNG and exotic JPEG variants
(progressive, subsampled) still require PIL and raise a clearly-marked
``NotImplementedError``; every Spark-side signature stays put across
backends.

Reference behaviors re-expressed:
- EXIF-orientation normalize + re-encode  CvatApi.py:223-239 (G7/S13)
- segmentation redaction (black fill)     TrainDatasets.py:296-310 (G6)
- JPEG directory sink with manifest       TrainDatasets.py:318-368 (S12)
- directory-of-images source              via spark.read.format("binaryFile")
"""

from __future__ import annotations

import os
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FIMG_MAGIC = b"FIMG"
_HEADER = struct.Struct(">4sHHBB")  # magic, width, height, channels, orientation

# Real-codec seam: PIL is selected by import-availability. When present,
# decode_image/encode_image handle actual JPEG/PNG bytes (EXIF
# orientation included — CvatApi.py:223-239 semantics); when absent (this
# container), real formats are *detected* and rejected with a
# clearly-marked NotImplementedError while the deterministic FIMG codec
# keeps every Spark-side signature, schema, and test exercisable. The
# swap is proven by tests/test_images.py::test_real_codec_seam, which
# asserts whichever branch the environment provides.
try:  # pragma: no cover - which branch runs depends on the environment
    from PIL import Image as _PILImage

    HAS_PIL = True
except ImportError:  # pragma: no cover
    _PILImage = None
    HAS_PIL = False

_EXIF_ORIENTATION_TAG = 274


def encode_image(
    pixels: np.ndarray, orientation: int = 1, fmt: str = "fimg"
) -> bytes:
    """Encode an (h, w) or (h, w, c) uint8 array. ``fmt='fimg'`` is the
    deterministic stand-in; ``'png'``/``'jpeg'`` use PIL when available
    (orientation metadata is only representable in the FIMG header and
    EXIF-capable formats; PNG ignores it)."""
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, c = pixels.shape
    if fmt == "fimg":
        return _HEADER.pack(FIMG_MAGIC, w, h, c, orientation) + pixels.astype(
            np.uint8
        ).tobytes()
    if not HAS_PIL:
        if fmt == "jpeg":
            from .jpegmini import encode_baseline_jpeg

            return encode_baseline_jpeg(
                pixels[:, :, 0] if c == 1 else pixels,
                orientation=orientation,
            )
        raise NotImplementedError(
            f"STUB: encoding {fmt!r} requires PIL, which is not installed "
            "in this container. JPEG (jpegmini baseline codec) and FIMG "
            "are the available fallbacks."
        )
    import io

    arr = pixels.astype(np.uint8)
    img = _PILImage.fromarray(arr[:, :, 0] if c == 1 else arr)
    buf = io.BytesIO()
    img.save(buf, format=fmt.upper())
    return buf.getvalue()


def decode_image(data: bytes) -> tuple[np.ndarray, int]:
    """Decode image bytes → ((h, w, c) uint8 array, EXIF orientation).

    FIMG decodes natively; JPEG/PNG decode via PIL when available and
    raise the documented NotImplementedError otherwise."""
    head = bytes(data[:4])
    if head != FIMG_MAGIC:
        if head[:3] == b"\xff\xd8\xff" or head == b"\x89PNG":
            if HAS_PIL:
                import io

                img = _PILImage.open(io.BytesIO(bytes(data)))
                orientation = int(
                    img.getexif().get(_EXIF_ORIENTATION_TAG, 1)
                )
                px = np.asarray(img, dtype=np.uint8)
                if px.ndim == 2:
                    px = px[:, :, None]
                return px.copy(), orientation
            if head[:3] == b"\xff\xd8\xff":
                # no PIL: the pure-numpy baseline codec decodes real
                # JPEG bytes (4:4:4/grayscale sequential; EXIF
                # orientation) — progressive/subsampled raise there.
                from .jpegmini import decode_baseline_jpeg

                return decode_baseline_jpeg(bytes(data))
            raise NotImplementedError(
                "STUB: PNG decode requires PIL, which is not installed "
                "in this container. JPEG decodes via the jpegmini "
                "baseline codec; swap in PIL-backed versions for full "
                "format coverage in production."
            )
        raise ValueError("not a FIMG image")
    _, w, h, c, orientation = _HEADER.unpack(bytes(data[: _HEADER.size]))
    px = np.frombuffer(bytes(data), dtype=np.uint8, offset=_HEADER.size)
    return px.reshape(h, w, c).copy(), orientation


def synth_pixels(width: int, height: int, channels: int = 1, seed: int = 0) -> np.ndarray:
    """Deterministic pixel pattern (value = (31*i + 7*seed) mod 251)."""
    n = width * height * channels
    return ((31 * np.arange(n, dtype=np.int64) + 7 * seed) % 251).astype(
        np.uint8
    ).reshape(height, width, channels)


def normalize_orientation(pixels: np.ndarray, orientation: int) -> np.ndarray:
    """Undo EXIF-style orientation (subset the reference handles:
    1 = as-is, 3 = 180°, 6 = 90° CW stored → rotate CCW to view,
    8 = 90° CCW stored → rotate CW; CvatApi.py:227-236)."""
    if orientation == 3:
        return np.rot90(pixels, 2)
    if orientation == 6:
        return np.rot90(pixels, 3)
    if orientation == 8:
        return np.rot90(pixels, 1)
    return pixels


def fill_polygon_mask(mask: np.ndarray, polygon: np.ndarray) -> None:
    """Even-odd scanline polygon fill into a boolean (h, w) mask — the
    numpy stand-in for PIL ImageDraw.polygon(fill=...) used by the
    reference's redaction (TrainDatasets.py:303-309)."""
    h, w = mask.shape
    xs, ys = polygon[:, 0], polygon[:, 1]
    y0 = max(int(np.floor(ys.min())), 0)
    y1 = min(int(np.ceil(ys.max())), h - 1)
    n = len(polygon)
    for y in range(y0, y1 + 1):
        yc = y + 0.5
        crossings = []
        for i in range(n):
            x_a, y_a = xs[i], ys[i]
            x_b, y_b = xs[(i + 1) % n], ys[(i + 1) % n]
            if (y_a <= yc < y_b) or (y_b <= yc < y_a):
                t = (yc - y_a) / (y_b - y_a)
                crossings.append(x_a + t * (x_b - x_a))
        crossings.sort()
        for j in range(0, len(crossings) - 1, 2):
            xa = max(int(np.ceil(crossings[j] - 0.5)), 0)
            xb = min(int(np.floor(crossings[j + 1] - 0.5)), w - 1)
            if xb >= xa:
                mask[y, xa : xb + 1] = True


def resize_nearest(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize (h, w, c) → (out_h, out_w, c)."""
    h, w = pixels.shape[:2]
    rows = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    cols = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return pixels[rows][:, cols]


# ---------------------------------------------------------------------------
# Spark-side operators (Arrow-batched mapInPandas)
# ---------------------------------------------------------------------------

IMAGE_META_FIELDS = [
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("orientation", IntegerType()),
    StructField("n_bytes", LongType()),
]


def _meta_schema(df: DataFrame, image_col: str) -> StructType:
    keep = [f for f in df.schema.fields if f.name != image_col]
    return StructType(keep + IMAGE_META_FIELDS)


def image_meta(df: DataFrame, image_col: str = "image_bytes") -> DataFrame:
    """Decode binary column → typed metadata columns, dropping the pixels
    (the 'describe the blob' half of S12's manifest)."""
    schema = _meta_schema(df, image_col)
    other = [f.name for f in schema.fields if f.name not in
             {"width", "height", "channels", "orientation", "n_bytes"}]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for b in pdf[image_col]:
                px, orientation = decode_image(b)
                h, w, c = px.shape
                metas.append((w, h, c, orientation, len(b)))
            out = pdf[other].copy()
            out[["width", "height", "channels", "orientation", "n_bytes"]] = (
                pd.DataFrame(metas, index=pdf.index)
            )
            yield out

    return df.mapInPandas(gen, schema=schema)


def _transform_images(df: DataFrame, image_col: str, fn) -> DataFrame:
    """Shared binary→binary mapInPandas scaffold (same schema out)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[image_col] = [fn(b) for b in pdf[image_col]]
            yield pdf

    return df.mapInPandas(gen, schema=df.schema)


def exif_normalize(df: DataFrame, image_col: str = "image_bytes") -> DataFrame:
    """G7/S13: apply stored orientation, re-encode upright
    (CvatApi.py:223-239)."""

    def fix(b: bytes) -> bytes:
        px, orientation = decode_image(b)
        return encode_image(normalize_orientation(px, orientation), 1)

    return _transform_images(df, image_col, fix)


def redact_regions(
    df: DataFrame,
    image_col: str = "image_bytes",
    regions_col: str = "regions",
) -> DataFrame:
    """G6: fill each flat-polygon region with black
    (TrainDatasets.py:296-310). ``regions_col`` is array<array<double>>."""
    cols = df.columns

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_bytes = []
            for b, regions in zip(pdf[image_col], pdf[regions_col]):
                px, orientation = decode_image(b)
                if regions is not None and len(regions):
                    mask = np.zeros(px.shape[:2], dtype=bool)
                    for seg in regions:
                        poly = np.asarray(seg, dtype=np.float64).reshape(-1, 2)
                        if len(poly) >= 3:
                            fill_polygon_mask(mask, poly)
                    px = px.copy()
                    px[mask] = 0
                out_bytes.append(encode_image(px, orientation))
            pdf = pdf.copy()
            pdf[image_col] = out_bytes
            yield pdf[cols]

    return df.mapInPandas(gen, schema=df.schema)


def resize_images(
    df: DataFrame, out_w: int, out_h: int, image_col: str = "image_bytes"
) -> DataFrame:
    """Nearest-neighbor thumbnail/crop-resize (feature-extraction prep)."""

    def rz(b: bytes) -> bytes:
        px, orientation = decode_image(b)
        return encode_image(resize_nearest(px, out_w, out_h), orientation)

    return _transform_images(df, image_col, rz)


def pixel_checksum(df: DataFrame, image_col: str = "image_bytes") -> DataFrame:
    """Adds ``pix_sum`` (int64 sum over pixel values) — golden-test hook
    for pixel-level transforms."""
    schema = StructType(df.schema.fields + [StructField("pix_sum", LongType())])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["pix_sum"] = [
                int(decode_image(b)[0].astype(np.int64).sum())
                for b in pdf[image_col]
            ]
            yield pdf

    return df.mapInPandas(gen, schema=schema)


# ---------------------------------------------------------------------------
# Fake video: concatenated FIMG frames
# ---------------------------------------------------------------------------

def encode_video(frames: list[np.ndarray]) -> bytes:
    return b"".join(encode_image(f) for f in frames)


def iter_video_frames(data: bytes) -> Iterator[tuple[int, bytes]]:
    """(frame_idx, frame_bytes) pairs from a concatenated-FIMG blob.

    Module-level on purpose: closures shipped to executors must reference
    it (and not the struct.Struct header) so cloudpickle serializes by
    module reference.
    """
    off, idx = 0, 0
    while off + _HEADER.size <= len(data):
        _, w, h, c, _o = _HEADER.unpack(bytes(data[off : off + _HEADER.size]))
        frame_len = _HEADER.size + w * h * c
        yield idx, bytes(data[off : off + frame_len])
        off += frame_len
        idx += 1


def sample_frames(
    df: DataFrame,
    every_k: int,
    video_col: str = "video_bytes",
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Explode every k-th frame of a multi-frame binary column into
    (id_cols..., frame_idx, image_bytes) rows — the frame-sample step of
    a video pipeline, with the fan-out running inside mapInPandas."""
    id_cols = id_cols or [c for c in df.columns if c != video_col]
    schema = StructType(
        [f for f in df.schema.fields if f.name in id_cols]
        + [StructField("frame_idx", IntegerType()),
           StructField("image_bytes", BinaryType())]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                ids = tuple(row[c_] for c_ in id_cols)
                for idx, frame in iter_video_frames(row[video_col]):
                    if idx % every_k == 0:
                        rows.append(ids + (idx, frame))
            yield pd.DataFrame(rows, columns=id_cols + ["frame_idx", "image_bytes"])

    return df.mapInPandas(gen, schema=schema)


# ---------------------------------------------------------------------------
# Directory sink/source (S12/S13)
# ---------------------------------------------------------------------------

def write_image_dir(
    df: DataFrame,
    out_dir: str,
    name_col: str = "image_name",
    image_col: str = "image_bytes",
    ext: str = ".fimg",
) -> DataFrame:
    """S12: write one file per row from executors; returns the manifest
    DataFrame (name, width, height, n_bytes) like the reference's
    obj-detect exporter (TrainDatasets.py:318-368)."""
    os.makedirs(out_dir, exist_ok=True)
    payload = df.select(name_col, image_col)

    def write_partition(rows):
        for row in rows:
            with open(os.path.join(out_dir, row[name_col] + ext), "wb") as f:
                f.write(bytes(row[image_col]))

    payload.foreachPartition(write_partition)
    return image_meta(df.select(name_col, image_col), image_col)


def read_image_dir(spark: SparkSession, path: str, glob: str = "*.fimg") -> DataFrame:
    """S13: directory-of-images source via the built-in binaryFile format
    (path, modificationTime, length, content)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select(
            F.regexp_extract(F.col("path"), r"([^/]+)\.[A-Za-z0-9]+$", 1).alias(
                "image_name"
            ),
            F.col("content").alias("image_bytes"),
            F.col("length").alias("n_bytes"),
        )
    )


# ---------------------------------------------------------------------------
# Perceptual hashing (average hash) — image near-duplicate detection over
# binary columns. The hash kernel runs where the pixels are (inside the
# mapInPandas decode pass); candidate generation is banded hash-key
# collision, the same sub-quadratic shape as the SimHash text path
# (operators.dedup): at 100 TB the pair join is keyed on (band, value)
# buckets, never all-pairs.
# ---------------------------------------------------------------------------

def ahash_bits(pixels: np.ndarray, grid: int = 8) -> int:
    """Average-hash of channel 0: nearest-sample a grid x grid matrix
    (sy = gy*h // grid, sx = gx*w // grid), threshold at the strict
    sample mean, bit p = gy*grid + gx. Deterministic integer/float64
    arithmetic only, so an independent SQL engine reproduces it exactly
    on closed-form pixels. Returned as a SIGNED 64-bit value (two's
    complement wrap) so it stores in a Spark LongType."""
    h, w = pixels.shape[0], pixels.shape[1]
    ys = (np.arange(grid) * h) // grid
    xs = (np.arange(grid) * w) // grid
    sample = pixels[np.ix_(ys, xs)][:, :, 0].astype(np.float64).ravel()
    mean = float(sample.mean())
    bits = 0
    for p, v in enumerate(sample):
        if v > mean:
            bits |= 1 << p
    if bits >= 1 << 63:
        bits -= 1 << 64
    return bits


def image_ahash(
    df: DataFrame,
    id_col: str = "vec_id",
    image_col: str = "image_bytes",
    grid: int = 8,
) -> DataFrame:
    """(id, ahash) per image — one Arrow-batched decode+hash pass."""
    schema = StructType(
        [
            next(f for f in df.schema.fields if f.name == id_col),
            StructField("ahash", LongType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                (i, ahash_bits(decode_image(b)[0], grid))
                for i, b in zip(pdf[id_col], pdf[image_col])
            ]
            yield pd.DataFrame(out, columns=[id_col, "ahash"])

    return df.mapInPandas(gen, schema=schema)


def ahash_near_dup_pairs(
    hashed: DataFrame,
    id_col: str = "vec_id",
    hash_col: str = "ahash",
    grid: int = 8,
    bands: int = 4,
    max_hamming: int = 2,
) -> DataFrame:
    """Near-duplicate image pairs from banded hash collisions.

    The grid*grid hash splits into ``bands`` contiguous bit bands; two
    images are candidates iff SOME band matches exactly (images within
    ``max_hamming`` differing bits collide on >= bands - max_hamming
    bands, so recall is structural for small distances). Candidates are
    verified with the exact popcount Hamming distance. All expression
    work (shifts, masks, xor, bit_count) is JVM-side.
    Output: (id_a, id_b, hamming), id_a < id_b, hamming <= max_hamming.
    """
    band_bits = (grid * grid) // bands
    mask = (1 << band_bits) - 1
    side = hashed.select(
        F.col(id_col).alias("id"),
        F.col(hash_col).alias("h"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("b"),
                        F.shiftrightunsigned(F.col(hash_col), b * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("v"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("id", "h", F.col("band.b").alias("b"), F.col("band.v").alias("v"))
    a, b = side.alias("a"), side.alias("b")
    cand = (
        a.join(b, ["b", "v"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.h").alias("h_a"),
            F.col("b.h").alias("h_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
