"""Multimodal binary-column tests — codec, pixel kernels, Spark plumbing,
directory sink/source, and oracle parity for the metadata queries."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from ml_pipelines_spark.operators.images import (
    decode_image,
    encode_image,
    encode_video,
    exif_normalize,
    fill_polygon_mask,
    image_meta,
    normalize_orientation,
    pixel_checksum,
    read_image_dir,
    redact_regions,
    resize_images,
    resize_nearest,
    sample_frames,
    synth_pixels,
    write_image_dir,
)
from ml_pipelines_spark.testing import check_query


class TestCodec:
    def test_roundtrip(self):
        px = synth_pixels(13, 7, 3, seed=5)
        data = encode_image(px, orientation=6)
        out, orientation = decode_image(data)
        assert orientation == 6
        assert np.array_equal(out, px)

    def test_real_jpeg_decodes_and_png_is_clearly_stubbed(self):
        # real JPEG bytes decode (PIL when installed, jpegmini baseline
        # codec otherwise); truncated JPEG garbage is a hard error, and
        # PNG without PIL is the remaining documented stub.
        from ml_pipelines_spark.operators.jpegmini import (
            encode_baseline_jpeg,
        )

        px = synth_pixels(9, 7, 1, seed=2)[:, :, 0]
        out, orientation = decode_image(encode_baseline_jpeg(px))
        assert orientation == 1 and out.shape == (7, 9, 1)
        with pytest.raises(ValueError):
            decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 32)
        from ml_pipelines_spark.operators.images import HAS_PIL

        if not HAS_PIL:
            with pytest.raises(NotImplementedError, match="STUB"):
                decode_image(b"\x89PNG" + b"\x00" * 32)

    def test_garbage_rejected(self):
        with pytest.raises(ValueError):
            decode_image(b"NOPE" + b"\x00" * 16)

    def test_orientation_normalize(self):
        px = synth_pixels(4, 2, 1, seed=1)
        assert normalize_orientation(px, 1) is px
        assert np.array_equal(normalize_orientation(px, 3), np.rot90(px, 2))
        # 90-degree variants swap dims
        assert normalize_orientation(px, 6).shape[:2] == (4, 2)
        assert normalize_orientation(px, 8).shape[:2] == (4, 2)
        # rotations are pixel-preserving permutations
        for o in (3, 6, 8):
            assert normalize_orientation(px, o).sum() == px.sum()


class TestPixelKernels:
    def test_fill_polygon_square(self):
        mask = np.zeros((10, 10), dtype=bool)
        poly = np.array([[2, 2], [8, 2], [8, 8], [2, 8]], dtype=float)
        fill_polygon_mask(mask, poly)
        assert mask[3, 3] and mask[7, 7]
        assert not mask[0, 0] and not mask[9, 9]
        assert mask.sum() == 36  # pixel centers strictly inside [2,8]²

    def test_fill_polygon_triangle(self):
        mask = np.zeros((10, 10), dtype=bool)
        fill_polygon_mask(mask, np.array([[0, 0], [9, 0], [0, 9]], dtype=float))
        assert mask[1, 1]
        assert not mask[9, 9]

    def test_resize_nearest(self):
        px = synth_pixels(8, 8, 1, seed=0)
        out = resize_nearest(px, 4, 4)
        assert out.shape == (4, 4, 1)
        assert np.array_equal(out[0, 0], px[0, 0])
        up = resize_nearest(px, 16, 16)
        assert np.array_equal(up[::2, ::2], px)


@pytest.fixture(scope="module")
def image_df(spark):
    rows = []
    for i in range(8):
        px = synth_pixels(10 + i, 6 + i, 1, seed=i)
        rows.append((f"img_{i}", bytearray(encode_image(px, [1, 3, 6, 8][i % 4]))))
    schema = StructType(
        [StructField("image_name", StringType()),
         StructField("image_bytes", BinaryType())]
    )
    return spark.createDataFrame(rows, schema)


class TestSparkPlumbing:
    def test_image_meta(self, image_df):
        pdf = image_meta(image_df).toPandas().set_index("image_name")
        for i in range(8):
            r = pdf.loc[f"img_{i}"]
            assert (r["width"], r["height"]) == (10 + i, 6 + i)
            assert r["n_bytes"] == 10 + (10 + i) * (6 + i)

    def test_exif_normalize_swaps_dims(self, image_df):
        out = image_meta(exif_normalize(image_df)).toPandas().set_index("image_name")
        for i in range(8):
            r = out.loc[f"img_{i}"]
            assert r["orientation"] == 1
            if [1, 3, 6, 8][i % 4] in (6, 8):
                assert (r["width"], r["height"]) == (6 + i, 10 + i)
            else:
                assert (r["width"], r["height"]) == (10 + i, 6 + i)

    def test_redact_matches_numpy_golden(self, spark):
        px = synth_pixels(20, 20, 1, seed=3)
        region = [2.0, 2.0, 12.0, 2.0, 12.0, 12.0, 2.0, 12.0]
        schema = StructType(
            [
                StructField("image_bytes", BinaryType()),
                StructField("regions", ArrayType(ArrayType(DoubleType()))),
            ]
        )
        df = spark.createDataFrame(
            [(bytearray(encode_image(px)), [region])], schema
        )
        out = pixel_checksum(redact_regions(df)).toPandas()
        # golden: same kernel applied directly
        from ml_pipelines_spark.operators.images import fill_polygon_mask as fpm

        mask = np.zeros((20, 20), dtype=bool)
        fpm(mask, np.array(region).reshape(-1, 2))
        want = px.copy()
        want[mask] = 0
        assert out["pix_sum"][0] == int(want.astype(np.int64).sum())
        assert int(mask.sum()) == 100  # 10x10 interior

    def test_resize_images(self, image_df):
        out = image_meta(resize_images(image_df, 5, 4)).toPandas()
        assert set(zip(out["width"], out["height"])) == {(5, 4)}

    def test_sample_frames(self, spark):
        frames = [synth_pixels(6, 4, 1, seed=s) for s in range(10)]
        schema = StructType(
            [StructField("clip_id", StringType()),
             StructField("video_bytes", BinaryType())]
        )
        df = spark.createDataFrame(
            [("clip_a", bytearray(encode_video(frames)))], schema
        )
        out = sample_frames(df, every_k=3, video_col="video_bytes").toPandas()
        assert list(out["frame_idx"]) == [0, 3, 6, 9]
        px0, _ = decode_image(out["image_bytes"][0])
        assert np.array_equal(px0, frames[0])

    def test_write_read_image_dir(self, spark, image_df, tmp_path):
        out_dir = str(tmp_path / "imgs")
        manifest = write_image_dir(image_df, out_dir)
        assert manifest.count() == 8
        back = read_image_dir(spark, out_dir)
        pdf = back.toPandas().set_index("image_name")
        assert len(pdf) == 8
        src = image_df.toPandas().set_index("image_name")
        for name in src.index:
            assert bytes(pdf.loc[name, "image_bytes"]) == bytes(
                src.loc[name, "image_bytes"]
            )


@pytest.mark.parametrize("name", ["image_meta_decode", "image_exif_normalize"])
def test_oracle_parity(spark, sf_dir, name):
    assert check_query(spark, sf_dir, name) == []


def test_real_codec_seam():
    """The PIL seam is proven in BOTH environments: with PIL installed,
    real PNG bytes round-trip through decode_image (orientation default
    1); without it, the documented NotImplementedError fires. Either
    way the dispatch itself is exercised — the production swap is an
    environment change, not a code change."""
    import numpy as np
    import pytest

    from ml_pipelines_spark.operators.images import (
        HAS_PIL,
        decode_image,
        encode_image,
        synth_pixels,
    )

    if not HAS_PIL:
        # real JPEG bytes decode without PIL via the jpegmini baseline
        # codec; PNG remains PIL-only and raises the documented stub.
        px = synth_pixels(12, 8, channels=1)
        data = encode_image(px, orientation=6, fmt="jpeg")
        assert bytes(data[:3]) == b"\xff\xd8\xff"
        out, orientation = decode_image(data)
        assert orientation == 6
        assert out.shape == px.shape
        with pytest.raises(NotImplementedError):
            encode_image(synth_pixels(4, 4), fmt="png")
        return
    px = synth_pixels(6, 4, channels=3)
    data = encode_image(px, fmt="png")
    assert bytes(data[:4]) == b"\x89PNG"
    out, orientation = decode_image(data)
    assert orientation == 1
    assert np.array_equal(out, px)


# ---------------------------------------------------------------------------
# Perceptual average-hash near-dup (operators.images.image_ahash /
# ahash_near_dup_pairs)
# ---------------------------------------------------------------------------
def test_ahash_identical_and_perturbed(spark):
    import numpy as np

    from ml_pipelines_spark.operators.images import (
        ahash_bits,
        ahash_near_dup_pairs,
        encode_image,
        image_ahash,
        synth_pixels,
    )

    px = synth_pixels(16, 12, 1, seed=3)
    noisy = px.copy()
    noisy[0, 0, 0] = (int(noisy[0, 0, 0]) + 200) % 251
    # kernel determinism + sensitivity
    assert ahash_bits(px, 6) == ahash_bits(px.copy(), 6)
    assert ahash_bits(px, 6) != ahash_bits(noisy, 6)

    rows = [
        (0, bytearray(encode_image(px, 1))),
        (1, bytearray(encode_image(px, 1))),        # exact dup of 0
        (2, bytearray(encode_image(noisy, 1))),      # near dup of 0
        (3, bytearray(encode_image(synth_pixels(16, 12, 1, seed=9), 1))),
    ]
    df = spark.createDataFrame(rows, "vec_id long, image_bytes binary")
    hashed = image_ahash(df, grid=6)
    hs = {r["vec_id"]: r["ahash"] for r in hashed.collect()}
    assert hs[0] == hs[1]

    # pigeonhole recall: any pair within max_hamming bits MUST collide on
    # at least one of the 4 bands, so (0,1) is guaranteed; (0,2) iff its
    # true hamming <= 2 (compute it and assert consistency)
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in ahash_near_dup_pairs(
            hashed, grid=6, bands=4, max_hamming=2
        ).collect()
    }
    assert pairs[(0, 1)] == 0
    true_d = bin(hs[0] ^ hs[2]).count("1")
    if true_d <= 2:
        assert pairs[(0, 2)] == true_d
    else:
        assert (0, 2) not in pairs
