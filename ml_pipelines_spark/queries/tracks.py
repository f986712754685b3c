"""Track interpolation query — the W4 applyInPandas kernel over synthetic
tracks, hash-checked against a closed-form SQL oracle (the synthetic
keyframes make the kernel's motion exactly linear; general tracks are
property-tested in tests/test_cvat_tracks.py; reference CvatApi.py:427-731).

Synthetic tracks: every embeddings row becomes a track whose two
keyframe polygons are derived from the embedding (frames 0 and
4 + vec_id % 4); the kernel gap-fills and propagates to end_frame 12.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..operators.tracks import interpolate_tracks
from .registry import query
from .relational import t

_KEYFRAMES_SCHEMA = StructType(
    [
        StructField("track_id", LongType()),
        StructField("frame", IntegerType()),
        StructField("points", ArrayType(DoubleType())),
        StructField("outside", BooleanType()),
    ]
)


def _keyframes_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    poly = F.transform(
        F.slice("embedding", 1, 8), lambda v: v.cast("double") * 300.0 + 400.0
    )
    shifted = F.transform(poly, lambda v: v + 50.0)
    last_frame = (F.lit(4) + F.col("vec_id") % 4).cast("int")
    kf0 = emb.select(
        F.col("vec_id").alias("track_id"),
        F.lit(0).cast("int").alias("frame"),
        poly.alias("points"),
        F.lit(False).alias("outside"),
    )
    kf1 = emb.select(
        F.col("vec_id").alias("track_id"),
        last_frame.alias("frame"),
        shifted.alias("points"),
        F.lit(False).alias("outside"),
    )
    return kf0.unionByName(kf1)


# The synthetic tracks make the kernel's output closed-form: both
# keyframe polygons have identical point structure (a pure +50
# translation), so CVAT interpolation reduces to per-point linear
# motion — x(f) = p + 50*min(f, L)/L with L = 4 + vec_id % 4 — and the
# whole dense grid (12 frames per track, 8 coords per frame, keyframe
# flags at 0 and L) is exactly SQL-derivable. The oracle recomputes it
# value-for-value, so the ENTIRE kernel path — grouping, gap-fill,
# propagation to end_frame, point ordering — is hash-checked, not just
# row counts. General (shape-changing) tracks stay property-tested in
# tests/test_cvat_tracks.py.
@query(
    "track_interpolation",
    """
    WITH e AS (
        SELECT vec_id,
               CAST(embedding[1] AS DOUBLE) * 300.0 + 400.0 AS p0x,
               CAST(embedding[2] AS DOUBLE) * 300.0 + 400.0 AS p0y,
               4 + vec_id % 4 AS L
        FROM embeddings
    ),
    g AS (
        SELECT vec_id, unnest(generate_series(0, 11)) AS f FROM embeddings
    )
    SELECT g.vec_id AS track_id,
           CAST(g.f AS INT) AS frame,
           (g.f = 0 OR g.f = e.L) AS keyframe,
           CAST(8 AS INT) AS n_coords,
           ROUND(e.p0x + 50.0 * least(g.f, e.L) / e.L, 3) AS x0,
           ROUND(e.p0y + 50.0 * least(g.f, e.L) / e.L, 3) AS y0
    FROM g JOIN e ON g.vec_id = e.vec_id
    """,
)
def track_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    dense = interpolate_tracks(_keyframes_df(spark, sf_dir), end_frame=12)
    # No orderBy: the driver's comparison is order-insensitive, and a
    # global sort would add a range-partitioner sample pass that executes
    # the whole Python kernel a second time.
    return dense.select(
        "track_id",
        "frame",
        "keyframe",
        F.size("points").alias("n_coords"),
        F.round(F.element_at("points", 1), 3).alias("x0"),
        F.round(F.element_at("points", 2), 3).alias("y0"),
    )


# ---------------------------------------------------------------------------
# J5 tag attachment (reference lookup_tags, CvatApi.py:241-248 +
# create_image_feather :250-315) exercised through the REAL operator
# (sources.cvat.attach_tags: broadcast label-dimension join + per-image
# aggregation + left join back) on table-derived synthetic payloads so
# the whole join/collect/coalesce semantics are value-checked
# cross-engine: tags come from embeddings by formula (frame = vec_id %
# 16 on image vec_id % 40, label vec_id % 3), images span vec_id % 50 —
# so ids 40-49 are untagged and must survive with an empty list. The
# REST-walk plumbing that produces these same frames stays covered by
# the fake-transport equivalence tests in tests/test_cvat_tracks.py.
# ---------------------------------------------------------------------------
@query(
    "cvat_image_tags",
    """
    WITH tags AS (
        SELECT 'img_' || CAST(vec_id % 40 AS VARCHAR) || '.jpeg' AS image_name,
               vec_id % 3 AS label_id
        FROM embeddings
    ),
    named AS (
        SELECT image_name,
               CASE label_id WHEN 0 THEN 'car' WHEN 1 THEN 'person'
                    ELSE 'truck' END AS tag
        FROM tags
    ),
    per_image AS (
        SELECT image_name, list_sort(list(tag)) AS tags
        FROM named GROUP BY image_name
    ),
    images AS (
        SELECT DISTINCT 'img_' || CAST(vec_id % 50 AS VARCHAR) || '.jpeg'
                   AS image_name
        FROM embeddings
    )
    SELECT i.image_name,
           CAST(COALESCE(len(p.tags), 0) AS INT) AS n_tags,
           COALESCE(array_to_string(p.tags, ','), '') AS tags_str
    FROM images i LEFT JOIN per_image p USING (image_name)
    """,
)
def cvat_image_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.cvat import attach_tags, labels_df

    emb = t(spark, sf_dir, "embeddings")
    tags = emb.select(
        F.concat(
            F.lit("img_"), (F.col("vec_id") % 40).cast("string"),
            F.lit(".jpeg"),
        ).alias("image_name"),
        (F.col("vec_id") % 3).cast("long").alias("label_id"),
    )
    images = (
        emb.select(
            F.concat(
                F.lit("img_"), (F.col("vec_id") % 50).cast("string"),
                F.lit(".jpeg"),
            ).alias("image_name")
        )
        .distinct()
    )
    labels = labels_df(spark, {0: "car", 1: "person", 2: "truck"})
    out = attach_tags(images, tags, labels)
    return out.select(
        "image_name",
        F.size("tags").alias("n_tags"),
        F.array_join("tags", ",").alias("tags_str"),
    )
