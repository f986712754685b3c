"""Export queries — COCO record assembly and YOLO line formatting, both
oracle-backed (SURVEY.md §2.1 S10/S11, §3 E3).

A synthetic annotation corpus is derived deterministically from the
driver tables: ``orders`` plays the image table (one image per order,
dims derived from the key), ``lineitem`` plays the annotations (an
axis-aligned rectangle per line item, category = l_returnflag). The
DuckDB oracle rebuilds the same corpus and the same dense-id assignment,
so the entire export pipeline — dictionary encode, id assignment, image
join, box math, line formatting — is value-checked end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sinks.coco import coco_annotations
from ..sinks.yolo import yolo_lines
from .registry import query
from .relational import t

# Synthetic corpus (identical arithmetic both sides; all exact in float64).
_CORPUS_SQL = """
    images AS (
        SELECT 'img_' || o_orderkey AS image_name,
               640 + o_orderkey % 1280 AS width,
               480 + o_orderkey % 600  AS height
        FROM orders
    ),
    anno AS (
        -- The synthetic lineitem even contains full key duplicates
        -- (same orderkey/linenumber/partkey/suppkey, different measures),
        -- so the dense-id ordering tie-breaks on the measures too; rows
        -- that still tie are identical and therefore order-insensitive.
        SELECT 'img_' || l_orderkey AS image_name,
               l_returnflag AS category,
               l_linenumber * 1000000000000 + l_partkey * 1000000 + l_suppkey
                   AS sort_key,
               l_quantity AS tie_q, l_discount AS tie_d,
               CAST(l_partkey % 1000 AS DOUBLE) AS cx,
               CAST(l_suppkey % 1000 AS DOUBLE) AS cy,
               l_quantity * 5.0 AS w,
               l_discount * 1000.0 + 10.0 AS h
        FROM lineitem
    )
"""


def _images_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "orders").select(
        F.concat(F.lit("img_"), F.col("o_orderkey")).alias("image_name"),
        (640 + F.col("o_orderkey") % 1280).alias("width"),
        (480 + F.col("o_orderkey") % 600).alias("height"),
    )


def _anno_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    cx = (F.col("l_partkey") % 1000).cast("double")
    cy = (F.col("l_suppkey") % 1000).cast("double")
    w = F.col("l_quantity") * 5.0
    h = F.col("l_discount") * 1000.0 + 10.0
    return li.select(
        F.concat(F.lit("img_"), F.col("l_orderkey")).alias("image_name"),
        F.col("l_returnflag").alias("category"),
        (
            F.col("l_linenumber").cast("long") * 1000000000000
            + F.col("l_partkey") * 1000000
            + F.col("l_suppkey")
        ).alias("sort_key"),
        F.col("l_quantity").alias("tie_q"),
        F.col("l_discount").alias("tie_d"),
        F.array(cx, cy, cx + w, cy, cx + w, cy + h, cx, cy + h).alias(
            "segmentation"
        ),
        F.array(cx, cy, w, h, F.lit(0.0)).alias("rcoco"),
    )


# ---------------------------------------------------------------------------
# S10/E3: COCO annotation records — category dictionary-encode (ids from
# 1, sorted), dense 0-based image/annotation ids, image join, rcoco area.
# Reference: create_coco_from_feather.py:46-116.
# ---------------------------------------------------------------------------
@query(
    "coco_records",
    "WITH " + _CORPUS_SQL + """
    , cats AS (
        SELECT category AS name,
               CAST(ROW_NUMBER() OVER (ORDER BY category) AS INT) AS category_id
        FROM (SELECT DISTINCT category FROM anno)
    ),
    imgs AS (
        SELECT image_name,
               CAST(ROW_NUMBER() OVER (ORDER BY image_name) - 1 AS INT) AS image_id
        FROM images
    )
    SELECT CAST(ROW_NUMBER() OVER (
               ORDER BY a.image_name, a.sort_key, a.tie_q, a.tie_d) - 1 AS INT)
               AS anno_id,
           i.image_id, c.category_id, 0 AS iscrowd,
           ROUND(a.cx, 4) AS b0, ROUND(a.cy, 4) AS b1,
           ROUND(a.w, 4) AS b2, ROUND(a.h, 4) AS b3,
           ROUND(a.w * a.h, 4) AS area
    FROM anno a
    JOIN imgs i USING (image_name)
    JOIN cats c ON a.category = c.name
    """,
)
def coco_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    recs = coco_annotations(
        _anno_df(spark, sf_dir),
        _images_df(spark, sf_dir),
        odtk=True,
        train=True,
        order_cols=["image_name", "sort_key", "tie_q", "tie_d"],
    )
    return recs.select(
        "anno_id",
        "image_id",
        "category_id",
        "iscrowd",
        F.round(F.element_at("bbox", 1), 4).alias("b0"),
        F.round(F.element_at("bbox", 2), 4).alias("b1"),
        F.round(F.element_at("bbox", 3), 4).alias("b2"),
        F.round(F.element_at("bbox", 4), 4).alias("b3"),
        F.round("area", 4).alias("area"),
    )


# ---------------------------------------------------------------------------
# S11/E3: YOLO annotation lines — "<cat_id> <xc> <yc> <w> <h>" normalized
# to image dims, fixed-point %.6f. Reference:
# create_yolo_from_feather.py:13-23 (box math), :58-68 (line format).
# Values are quantized with FLOOR(x*1e6 + 0.5)/1e6 — pure float64
# arithmetic, bit-identical in both engines — before formatting, because
# printf/ROUND decimal tie-rounding differs (Java HALF_UP vs C binary).
# ---------------------------------------------------------------------------
@query(
    "yolo_export_lines",
    "WITH " + _CORPUS_SQL + """
    , cats AS (
        SELECT category AS name,
               CAST(ROW_NUMBER() OVER (ORDER BY category) AS INT) AS category_id
        FROM (SELECT DISTINCT category FROM anno)
    )
    SELECT a.image_name,
           printf('%d %.6f %.6f %.6f %.6f',
                  c.category_id,
                  FLOOR((a.cx + a.w / 2) / i.width * 1000000 + 0.5) / 1000000.0,
                  FLOOR((a.cy + a.h / 2) / i.height * 1000000 + 0.5) / 1000000.0,
                  FLOOR(a.w / i.width * 1000000 + 0.5) / 1000000.0,
                  FLOOR(a.h / i.height * 1000000 + 0.5) / 1000000.0) AS line
    FROM anno a
    JOIN images i USING (image_name)
    JOIN cats c ON a.category = c.name
    """,
)
def yolo_export_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sinks.coco import coco_categories

    anno = _anno_df(spark, sf_dir)
    return yolo_lines(
        anno, _images_df(spark, sf_dir), coco_categories(anno), segmentation=False
    ).select("image_name", "line")


# ---------------------------------------------------------------------------
# WebDataset shard export (sinks/webdataset.py): documents stream into
# md5-sharded tar archives (text payload + a JSON sidecar per sample),
# written executor-side; the query returns the per-shard manifest. The
# oracle recomputes the same manifest declaratively — shard hash,
# sample counts, and exact payload byte totals (octet_length of the
# text member + the length of the identically-constructed JSON
# sidecar). Tar structure (member pairing, sorted order, byte
# determinism) is asserted in tests/test_export.py.
# ---------------------------------------------------------------------------
_WDS_DIRS: dict[tuple[str, str], object] = {}
_WDS_SHARDS = 8


@query(
    "webdataset_export_manifest",
    f"""
    WITH staged AS (
        SELECT CAST(doc_id AS VARCHAR) AS key,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
                   % {_WDS_SHARDS} AS shard,
               strlen(text)
               + strlen('{{"doc_id": ' || CAST(doc_id AS VARCHAR)
                        || ', "lang": "' || lang || '"}}')
                   AS payload
        FROM documents
    )
    SELECT shard, COUNT(*) AS n_samples,
           CAST(SUM(payload) AS BIGINT) AS payload_bytes
    FROM staged GROUP BY shard
    """,
)
def webdataset_export_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import atexit
    import shutil
    import tempfile

    from ..sinks.webdataset import write_webdataset

    docs = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("text").alias("txt"),
        F.concat(
            F.lit('{"doc_id": '),
            F.col("doc_id").cast("string"),
            F.lit(', "lang": "'),
            F.col("lang"),
            F.lit('"}'),
        ).alias("json"),
    )
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _WDS_DIRS:
        out_dir = tempfile.mkdtemp(prefix="wds_export_")
        atexit.register(shutil.rmtree, out_dir, ignore_errors=True)
        _WDS_DIRS[key] = out_dir
    manifest = write_webdataset(
        docs,
        _WDS_DIRS[key],
        key_col="doc_id",
        payload_cols={"txt": "txt", "json": "json"},
        num_shards=_WDS_SHARDS,
    )
    return manifest
