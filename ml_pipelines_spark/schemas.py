"""Declared schemas for the datalake tables.

Spark StructType twins of the reference's four explicit Arrow schemas
(reference: MLPipelines/TrainDatasets.py:73-147, 459-482). Field ``doc``
metadata is preserved as StructField metadata comments so the schema stays
self-documenting, as in the reference.

Arrow → Spark type mapping (SURVEY.md §1.2):
  int64 → LongType, string → StringType, binary → BinaryType,
  bool_ → BooleanType, list_(float32) → ArrayType(FloatType),
  list_(string) → ArrayType(StringType), timestamp('us', 'UTC') →
  TimestampType with a UTC session timezone.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _f(name, dtype, doc: str, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable, metadata={"comment": doc})


# Annotation table (reference: TrainDatasets.py:73-101 `anno_schema`).
ANNO_SCHEMA = StructType(
    [
        _f("project_id", LongType(), "CVAT project id (partition key)"),
        _f("task_id", LongType(), "CVAT task id"),
        _f("job_id", LongType(), "CVAT job id (partition key in reference)"),
        _f("track_id", LongType(), "track id; -1 for untracked shapes"),
        _f("gt_iid", LongType(), "ground-truth instance id"),
        _f("image_name", StringType(), "normalized image file name"),
        _f("category", StringType(), "lower-cased label name"),
        _f("gt_attr", StringType(), "JSON-encoded attribute list"),
        _f("segmentation", ArrayType(FloatType()), "flat polygon [x0,y0,x1,y1,...]"),
        _f("rcoco", ArrayType(FloatType()), "rotated bbox [x,y,w,h,theta]"),
        _f("coco", ArrayType(FloatType()), "axis-aligned bbox [x,y,w,h]"),
        _f("ts", TimestampType(), "ingest timestamp (UTC)"),
    ]
)

# 4D annotation table (reference: TrainDatasets.py:103-127).
FOUR_D_ANNO_SCHEMA = StructType(
    [
        _f("project_id", LongType(), "CVAT project id (partition key)"),
        _f("task_id", LongType(), "CVAT task id"),
        _f("job_id", LongType(), "CVAT job id"),
        _f("track_id", LongType(), "track id"),
        _f("report_id", StringType(), "external report id"),
        _f("image_name", StringType(), "normalized image file name"),
        _f("category", StringType(), "lower-cased label name"),
        _f("segmentation", ArrayType(FloatType()), "flat polygon"),
        _f("coco", ArrayType(FloatType()), "axis-aligned bbox [x,y,w,h]"),
        _f("ts", TimestampType(), "ingest timestamp (UTC)"),
    ]
)

# Image table (reference: TrainDatasets.py:129-147 `image_schema`).
IMAGE_SCHEMA = StructType(
    [
        _f("project_id", LongType(), "CVAT project id (partition key)"),
        _f("task_id", LongType(), "CVAT task id"),
        _f("job_id", LongType(), "CVAT job id"),
        _f("image_name", StringType(), "normalized image file name"),
        _f("image_bytes", BinaryType(), "JPEG-encoded image bytes"),
        _f("tags", ArrayType(StringType()), "per-image tag list"),
        _f("ts", TimestampType(), "ingest timestamp (UTC)"),
    ]
)

# Crop table (reference: TrainDatasets.py:459-482 `n1_crops_multi_schema`).
CROPS_SCHEMA = StructType(
    [
        _f("item_id", LongType(), "item id (partition key)"),
        _f("frame_id", LongType(), "frame index within capture"),
        _f("instance_id", LongType(), "instance id within frame"),
        _f("image_name", StringType(), "source image file name"),
        _f("capture_uuid", StringType(), "capture uuid (partition key)"),
        _f("crop", BinaryType(), "JPEG-encoded crop bytes"),
        _f("bow", ArrayType(StringType()), "OCR bag-of-words"),
        _f("dims", ArrayType(FloatType()), "crop dims/geometry"),
        _f("in_fence", BooleanType(), "inside geofence flag"),
        _f("created_date", TimestampType(), "creation timestamp (UTC)"),
    ]
)

# Partition contracts. The reference partitions by
# ['project_id','job_id','image_name'] (TrainDatasets.py:151,157) — per-image
# directories are pathological at scale (its own TODO at :383-385 admits it).
# We partition by low-cardinality keys only and rely on parquet row-group
# pruning for the rest (SURVEY.md §4 anti-patterns).
ANNO_PARTITION_COLS = ["project_id"]
IMAGE_PARTITION_COLS = ["project_id"]
CROPS_PARTITION_COLS = ["item_id"]


# ---------------------------------------------------------------------------
# Driver testdata tables (TESTDATA.md) — declared so reads never infer.
# ---------------------------------------------------------------------------

TESTDATA_SCHEMAS: dict[str, StructType] = {
    "region": StructType(
        [
            StructField("r_regionkey", IntegerType()),
            StructField("r_name", StringType()),
        ]
    ),
    "nation": StructType(
        [
            StructField("n_nationkey", IntegerType()),
            StructField("n_name", StringType()),
            StructField("n_regionkey", IntegerType()),
        ]
    ),
    "customer": StructType(
        [
            StructField("c_custkey", LongType()),
            StructField("c_name", StringType()),
            StructField("c_nationkey", IntegerType()),
            StructField("c_acctbal", DoubleType()),
            StructField("c_mktsegment", StringType()),
        ]
    ),
    "supplier": StructType(
        [
            StructField("s_suppkey", LongType()),
            StructField("s_name", StringType()),
            StructField("s_nationkey", IntegerType()),
            StructField("s_acctbal", DoubleType()),
        ]
    ),
    "part": StructType(
        [
            StructField("p_partkey", LongType()),
            StructField("p_name", StringType()),
            StructField("p_brand", StringType()),
            StructField("p_type", StringType()),
            StructField("p_size", IntegerType()),
            StructField("p_retailprice", DoubleType()),
        ]
    ),
    "orders": StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_custkey", LongType()),
            StructField("o_orderstatus", StringType()),
            StructField("o_totalprice", DoubleType()),
            StructField("o_orderdate", TimestampType()),
            StructField("o_orderpriority", StringType()),
        ]
    ),
    "lineitem": StructType(
        [
            StructField("l_orderkey", LongType()),
            StructField("l_partkey", LongType()),
            StructField("l_suppkey", LongType()),
            StructField("l_linenumber", IntegerType()),
            StructField("l_quantity", DoubleType()),
            StructField("l_extendedprice", DoubleType()),
            StructField("l_discount", DoubleType()),
            StructField("l_tax", DoubleType()),
            StructField("l_returnflag", StringType()),
            StructField("l_linestatus", StringType()),
            StructField("l_shipdate", TimestampType()),
        ]
    ),
    "events": StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    ),
    "documents": StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
            StructField("source", StringType()),
            StructField("n_chars", LongType()),
        ]
    ),
    "embeddings": StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
            StructField("label", IntegerType()),
        ]
    ),
}

TESTDATA_TABLES = tuple(TESTDATA_SCHEMAS)
