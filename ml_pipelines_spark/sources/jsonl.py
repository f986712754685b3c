"""JSONL corpus ingestion with corrupt-record quarantine.

Web-scale text corpora arrive as newline-delimited JSON (Common Crawl
derivatives, chat logs, annotation dumps). At 100 TB some fraction of
lines is always malformed; dropping them silently biases the corpus and
failing the job wastes it. This reader splits the input into
(valid, quarantined) in ONE pass using Spark's PERMISSIVE mode with
``columnNameOfCorruptRecord`` — corrupt lines keep their raw text for
repair/audit instead of killing the scan.

The reference has no JSON source (its nearest cousin is stringified
JSON in the ``gt_attr`` column, TrainDatasets.py:98); this is a
north-star ingestion component.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

_CORRUPT = "_corrupt_record"


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType
) -> tuple[DataFrame, DataFrame]:
    """Read JSONL at ``path`` against a declared schema.

    Returns ``(valid, quarantine)``: valid rows with exactly the schema
    columns; quarantine rows as (raw_line,) for every line that failed
    to parse or type-check.

    Implementation is a text scan + ``from_json`` rather than
    ``spark.read.json``: the native JSON source refuses plans that
    project only its internal corrupt column
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — the
    documented workaround is caching the whole parse, a non-starter at
    corpus scale), while ``from_json`` is an ordinary expression, so
    both branches stay lazy single-pass scans.

    A declared schema is required — schema inference reads the whole
    input once before the real scan, which is a non-starter at scale.
    """
    if any(f.name == _CORRUPT for f in schema.fields):
        raise ValueError(f"schema must not declare {_CORRUPT}")
    full = StructType(
        list(schema.fields) + [StructField(_CORRUPT, StringType(), True)]
    )
    parsed = spark.read.text(path).select(
        F.col("value"),
        F.from_json(
            "value",
            full,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT},
        ).alias("__j"),
    )
    bad = F.col("__j").isNull() | F.col(f"__j.{_CORRUPT}").isNotNull()
    valid = parsed.filter(~bad).select(
        *[F.col(f"__j.{f.name}").alias(f.name) for f in schema.fields]
    )
    quarantine = parsed.filter(bad).select(F.col("value").alias("raw_line"))
    return valid, quarantine


def write_jsonl(df: DataFrame, path: str, compression: str | None = None) -> None:
    """Write a DataFrame as JSONL (the interchange twin of read_jsonl).
    Arrays/structs serialize natively; binary columns should be encoded
    (base64) by the caller first."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
