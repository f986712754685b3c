"""Columnar-format round-trips under the oracle gate.

The reference pipeline's interchange formats are parquet and feather
(TrainDatasets.py writes parquet datasets; create_coco_from_feather.py
reads feather snapshots). Spark's own first-class columnar format
besides parquet is ORC — a real cluster inherits it wherever Hive
tables already exist — so the engine must round-trip it losslessly.
The query writes the documents table as zlib ORC, reads it back, and
aggregates; the oracle computes the same aggregate from the original
parquet, so ANY loss in the round-trip (encoding, nulls, unicode,
column order) breaks the hash.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import query
from .relational import t

_ORC_DIRS: dict[tuple[str, str], str] = {}


def _orc_docs_dir(spark: SparkSession, sf_dir: str) -> str:
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _ORC_DIRS:
        out_dir = tempfile.mkdtemp(prefix="orc_docs_")
        atexit.register(shutil.rmtree, out_dir, ignore_errors=True)
        (
            t(spark, sf_dir, "documents")
            .repartition(4, "doc_id")
            .write.mode("overwrite")
            .option("compression", "zlib")
            .orc(f"{out_dir}/documents")
        )
        _ORC_DIRS[key] = out_dir
    return _ORC_DIRS[key]


@query(
    "orc_roundtrip_docs",
    """
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(length(text)) AS BIGINT) AS total_text_len,
           CAST(SUM((doc_id * 2654435761) % 1000003) AS BIGINT)
               AS id_checksum
    FROM documents
    GROUP BY lang
    """,
)
def orc_roundtrip_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC round-trip: the read-back table must aggregate identically
    to the parquet original (the id_checksum term folds every doc_id
    into the hash, so a dropped or duplicated row cannot cancel out).
    DuckDB's hash() differs from Spark's, so the checksum uses a
    portable modular hash computed the same way on both sides."""
    path = _orc_docs_dir(spark, sf_dir)
    back = spark.read.orc(f"{path}/documents")
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum(F.length("text")).cast("long").alias("total_text_len"),
        F.sum(
            (F.col("doc_id") * F.lit(2654435761) % F.lit(1000003)).cast(
                "long"
            )
        )
        .cast("long")
        .alias("id_checksum"),
    )
