"""UDTF surface: SQL-callable table function pinned to the expression
twin's output."""

from __future__ import annotations

from pyspark.sql import functions as F

from ml_pipelines_spark.functions.text import word_shingles
from ml_pipelines_spark.functions.udtfs import register_udtfs
from ml_pipelines_spark.queries.relational import t


def test_lateral_udtf_matches_expression_twin(spark, sf_dir):
    register_udtfs(spark)
    docs = t(spark, sf_dir, "documents").limit(50)
    docs.createOrReplaceTempView("udtf_docs")
    via_udtf = spark.sql(
        """
        SELECT d.doc_id, s.idx, s.shingle
        FROM udtf_docs d, LATERAL word_shingles_udtf(d.text, 3) s
        """
    )
    via_expr = docs.select(
        "doc_id",
        F.posexplode(word_shingles(F.col("text"), k=3)).alias("idx0", "shingle"),
    ).select("doc_id", (F.col("idx0")).alias("idx"), "shingle")
    assert sorted(map(tuple, via_udtf.collect())) == sorted(
        map(tuple, via_expr.collect())
    )


def test_udtf_edge_cases(spark):
    register_udtfs(spark)
    rows = spark.sql(
        "SELECT * FROM word_shingles_udtf('  One two THREE four ', 3)"
    ).collect()
    assert [(r["idx"], r["shingle"]) for r in rows] == [
        (0, "one two three"),
        (1, "two three four"),
    ]
    assert spark.sql("SELECT * FROM word_shingles_udtf('a b', 3)").count() == 0
    assert spark.sql(
        "SELECT * FROM word_shingles_udtf(CAST(NULL AS STRING), 3)"
    ).count() == 0
