"""Stored inverted index — term-bucket-partitioned posting lists for
point lookups without a corpus scan.

``bm25_top_docs`` scores query terms by scanning the corpus — right
for ad-hoc analytics, wrong for a lookup service: at 100 TB a
three-term query must not touch 100 TB. The datalake answer is the
same one IVF uses for vectors (operators/similarity.write_ivf_index):
pay tokenization ONCE at write time, store postings hive-partitioned
by a hash bucket of the term, and let every query become PARTITION
PRUNING — a B-bucket index serves a q-term query from at most q
buckets, enforced by the scan, not by a filter over everything.

Postings carry (term, doc id, term frequency), so downstream scoring
(boolean AND, tf sums, BM25 with a stats sidecar) runs on
posting-list-sized inputs. Bucket assignment uses ``xxhash64`` on the
JVM for both write and search (the search side resolves its term
buckets through a 1-row Spark job rather than re-implementing the
hash in Python — the two sides can never drift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens


def _bucket(col: F.Column, num_buckets: int) -> F.Column:
    return F.pmod(F.xxhash64(col), F.lit(num_buckets)).cast("int")


def write_inverted_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 16,
) -> None:
    """Materialize the inverted index: one row per (term, doc) with the
    term frequency, written hive-partitioned by the term's hash
    bucket."""
    postings = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                tokens(F.trim(F.lower(F.col(text_col))))
            ).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("bucket", _bucket(F.col("term"), num_buckets))
    )
    postings.write.mode("overwrite").partitionBy("bucket").parquet(path)


def normalize_query_terms(
    spark: SparkSession, terms: list[str]
) -> list[str]:
    """Run the caller's raw terms through the SAME trim+lower+tokenize
    expression the write path applies to documents (1-row Spark job),
    so a query term with stray case or whitespace hashes to the bucket
    its postings actually live in — the two sides can never drift."""
    df = spark.createDataFrame([(t,) for t in terms], ["raw"])
    rows = (
        df.select(
            F.explode(tokens(F.trim(F.lower(F.col("raw"))))).alias("term")
        )
        .filter(F.col("term") != "")
        .collect()
    )
    return sorted({r["term"] for r in rows})


def term_buckets(
    spark: SparkSession, terms: list[str], num_buckets: int
) -> list[int]:
    """The hash buckets the given (already-normalized) terms live in —
    computed BY SPARK (1-row job) so write and search use the identical
    xxhash64."""
    df = spark.createDataFrame([(t,) for t in terms], ["term"])
    rows = df.select(_bucket(F.col("term"), num_buckets)).collect()
    return sorted({int(r[0]) for r in rows})


def search_indexed(
    spark: SparkSession,
    path: str,
    terms: list[str],
    num_buckets: int = 16,
    require_all: bool = True,
) -> DataFrame:
    """Documents matching the query terms, served from the index alone.

    The bucket predicate is a partition-key filter, so Catalyst prunes
    directories before any file opens: a q-term query reads <= q of the
    B buckets. ``require_all`` = boolean AND (the document must contain
    every term); otherwise OR. Output: (doc_id, n_terms, total_tf)
    with n_terms = distinct query terms present.

    Raw terms are first normalized through the write path's own
    trim+lower+tokenize expression (a multi-word raw term contributes
    each of its tokens), so casing/whitespace in the query never
    silently matches zero postings.
    """
    qterms = normalize_query_terms(spark, terms)
    if not qterms:
        empty = spark.read.parquet(path).filter(F.lit(False))
        return empty.groupBy("doc_id").agg(
            F.countDistinct("term").alias("n_terms"),
            F.sum("tf").cast("long").alias("total_tf"),
        )
    buckets = term_buckets(spark, qterms, num_buckets)
    postings = (
        spark.read.parquet(path)
        .filter(F.col("bucket").isin(buckets))
        .filter(F.col("term").isin(qterms))
    )
    out = postings.groupBy("doc_id").agg(
        F.countDistinct("term").alias("n_terms"),
        F.sum("tf").cast("long").alias("total_tf"),
    )
    if require_all:
        out = out.filter(F.col("n_terms") == len(qterms))
    return out
