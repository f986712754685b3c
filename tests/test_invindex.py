"""Inverted index: partition pruning is physical, results equal the
corpus-scan definition."""

from __future__ import annotations

import shutil
import tempfile

import pyspark.sql.functions as F

from ml_pipelines_spark.operators.invindex import (
    search_indexed,
    term_buckets,
    write_inverted_index,
)


def test_search_reads_only_query_buckets(spark):
    docs = spark.createDataFrame(
        [(i, f"alpha w{i} beta common w{i%7}") for i in range(200)],
        ["doc_id", "text"],
    )
    d = tempfile.mkdtemp(prefix="mlps_inv_t_")
    try:
        write_inverted_index(docs, d, num_buckets=16)
        terms = ["alpha", "beta"]
        buckets = term_buckets(spark, terms, 16)
        out = search_indexed(spark, d, terms, num_buckets=16)
        # physical pruning, two ways: the scan carries a PartitionFilters
        # entry on bucket, and the files actually opened all live in the
        # query terms' bucket directories (inputFiles() would list the
        # whole table — it ignores pushed filters).
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "bucket" in plan
        postings = (
            spark.read.parquet(d)
            .filter(F.col("bucket").isin(buckets))
            .filter(F.col("term").isin(terms))
        )
        touched = {
            r[0].split("bucket=")[1].split("/")[0]
            for r in postings.select(
                F.input_file_name()
            ).distinct().collect()
        }
        assert touched == {str(b) for b in buckets}
        assert len(touched) <= len(terms)
        # every doc contains both terms once each
        rows = out.collect()
        assert len(rows) == 200
        assert all(r.n_terms == 2 and r.total_tf == 2 for r in rows)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_search_and_vs_or_semantics(spark):
    docs = spark.createDataFrame(
        [(1, "x y z"), (2, "x q r"), (3, "p q r")],
        ["doc_id", "text"],
    )
    d = tempfile.mkdtemp(prefix="mlps_inv_s_")
    try:
        write_inverted_index(docs, d, num_buckets=8)
        both = search_indexed(spark, d, ["x", "y"], 8, require_all=True)
        assert [r.doc_id for r in both.collect()] == [1]
        either = search_indexed(spark, d, ["x", "y"], 8, require_all=False)
        assert sorted(r.doc_id for r in either.collect()) == [1, 2]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_tf_counts_are_term_frequencies(spark):
    docs = spark.createDataFrame(
        [(1, "a a a b"), (2, "a b b")], ["doc_id", "text"]
    )
    d = tempfile.mkdtemp(prefix="mlps_inv_f_")
    try:
        write_inverted_index(docs, d, num_buckets=4)
        got = {
            r.doc_id: (r.n_terms, r.total_tf)
            for r in search_indexed(
                spark, d, ["a", "b"], 4, require_all=True
            ).collect()
        }
        assert got == {1: (2, 4), 2: (2, 3)}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_raw_query_terms_are_normalized_like_the_write_path(spark):
    """A query term with uppercase, stray whitespace, or multiple words
    matches the postings the write path's trim+lower+tokenize produced
    — it must not silently match zero documents."""
    docs = spark.createDataFrame(
        [(1, "Alpha beta"), (2, "alpha gamma"), (3, "beta gamma")],
        ["doc_id", "text"],
    )
    d = tempfile.mkdtemp(prefix="mlps_inv_n_")
    try:
        write_inverted_index(docs, d, num_buckets=8)
        # uppercase + padding: same result as the clean lowercase query
        messy = search_indexed(spark, d, ["  ALPHA "], 8)
        assert sorted(r.doc_id for r in messy.collect()) == [1, 2]
        # a multi-word raw term contributes each token (AND semantics)
        phrase = search_indexed(spark, d, ["Alpha  Beta"], 8)
        assert [r.doc_id for r in phrase.collect()] == [1]
        # a term that normalizes to nothing -> empty result, not a crash
        assert search_indexed(spark, d, ["   "], 8).count() == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)
