"""Connected components (operators.components) on known graphs."""

from __future__ import annotations

from pyspark.sql import functions as F

from ml_pipelines_spark.operators.components import (
    connected_components,
    dedup_by_components,
)


def _cc(spark, edges):
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    return {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }


def test_chain_converges_to_min(spark):
    # path graph 1-2-3-4-5: diameter 4, everything labels to 1
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_disconnected_components(spark):
    got = _cc(spark, [(10, 11), (11, 12), (20, 21), (30, 31)])
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 30: 30, 31: 30}


def test_edge_direction_irrelevant(spark):
    assert _cc(spark, [(5, 1), (2, 5)]) == {1: 1, 2: 1, 5: 1}


def test_dedup_by_components_keeps_representatives_and_singletons(spark):
    df = spark.createDataFrame(
        [(i, f"doc{i}") for i in range(1, 8)], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], ["id_a", "id_b"])
    kept = sorted(
        r["doc_id"] for r in dedup_by_components(df, pairs, "doc_id").collect()
    )
    # clusters {1,2,3} -> 1 and {5,6} -> 5 survive; 4 and 7 untouched
    assert kept == [1, 4, 5, 7]
