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


def test_pagerank_star_center_dominates(spark):
    from ml_pipelines_spark.operators.components import pagerank

    # Star: 0 — {1,2,3,4}; plus a detached pair 10—11.
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (0, 4), (10, 11)], ["id_a", "id_b"]
    )
    r = {row["node"]: row["rank"] for row in pagerank(edges).collect()}
    assert set(r) == {0, 1, 2, 3, 4, 10, 11}
    assert abs(sum(r.values()) - 1.0) < 1e-6  # stochastic: mass conserved
    assert r[0] > max(r[i] for i in (1, 2, 3, 4))  # hub dominates leaves
    assert abs(r[1] - r[4]) < 1e-12  # symmetric leaves tie
    assert abs(r[10] - r[11]) < 1e-12  # detached pair ties


def test_pagerank_partition_invariant(spark):
    from ml_pipelines_spark.operators.components import pagerank

    edges = [(i, (i * 7 + 3) % 20) for i in range(20) if i != (i * 7 + 3) % 20]
    a = spark.createDataFrame(edges, ["id_a", "id_b"])
    b = a.repartition(13)
    ra = sorted(map(tuple, pagerank(a).collect()))
    rb = sorted(map(tuple, pagerank(b).collect()))
    assert ra == rb  # quantized contributions: bit-equal across layouts
