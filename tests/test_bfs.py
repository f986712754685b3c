"""Property tests for operators.components.bfs_distances — the Spark
frontier relaxation must match a serial BFS on random graphs, including
the bounded-radius cutoff and isolated seeds."""

from __future__ import annotations

import random
from collections import deque

import pytest

from ml_pipelines_spark.operators.components import bfs_distances


def _reference_bfs(
    edges: set[tuple[int, int]], seeds: list[int], rounds: int
) -> dict[int, int]:
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        n = q.popleft()
        if dist[n] >= rounds:
            continue
        for m in adj.get(n, ()):
            if m not in dist:
                dist[m] = dist[n] + 1
                q.append(m)
    return dist


@pytest.mark.parametrize("seed,rounds", [(1, 3), (2, 6), (5, 2)])
def test_bfs_matches_reference(spark, seed, rounds):
    rng = random.Random(seed)
    nodes = list(range(50))
    edges = set()
    for _ in range(70):
        a, b = rng.sample(nodes, 2)
        edges.add((min(a, b), max(a, b)))
    seeds = [n for n in nodes if n % 7 == 0]
    df = spark.createDataFrame(sorted(edges), ["id_a", "id_b"])
    sdf = spark.createDataFrame([(s,) for s in seeds], ["n"])
    got = {
        r["node"]: r["dist"]
        for r in bfs_distances(df, sdf, rounds=rounds).collect()
    }
    assert got == _reference_bfs(edges, seeds, rounds)


def test_bfs_isolated_seed_keeps_distance_zero(spark):
    # a seed with no edges still reports itself at distance 0
    df = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    sdf = spark.createDataFrame([(99,), (1,)], ["n"])
    got = {
        r["node"]: r["dist"] for r in bfs_distances(df, sdf, rounds=3).collect()
    }
    assert got == {99: 0, 1: 0, 2: 1}
