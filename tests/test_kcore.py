"""Property tests for operators.components.kcore — the Spark peel must
match a serial reference peel on random graphs, including convergence
within the fixed round budget."""

from __future__ import annotations

import random

import pytest

from ml_pipelines_spark.operators.components import kcore


def _reference_kcore(edges: set[tuple[int, int]], k: int) -> dict[int, int]:
    """Serial peel to a fixed point; returns node -> degree in the core."""
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
    return {n: len(ns) for n, ns in adj.items()}


@pytest.mark.parametrize("seed,k", [(1, 2), (2, 2), (3, 3), (7, 2)])
def test_kcore_matches_reference(spark, seed, k):
    rng = random.Random(seed)
    nodes = list(range(40))
    edges = set()
    for _ in range(70):
        a, b = rng.sample(nodes, 2)
        edges.add((min(a, b), max(a, b)))
    # plant a clique so the core is never vacuous
    clique = [100, 101, 102, 103]
    for i in clique:
        for j in clique:
            if i < j:
                edges.add((i, j))
    df = spark.createDataFrame(sorted(edges), ["id_a", "id_b"])
    got = {
        r["node"]: r["degree"]
        for r in kcore(df, k=k, rounds=12).collect()
    }
    assert got == _reference_kcore(edges, k)


def test_kcore_peels_chains_keeps_cycle(spark):
    # a triangle with a tail: the tail peels away round by round, the
    # triangle survives with degree 2 everywhere
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6)]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {
        r["node"]: r["degree"] for r in kcore(df, k=2, rounds=6).collect()
    }
    assert got == {1: 2, 2: 2, 3: 2}
