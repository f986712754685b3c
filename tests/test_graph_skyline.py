"""Property tests for the round-6 operators: 2-D Pareto frontier,
degree-ordered triangle counting, and the training-shard writer."""

from __future__ import annotations

import itertools

import pytest

from pyspark.sql import functions as F

from ml_pipelines_spark.operators.components import triangle_stats
from ml_pipelines_spark.operators.skyline import pareto_front_2d


def _brute_frontier(points):
    out = []
    for i, (px, py) in enumerate(points):
        dominated = any(
            qx >= px and qy >= py and (qx > px or qy > py)
            for j, (qx, qy) in enumerate(points)
            if j != i
        )
        if not dominated:
            out.append(i)
    return sorted(out)


def test_pareto_matches_bruteforce_and_partitioning(spark):
    import random

    rng = random.Random(11)
    pts = [(float(rng.randint(0, 20)), float(rng.randint(0, 20))) for _ in range(300)]
    rows = [(i, x, y) for i, (x, y) in enumerate(pts)]
    expect = set(_brute_frontier(pts))
    for parts in (1, 7):
        df = spark.createDataFrame(rows, ["id", "x", "y"]).repartition(parts)
        got = {r["id"] for r in pareto_front_2d(df, "x", "y").collect()}
        assert got == expect, f"partitions={parts}"


def test_pareto_keeps_duplicate_frontier_points(spark):
    rows = [(0, 5.0, 5.0), (1, 5.0, 5.0), (2, 1.0, 1.0), (3, 6.0, 0.0)]
    df = spark.createDataFrame(rows, ["id", "x", "y"]).repartition(3)
    got = {r["id"] for r in pareto_front_2d(df, "x", "y").collect()}
    # Duplicates of a maximal point don't strictly dominate each other;
    # both stay. (6,0) is maximal on x.
    assert got == {0, 1, 3}


def _brute_triangles(edges):
    nodes = sorted({n for e in edges for n in e})
    es = {tuple(sorted(e)) for e in edges}
    tri = 0
    for a, b, c in itertools.combinations(nodes, 3):
        if (a, b) in es and (b, c) in es and (a, c) in es:
            tri += 1
    return tri


@pytest.mark.parametrize("seed", [3, 9])
def test_triangle_stats_matches_bruteforce(spark, seed):
    import random

    rng = random.Random(seed)
    nodes = list(range(30))
    edges = sorted(
        {
            tuple(sorted(rng.sample(nodes, 2)))
            for _ in range(120)
        }
    )
    df = spark.createDataFrame(edges, ["id_a", "id_b"]).repartition(5)
    row = triangle_stats(df).collect()[0]
    assert row["n_triangles"] == _brute_triangles(edges)
    assert row["n_edges"] == len(edges)
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    assert row["n_nodes"] == len(deg)
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    assert row["n_wedges"] == wedges
    if wedges:
        assert abs(row["clustering_coeff"] - 3 * row["n_triangles"] / wedges) < 1e-6


def test_triangle_stats_counts_each_triangle_once(spark):
    # K4: 4 triangles, 6 edges; plus duplicate + reversed edges which
    # must canonicalize away.
    edges = [(a, b) for a in range(4) for b in range(4) if a < b]
    noisy = edges + [(b, a) for a, b in edges] + edges[:2]
    df = spark.createDataFrame(noisy, ["id_a", "id_b"])
    row = triangle_stats(df).collect()[0]
    assert row["n_triangles"] == 4
    assert row["n_edges"] == 6


def test_write_training_shards_roundtrip(spark, tmp_path):
    from ml_pipelines_spark.operators.packing import write_training_shards

    rows = [(i, 10 + (i * 7) % 50) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    out = str(tmp_path / "shards")
    manifest = write_training_shards(
        df, "n_tokens", ["doc_id"], path=out, budget=100, num_groups=4
    ).collect()
    # Every doc written exactly once; token mass preserved.
    assert sum(r["n_docs"] for r in manifest) == 200
    assert sum(r["shard_tokens"] for r in manifest) == sum(t for _, t in rows)
    # Physical layout: one directory per shard.
    import os

    dirs = [d for d in os.listdir(out) if d.startswith("shard_id=")]
    assert len(dirs) == len(manifest)
    # Budget shape: a shard only ever exceeds the budget by its last
    # doc (exclusive cum-sum semantics) — fill < budget + max doc size.
    max_tok = max(t for _, t in rows)
    for r in manifest:
        assert r["shard_tokens"] < 100 + max_tok


import pytest


@pytest.mark.parametrize("seed", [1, 2, 3, 5])
def test_grid_nearest_matches_bruteforce(spark, seed):
    import random

    from ml_pipelines_spark.operators.geo import (
        LON_SCALE,
        grid_nearest,
    )

    rng = random.Random(seed)
    pts = [
        (i, rng.uniform(-55, 55), rng.uniform(-170, 170)) for i in range(200)
    ]
    # Planted 2-raw-lon-cell cases: raw delta-lon in (5, 10] is
    # admissible under the scaled metric (0.5*dlon <= 5) but, with the
    # site near the top of its raw 5-degree cell, the point lands TWO
    # raw cells away — exactly the pairs raw-lon bucketing misses.
    pts += [
        (200, 10.0, 4.9 + 9.7),    # site cell 0 -> point cell 2
        (201, -30.0, 50.1 - 9.8),  # site cell 10 -> point cell 8
        (202, 0.5, -0.2 + 9.6),    # site cell -1 -> point cell 1
    ]
    sites = [
        (j, rng.uniform(-55, 55), rng.uniform(-170, 170)) for j in range(15)
    ]
    sites += [(100, 10.0, 4.9), (101, -30.0, 50.1), (102, 0.5, -0.2)]
    pdf = spark.createDataFrame(pts, ["point_id", "lat", "lon"]).repartition(4)
    sdf = spark.createDataFrame(sites, ["site_id", "lat", "lon"])
    got = {
        r["point_id"]: (r["site_id"], r["d2"])
        for r in grid_nearest(pdf, sdf, max_dist_deg=5.0).collect()
    }

    def d2(p, s):
        return (p[1] - s[1]) ** 2 + ((p[2] - s[2]) * LON_SCALE) ** 2

    for p in pts:
        best = sorted(
            ((d2(p, s), s[0]) for s in sites if d2(p, s) <= 25.0)
        )
        if not best:
            assert p[0] not in got
        else:
            assert p[0] in got, p
            assert got[p[0]][0] == best[0][1]
            assert abs(got[p[0]][1] - best[0][0]) < 1e-9


def test_grid_nearest_rejects_oversized_radius(spark):
    import pytest as _pytest

    from ml_pipelines_spark.operators.geo import grid_nearest

    df = spark.createDataFrame([(1, 0.0, 0.0)], ["point_id", "lat", "lon"])
    with _pytest.raises(ValueError):
        grid_nearest(df, df.withColumnRenamed("point_id", "site_id"), 7.5)
