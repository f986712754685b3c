"""Spatial-join query — grid-bucketed nearest-site assignment
(operators.geo). Positions are closed-form md5 synthetics over the
driver tables, so the whole pipeline — cell keys, 3×3 replication,
candidate admission, exact distance, per-point argmin — is a full
cross-engine value oracle. The metric is deliberately trig-free (see
operators.geo): every float op is identical on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.geo import CELL_DEG, LON_SCALE, dist2_expr, grid_nearest
from .registry import query
from .relational import t

_RADIUS = 5.0  # degree units (== one cell; 3x3 neighborhood covers it)


def _coord_sql(tag: str, key: str, span: int, shift: int) -> str:
    return (
        f"((('0x' || substr(md5('{tag}' || CAST({key} AS VARCHAR)), 1, 6))"
        f"::BIGINT % {span}) / 1000.0) - {shift}.0"
    )


def _coord_col(tag: str, key, span: int, shift: int):
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(tag), key.cast("string"))), 1, 6),
            16,
            10,
        ).cast("long")
        % span
    ) / 1000.0 - float(shift)


@query(
    "geo_nearest_city",
    f"""
    WITH pts AS (
        SELECT DISTINCT user_id,
               {_coord_sql('lat', 'user_id', 120000, 60)} AS lat,
               {_coord_sql('lon', 'user_id', 360000, 180)} AS lon
        FROM events
    ),
    cities AS (
        SELECT n_nationkey AS city_id,
               {_coord_sql('clat', 'n_nationkey', 120000, 60)} AS lat,
               {_coord_sql('clon', 'n_nationkey', 360000, 180)} AS lon
        FROM nation
    ),
    cand AS (
        SELECT p.user_id, c.city_id,
               (p.lat - c.lat) * (p.lat - c.lat)
               + ((p.lon - c.lon) * {LON_SCALE}) * ((p.lon - c.lon) * {LON_SCALE})
                   AS d2
        FROM pts p JOIN cities c
          ON floor(p.lat / {CELL_DEG}) BETWEEN floor(c.lat / {CELL_DEG}) - 1
                                           AND floor(c.lat / {CELL_DEG}) + 1
         AND floor(p.lon * {LON_SCALE} / {CELL_DEG})
             BETWEEN floor(c.lon * {LON_SCALE} / {CELL_DEG}) - 1
                 AND floor(c.lon * {LON_SCALE} / {CELL_DEG}) + 1
        WHERE (p.lat - c.lat) * (p.lat - c.lat)
              + ((p.lon - c.lon) * {LON_SCALE}) * ((p.lon - c.lon) * {LON_SCALE})
              <= {_RADIUS * _RADIUS}
    ),
    ranked AS (
        SELECT user_id, city_id, d2,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY d2, city_id) AS rn
        FROM cand
    )
    SELECT user_id, city_id,
           floor(d2 * 1000000.0 + 0.5) / 1000000.0 AS d2
    FROM ranked WHERE rn = 1
    """,
)
def geo_nearest_city(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = (
        t(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .select(
            "user_id",
            _coord_col("lat", F.col("user_id"), 120000, 60).alias("lat"),
            _coord_col("lon", F.col("user_id"), 360000, 180).alias("lon"),
        )
    )
    cities = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("city_id"),
        _coord_col("clat", F.col("n_nationkey"), 120000, 60).alias("lat"),
        _coord_col("clon", F.col("n_nationkey"), 360000, 180).alias("lon"),
    )
    near = grid_nearest(
        pts, cities, max_dist_deg=_RADIUS, point_id="user_id",
        site_id="city_id",
    )
    return near.select(
        "user_id",
        "city_id",
        (F.floor(F.col("d2") * 1000000.0 + 0.5) / 1000000.0).alias("d2"),
    )


# ---------------------------------------------------------------------------
# Grid-density clustering (DBSCAN-lite): bucket points into fixed grid
# cells, keep cells with >= MIN_PTS points, merge adjacent dense cells
# (8-neighborhood) into clusters via connected components. The heavy
# pass is ONE groupBy of points onto cell keys; everything after runs
# on the dense-cell dimension (bounded by the grid, not the data), so
# the adjacency self-join and the iterative merge cost nothing at
# 100 TB. Oracle: recursive-CTE closure over the same adjacency — a
# structurally different formulation of the merge.
# ---------------------------------------------------------------------------
_DB_CELL = 10.0
_DB_MIN_PTS = 2


@query(
    "grid_density_clusters",
    f"""
    WITH RECURSIVE pts AS (
        SELECT DISTINCT user_id,
               {_coord_sql('lat', 'user_id', 120000, 60)} AS lat,
               {_coord_sql('lon', 'user_id', 360000, 180)} AS lon
        FROM events
    ),
    cells AS (
        SELECT CAST(floor(lat / {_DB_CELL}) AS BIGINT) AS cx,
               CAST(floor(lon / {_DB_CELL}) AS BIGINT) AS cy,
               COUNT(*) AS n
        FROM pts GROUP BY 1, 2
    ),
    dense AS (
        SELECT (cx + 200) * 1000 + (cy + 200) AS id, cx, cy, n
        FROM cells WHERE n >= {_DB_MIN_PTS}
    ),
    edges AS (
        SELECT a.id AS s, b.id AS d
        FROM dense a JOIN dense b
          ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
         AND a.id <> b.id
    ),
    reach(n, r) AS (
        SELECT id, id FROM dense
        UNION
        SELECT reach.n, e.d FROM reach JOIN edges e ON reach.r = e.s
    ),
    comp AS (SELECT n AS id, MIN(r) AS cluster FROM reach GROUP BY n)
    SELECT comp.cluster,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(SUM(dense.n) AS BIGINT) AS n_points
    FROM comp JOIN dense USING (id)
    GROUP BY comp.cluster
    """,
)
def grid_density_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = (
        t(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .select(
            _coord_col("lat", F.col("user_id"), 120000, 60).alias("lat"),
            _coord_col("lon", F.col("user_id"), 360000, 180).alias("lon"),
        )
    )
    cells = pts.groupBy(
        F.floor(F.col("lat") / _DB_CELL).cast("long").alias("cx"),
        F.floor(F.col("lon") / _DB_CELL).cast("long").alias("cy"),
    ).agg(F.count(F.lit(1)).alias("n"))
    dense = cells.filter(F.col("n") >= _DB_MIN_PTS).select(
        ((F.col("cx") + 200) * 1000 + (F.col("cy") + 200)).alias("id"),
        "cx",
        "cy",
        "n",
    )
    # The dense-cell table is bounded by the GRID (<= (120/cell) ×
    # (360/cell) rows — 432 at these constants), not by the data, so the
    # 8-neighborhood merge is a driver-side union-find over a
    # geometry-bounded dimension — the same collect class as a k-row
    # k-means center collect. The heavy, data-sized pass stays the one
    # points→cells groupBy above; an iterative distributed CC here spent
    # ~10 Spark jobs merging a few hundred rows.
    rows = dense.select("id", "cx", "cy").collect()
    bycell = {(r["cx"], r["cy"]): r["id"] for r in rows}
    parent = {i: i for i in bycell.values()}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for (cx, cy), i in bycell.items():
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                j = bycell.get((cx + dx, cy + dy))
                if j is not None:
                    ri, rj = find(i), find(j)
                    if ri != rj:
                        parent[max(ri, rj)] = min(ri, rj)
    label = {i: find(i) for i in parent}
    mapping = spark.createDataFrame(
        [(i, c) for i, c in label.items()], "id long, cluster long"
    )
    clustered = dense.join(F.broadcast(mapping), "id")
    return clustered.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.sum("n").cast("long").alias("n_points"),
    )
