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
