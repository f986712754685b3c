"""Grid-bucketed spatial join — nearest-site assignment without a cross
product.

The 100 TB shape for "join every point to nearby sites": bucket both
sides into fixed-size grid cells, replicate the SMALL side (sites) into
each cell's 3×3 neighborhood (bounded ×9 fan-out on the side that fits
in a broadcast), equi-join on the cell key, then verify the exact
distance in-stage and take the per-point argmin. Point rows are never
replicated and never shuffled by anything but their own cell — compare
a naive points × sites cross join, which is quadratic and unshippable.

The metric here is SQUARED EQUIRECTANGULAR degrees —
(Δlat)² + (0.5·Δlon)² — deliberately trig-free: every operation is a
subtract/multiply/add that both Spark and DuckDB execute identically in
float64, so candidate admission and argmin ties are bit-stable across
engines (haversine's sin/asin differ in the last ulp between libm
implementations). Swapping in haversine changes one expression, not the
join shape; the fixed 0.5 lon scale stands in for cos(lat) at the
mid-latitudes the synthetic fixture covers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CELL_DEG = 5.0  # grid cell size, degrees
LON_SCALE = 0.5  # fixed equirectangular longitude weight


def dist2_expr(lat1, lon1, lat2, lon2):
    """Squared equirectangular distance in degree² — pure arithmetic."""
    dlat = lat1 - lat2
    dlon = (lon1 - lon2) * LON_SCALE
    return dlat * dlat + dlon * dlon


def grid_nearest(
    points: DataFrame,
    sites: DataFrame,
    max_dist_deg: float,
    point_id: str = "point_id",
    site_id: str = "site_id",
) -> DataFrame:
    """(point_id, site_id, d2) — each point's nearest site within
    ``max_dist_deg`` (in the equirectangular metric; ties broken by the
    smaller site id). Both inputs need lat/lon columns.

    ``max_dist_deg`` must be <= CELL_DEG: the 3×3 neighborhood then
    provably covers every admissible pair — because BOTH cell axes are
    bucketed in the metric's own coordinates (lat raw, lon pre-scaled by
    LON_SCALE), an admissible pair differs by <= max_dist_deg <= CELL_DEG
    in each bucketed axis, i.e. by at most one cell. Bucketing lon in raw
    degrees would break the proof: the metric admits raw lon deltas up to
    max_dist_deg / LON_SCALE, which at LON_SCALE=0.5 is two cells.
    """
    if max_dist_deg > CELL_DEG:
        raise ValueError("radius must fit the 3x3 neighborhood")
    pcell = points.select(
        point_id,
        "lat",
        "lon",
        F.floor(F.col("lat") / CELL_DEG).cast("long").alias("cx"),
        F.floor(F.col("lon") * LON_SCALE / CELL_DEG).cast("long").alias("cy"),
    )
    # Replicate each site into its 9 neighbor cells (explode is
    # map-side, the ×9 lands only on the small broadcast side).
    offs = F.expr("explode(sequence(-1, 1))")
    scell = (
        sites.select(
            site_id,
            F.col("lat").alias("slat"),
            F.col("lon").alias("slon"),
            F.floor(F.col("lat") / CELL_DEG).cast("long").alias("scx"),
            F.floor(F.col("lon") * LON_SCALE / CELL_DEG)
            .cast("long")
            .alias("scy"),
        )
        .withColumn("dx", offs)
        .withColumn("dy", offs)
        .select(
            site_id,
            "slat",
            "slon",
            (F.col("scx") + F.col("dx")).alias("cx"),
            (F.col("scy") + F.col("dy")).alias("cy"),
        )
    )
    d2 = dist2_expr(F.col("lat"), F.col("lon"), F.col("slat"), F.col("slon"))
    cand = (
        pcell.join(F.broadcast(scell), ["cx", "cy"])
        .select(point_id, site_id, d2.alias("d2"))
        .filter(F.col("d2") <= max_dist_deg * max_dist_deg)
    )
    return cand.groupBy(point_id).agg(
        F.min_by(site_id, F.struct("d2", site_id)).alias(site_id),
        F.min(F.struct("d2", site_id)).getField("d2").alias("d2"),
    )
