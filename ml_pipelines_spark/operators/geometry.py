"""Rotated-bbox geometry kernel (SURVEY.md §2.8 G1-G4) as a pandas UDF.

Re-expresses the reference's shapely-based kernel (COCOUtils.py:8-80) with
a self-contained numpy implementation — the container has no shapely, and
at scale a pure-numpy Arrow-batched UDF avoids a heavyweight geometry
dependency on every executor anyway:

- ``minimum_rotated_rect``  replaces shapely ``minimum_rotated_rectangle``
  (COCOUtils.py:17-26) with the classic convex-hull (Andrew monotone
  chain) + rotating-edge search: the minimum-area enclosing rectangle of a
  point set has one side collinear with a hull edge, so scanning hull
  edges is exact.
- ``rotated_bbox_from_corners`` preserves the reference's ODTK-style
  parameterization and clamping semantics (COCOUtils.py:40-80): bearing of
  the first edge, rotate-to-axis, corner-permutation search for positive
  w/h, then min-area/min-hw clamping with sqrt rescale. Divergences from
  the reference, on purpose: no stdout prints, and corner order is
  normalized (start at lowest (y,x), counter-clockwise) instead of
  inheriting shapely's ring order — the rectangle is identical; theta may
  differ by a multiple of pi/2 with w/h swapped accordingly.
- degenerate inputs (fewer than 3 distinct points, collinear points)
  return null, matching the reference's None for hull-less geometries
  (COCOUtils.py:23-25) and its degenerate-polygon skip (CvatApi.py:364-369).

The UDF computes in float64 and emits float64; storage schemas keep
float32 (SURVEY.md §7 risk 1 — cast at the write boundary, not inside the
kernel).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StructField,
    StructType,
)

DEFAULT_MIN_AREA = 4.0  # reference defaults, COCOUtils.py:9
DEFAULT_MIN_HW = 1.0


# ---------------------------------------------------------------------------
# numpy geometry primitives
# ---------------------------------------------------------------------------

def convex_hull(points: np.ndarray) -> np.ndarray:
    """Convex hull in counter-clockwise order (Andrew monotone chain).

    Returns an (n,2) float64 array of hull vertices, no repeated endpoint.
    Fewer than 3 non-collinear points → the degenerate hull (n<3).
    """
    pts = np.unique(np.asarray(points, dtype=np.float64), axis=0)
    if len(pts) < 3:
        return pts
    # lexicographic sort by (x, y)
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    pts = pts[order]

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower: list[np.ndarray] = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list[np.ndarray] = []
    for p in pts[::-1]:
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    return np.array(lower[:-1] + upper[:-1])


def minimum_rotated_rect(points: np.ndarray) -> np.ndarray | None:
    """Minimum-area enclosing rectangle of a point set.

    Returns a closed ring of 5 corners (first == last), counter-clockwise,
    starting at the corner with the lowest (y, x) — the numpy stand-in for
    shapely ``minimum_rotated_rectangle().exterior.coords``
    (COCOUtils.py:22-26). None when the hull is degenerate.
    """
    hull = convex_hull(points)
    if len(hull) < 3:
        return None

    edges = np.roll(hull, -1, axis=0) - hull
    angles = np.arctan2(edges[:, 1], edges[:, 0])
    # Rectangle orientation is modulo pi/2.
    angles = np.unique(np.mod(angles, math.pi / 2))

    best_area = math.inf
    best: np.ndarray | None = None
    for a in angles:
        c, s = math.cos(a), math.sin(a)
        rot = np.array([[c, s], [-s, c]])  # rotate by -a
        proj = hull @ rot.T
        mins = proj.min(axis=0)
        maxs = proj.max(axis=0)
        w, h = maxs - mins
        area = w * h
        if area < best_area - 1e-12:
            best_area = area
            corners = np.array(
                [
                    [mins[0], mins[1]],
                    [maxs[0], mins[1]],
                    [maxs[0], maxs[1]],
                    [mins[0], maxs[1]],
                ]
            )
            best = corners @ rot  # rotate back by +a

    if best is None or best_area <= 0.0:
        return None
    # Normalize: start at lowest (y, x), keep CCW order.
    start = int(np.lexsort((best[:, 0], best[:, 1]))[0])
    ring = np.roll(best, -start, axis=0)
    return np.vstack([ring, ring[:1]])


def bearing(p0: np.ndarray, p1: np.ndarray) -> float:
    """Angle of the edge p0→p1 in (-pi, pi] (COCOUtils.py:28-37)."""
    theta = math.atan2(p1[1] - p0[1], p1[0] - p0[0])
    if theta > math.pi:
        theta -= 2 * math.pi
    if theta < -math.pi:
        theta += 2 * math.pi
    return theta


def _axis_frame_box(corners: np.ndarray) -> tuple[float, float, float, float, float]:
    """ODTK [x, y, w, h, theta] from 4 rect corners: rotate the rect about
    its centroid so edge 0→1 is the x-axis, read off corner 0 and the
    diagonal (COCOUtils.py:40-48)."""
    centre = corners.mean(axis=0)
    theta = bearing(corners[0], corners[1])
    c, s = math.cos(theta), math.sin(theta)
    rotation = np.array([[c, -s], [s, c]])
    out = (corners - centre) @ rotation + centre
    x, y = out[0]
    w, h = out[2] - out[0]
    return float(x), float(y), float(w), float(h), float(theta)


def rotated_bbox_from_corners(
    ring: np.ndarray,
    min_area: float = DEFAULT_MIN_AREA,
    min_hw: float = DEFAULT_MIN_HW,
    filter_small: bool = False,
) -> list[float] | None:
    """[x, y, w, h, theta] with the reference's permutation + clamp
    semantics (COCOUtils.py:50-80).

    Walks cyclic rotations of the 4 corners until w>0 and h>0; a box below
    the size floor is rescaled by sqrt(min_area/(w*h)) then floored at
    min_hw per side (or dropped entirely when ``filter_small``).
    """
    corners = [tuple(p) for p in np.asarray(ring, dtype=np.float64)]

    def clamp(x, y, w, h, theta):
        if w < min_hw or h < min_hw or w * h < min_area:
            if filter_small:
                return None
            w = max(0.1, w)
            h = max(0.1, h)
            if w * h < min_area:
                scale = math.sqrt(min_area / w / h)
                w *= scale
                h *= scale
            w = max(min_hw, w)
            h = max(min_hw, h)
        return [x, y, w, h, theta]

    for idx in range(len(corners) - 1):
        permuted = np.array(corners[idx:-1] + corners[0:idx])
        x, y, w, h, theta = _axis_frame_box(permuted)
        if w > 0 and h > 0:
            return clamp(x, y, w, h, theta)

    # No orientation yields positive extents (degenerate rect): clamp the
    # base orientation unless filtering (COCOUtils.py:73-80).
    if filter_small:
        return None
    x, y, w, h, theta = _axis_frame_box(np.array(corners[0:-1]))
    return [x, y, max(min_hw, w), max(min_hw, h), theta]


def envelope_bbox(points: np.ndarray) -> list[float]:
    """Axis-aligned [xmin, ymin, w, h] (COCOUtils.py:82-89)."""
    mins = points.min(axis=0)
    maxs = points.max(axis=0)
    return [
        float(mins[0]),
        float(mins[1]),
        float(maxs[0] - mins[0]),
        float(maxs[1] - mins[1]),
    ]


def rbb_coco_from_seg(
    seg: list[float] | np.ndarray,
    min_area: float = DEFAULT_MIN_AREA,
    min_hw: float = DEFAULT_MIN_HW,
    filter_small: bool = False,
) -> tuple[list[float], list[float]] | None:
    """Segmentation → (rotated bbox [x,y,w,h,theta], axis-aligned bbox)
    (G1; COCOUtils.py:8-15). None for degenerate geometry."""
    if seg is None or len(seg) < 6:
        return None
    points = np.asarray(seg, dtype=np.float64).reshape(-1, 2)
    ring = minimum_rotated_rect(points)
    if ring is None:
        return None
    rcoco = rotated_bbox_from_corners(ring, min_area, min_hw, filter_small)
    if rcoco is None:
        return None
    return rcoco, envelope_bbox(points)


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

RBB_RESULT_TYPE = StructType(
    [
        StructField("rcoco", ArrayType(DoubleType()), True),
        StructField("coco", ArrayType(DoubleType()), True),
    ]
)


def rbb_coco_udf(
    min_area: float = DEFAULT_MIN_AREA,
    min_hw: float = DEFAULT_MIN_HW,
    filter_small: bool = False,
):
    """Arrow-batched pandas UDF: segmentation array → struct(rcoco, coco).

    One python→numpy pass per Arrow batch; no per-row Python in the plan
    apart from the kernel itself (the irreducible core, SURVEY.md §2.8).
    """

    @F.pandas_udf(RBB_RESULT_TYPE)
    def _udf(segs: pd.Series) -> pd.DataFrame:
        rcocos: list[list[float] | None] = []
        cocos: list[list[float] | None] = []
        for seg in segs:
            out = rbb_coco_from_seg(seg, min_area, min_hw, filter_small)
            if out is None:
                rcocos.append(None)
                cocos.append(None)
            else:
                rcocos.append(out[0])
                cocos.append(out[1])
        return pd.DataFrame({"rcoco": rcocos, "coco": cocos})

    return _udf


def with_rotated_bbox(
    df,
    seg_col: str = "segmentation",
    out_prefix: str = "",
    min_area: float = DEFAULT_MIN_AREA,
    min_hw: float = DEFAULT_MIN_HW,
    filter_small: bool = False,
    repartition: int | None = None,
):
    """Attach rcoco/coco columns computed from ``seg_col`` (the E2
    ingestion step at CvatApi.py:365, distributed).

    ``repartition``: spread the input over N partitions first. The UDF
    stage's parallelism is its input partitioning — a single small file
    (or a driver-side createDataFrame) otherwise runs the whole
    CPU-bound numpy kernel on one thread.
    """
    if repartition is not None:
        df = df.repartition(repartition)
    res = rbb_coco_udf(min_area, min_hw, filter_small)(F.col(seg_col))
    tmp = "__rbb"
    return (
        df.withColumn(tmp, res)
        .withColumn(f"{out_prefix}rcoco", F.col(f"{tmp}.rcoco"))
        .withColumn(f"{out_prefix}coco", F.col(f"{tmp}.coco"))
        .drop(tmp)
    )
