"""Geometry kernel tests — numpy rotated-bbox properties + Spark plumbing.

The reference kernel (COCOUtils.py:8-80) depends on shapely, which is not
in this container; correctness is established by geometric invariants
(golden strategy per SURVEY.md §5.2-5.3) rather than library diffing:
containment, minimality vs the axis-aligned envelope, corner round-trip,
clamping floors, and degeneracy handling.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from ml_pipelines_spark.operators.geometry import (
    convex_hull,
    envelope_bbox,
    minimum_rotated_rect,
    rbb_coco_from_seg,
    rotated_bbox_from_corners,
)
from ml_pipelines_spark.testing import check_query

RNG = np.random.default_rng(42)


def random_polygons(n: int, max_pts: int = 12):
    polys = []
    for _ in range(n):
        k = int(RNG.integers(3, max_pts))
        pts = RNG.uniform(0, 1000, size=(k, 2))
        polys.append(pts)
    return polys


def rect_corners_from_rcoco(rcoco):
    """Reconstruct the 4 corners from [x, y, w, h, theta] by undoing the
    axis-frame transform (inverse of _axis_frame_box)."""
    x, y, w, h, theta = rcoco
    axis = np.array([[x, y], [x + w, y], [x + w, y + h], [x, y + h]])
    centre = axis.mean(axis=0)
    c, s = math.cos(theta), math.sin(theta)
    rot_inv = np.array([[c, s], [-s, c]])  # inverse of [[c,-s],[s,c]]
    return (axis - centre) @ rot_inv + centre


class TestMinimumRotatedRect:
    def test_contains_all_points(self):
        for pts in random_polygons(25):
            ring = minimum_rotated_rect(pts)
            assert ring is not None
            # Point-in-rectangle via projection onto the rect's edge axes.
            o, e1, e2 = ring[0], ring[1] - ring[0], ring[3] - ring[0]
            rel = pts - o
            u = rel @ e1 / (e1 @ e1)
            v = rel @ e2 / (e2 @ e2)
            assert (u > -1e-9).all() and (u < 1 + 1e-9).all()
            assert (v > -1e-9).all() and (v < 1 + 1e-9).all()

    def test_no_larger_than_envelope(self):
        for pts in random_polygons(25):
            ring = minimum_rotated_rect(pts)
            w = np.linalg.norm(ring[1] - ring[0])
            h = np.linalg.norm(ring[3] - ring[0])
            env = envelope_bbox(pts)
            assert w * h <= env[2] * env[3] + 1e-6

    def test_axis_aligned_square_recovered(self):
        sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], dtype=float)
        ring = minimum_rotated_rect(sq)
        assert ring.shape == (5, 2)
        assert np.allclose(sorted(map(tuple, ring[:4])), sorted(map(tuple, sq)))

    def test_rotated_rect_recovered(self):
        base = np.array([[0, 0], [20, 0], [20, 8], [0, 8]], dtype=float)
        theta = 0.7
        c, s = math.cos(theta), math.sin(theta)
        rot = base @ np.array([[c, s], [-s, c]])
        ring = minimum_rotated_rect(rot)
        w = np.linalg.norm(ring[1] - ring[0])
        h = np.linalg.norm(ring[3] - ring[0])
        assert math.isclose(w * h, 160.0, rel_tol=1e-6)

    def test_collinear_is_none(self):
        pts = np.array([[0, 0], [1, 1], [2, 2], [3, 3]], dtype=float)
        assert minimum_rotated_rect(pts) is None

    def test_hull_is_ccw(self):
        for pts in random_polygons(10):
            hull = convex_hull(pts)
            area2 = 0.0
            for i in range(len(hull)):
                x0, y0 = hull[i]
                x1, y1 = hull[(i + 1) % len(hull)]
                area2 += x0 * y1 - x1 * y0
            assert area2 > 0


class TestRotatedBbox:
    def test_roundtrip_corners(self):
        for pts in random_polygons(25):
            ring = minimum_rotated_rect(pts)
            rcoco = rotated_bbox_from_corners(ring, min_area=0.0, min_hw=0.0)
            rec = rect_corners_from_rcoco(rcoco)
            got = sorted(map(tuple, np.round(rec, 6)))
            want = sorted(map(tuple, np.round(ring[:4], 6)))
            assert np.allclose(got, want, atol=1e-4)

    def test_positive_extents(self):
        for pts in random_polygons(25):
            ring = minimum_rotated_rect(pts)
            rcoco = rotated_bbox_from_corners(ring)
            assert rcoco[2] > 0 and rcoco[3] > 0

    def test_small_box_clamped(self):
        # 0.5 x 0.5 box: below min_hw=1 and min_area=4 → rescaled + floored.
        ring = np.array(
            [[0, 0], [0.5, 0], [0.5, 0.5], [0, 0.5], [0, 0]], dtype=float
        )
        rcoco = rotated_bbox_from_corners(ring, min_area=4.0, min_hw=1.0)
        w, h = rcoco[2], rcoco[3]
        assert w >= 1.0 and h >= 1.0
        # sqrt rescale puts area at >= min_area before the per-side floor
        assert w * h >= 4.0 - 1e-9

    def test_filter_small_drops(self):
        ring = np.array(
            [[0, 0], [0.5, 0], [0.5, 0.5], [0, 0.5], [0, 0]], dtype=float
        )
        assert (
            rotated_bbox_from_corners(ring, min_area=4.0, min_hw=1.0, filter_small=True)
            is None
        )


class TestRbbCocoFromSeg:
    def test_degenerate_inputs(self):
        assert rbb_coco_from_seg(None) is None
        assert rbb_coco_from_seg([0, 0, 1, 1]) is None  # < 3 points
        assert rbb_coco_from_seg([0, 0, 1, 1, 2, 2]) is None  # collinear

    def test_envelope_matches_numpy(self):
        for pts in random_polygons(10):
            seg = pts.reshape(-1).tolist()
            out = rbb_coco_from_seg(seg)
            assert out is not None
            _, coco = out
            assert np.allclose(
                coco,
                [
                    pts[:, 0].min(),
                    pts[:, 1].min(),
                    pts[:, 0].ptp(),
                    pts[:, 1].ptp(),
                ],
            )

    def test_rotated_area_not_larger_than_envelope(self):
        for pts in random_polygons(10):
            out = rbb_coco_from_seg(pts.reshape(-1).tolist(), min_area=0.0, min_hw=0.0)
            rcoco, coco = out
            assert rcoco[2] * rcoco[3] <= coco[2] * coco[3] + 1e-6


@pytest.mark.parametrize("name", ["seg_bbox", "aabb_poly", "yolo_norm"])
def test_oracle_parity(spark, sf_dir, name):
    assert check_query(spark, sf_dir, name) == []


def test_rbb_from_seg_spark(spark, sf_dir):
    # The query now emits the invariants directly (driver-hashable
    # booleans); every row must certify containment and minimality.
    from ml_pipelines_spark.queries import QUERIES

    pdf = QUERIES["rbb_from_seg"](spark, sf_dir).toPandas()
    assert len(pdf) > 0
    assert pdf["contains_all_points"].all()
    assert pdf["area_le_aabb"].all()
