"""Expression-level geometry scalar functions (SURVEY.md §2.7 F8-F12, §2.4 A8).

Everything here is built-in `pyspark.sql.functions` — JVM-side, codegen,
SQL-oracle-checkable. The numpy kernel (rotated bboxes, G1-G4) lives in
`operators.geometry`; this module covers the parts that never need Python:
envelope bboxes, aabb↔polygon restructuring, YOLO coordinate normalization.

Reference behaviors re-expressed (citations under /root/reference/MLPipelines/):
- segmentation2bbox      COCOUtils.py:82-89
- aabb2poly              COCOUtils.py:91-101
- rect → closed polygon  CvatApi.py:317-325
- YOLO normalize         create_yolo_from_feather.py:9-23
- flat seg ↔ point pairs COCOUtils.py:14 / create_coco_from_feather.py:29
- bbox area              create_coco_from_feather.py:21,40
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .text import let


def _pair_indexes(s: Column) -> Column:
    """1-based pair indexes [1..size/2]; empty for fewer than 2 elements
    (guarded — Spark's sequence(1,0) would *descend*, not return empty)."""
    n_pairs = F.floor(F.size(s) / 2).cast("int")
    return F.when(
        n_pairs >= 1, F.sequence(F.lit(1), n_pairs)
    ).otherwise(F.array().cast("array<int>"))


def seg_points(seg: Column) -> Column:
    """Flat [x0,y0,x1,y1,...] → array of [x,y] pairs (F8;
    reference reshape(-1,2) at COCOUtils.py:14)."""
    return let(
        seg,
        lambda s: F.transform(
            _pair_indexes(s),
            lambda i: F.array(
                F.element_at(s, i * 2 - 1), F.element_at(s, i * 2)
            ),
        ),
    )


def seg_coord(seg: Column, axis: int) -> Column:
    """Every-other-element slice: axis 0 = xs, 1 = ys."""
    return let(
        seg,
        lambda s: F.transform(
            _pair_indexes(s),
            lambda i: F.element_at(s, i * 2 - 1 + axis),
        ),
    )


def seg_axis_min(seg: Column, axis: int) -> Column:
    """Min coordinate along ``axis`` (0=x, 1=y) with a whole-stage-codegen
    fast path for 4-point polygons (the dominant case — every rectangle):
    higher-order functions (transform/array_min over a lambda) run
    INTERPRETED in Spark, and on the 600k-row export bench the
    least/greatest branch cut the envelope stage ~2x. Other sizes fall
    back to the general slice + array_min.

    Deliberately NOT let-bound: ``let`` routes the body through a
    transform lambda, which would demote the fast branch to interpreted
    evaluation — the exact cost this helper exists to avoid. ``seg``
    should be a plain column (repeated references are free under
    codegen CSE); the interpreted slice runs only on non-4-point rows."""
    return F.when(
        F.size(seg) == 8,
        F.least(*[F.element_at(seg, 2 * i + 1 + axis) for i in range(4)]),
    ).otherwise(F.array_min(seg_coord(seg, axis)))


def seg_axis_max(seg: Column, axis: int) -> Column:
    """Max coordinate along ``axis`` — see :func:`seg_axis_min`."""
    return F.when(
        F.size(seg) == 8,
        F.greatest(*[F.element_at(seg, 2 * i + 1 + axis) for i in range(4)]),
    ).otherwise(F.array_max(seg_coord(seg, axis)))


def segmentation_bbox(seg: Column) -> Column:
    """Axis-aligned envelope [xmin, ymin, w, h] as array<double>
    (G5/A8; reference segmentation2bbox COCOUtils.py:82-89).

    ``seg`` is let-bound ONCE before the 12 coordinate references — this
    general entry point cannot assume the input column is cheap (callers
    pass HOF-built polygons, e.g. the seg_bbox bench corpus, and
    CollapseProject would otherwise inline that interpreted subtree into
    every reference). Inside the binding the least/greatest fast path
    still avoids the xs/ys array allocations of the old slice approach.
    Callers with a provably cheap column can use seg_axis_min/max raw."""

    def bbox(s: Column) -> Column:
        xmin, ymin = seg_axis_min(s, 0), seg_axis_min(s, 1)
        xmax, ymax = seg_axis_max(s, 0), seg_axis_max(s, 1)
        return F.array(
            xmin.cast("double"),
            ymin.cast("double"),
            (xmax - xmin).cast("double"),
            (ymax - ymin).cast("double"),
        )

    return let(seg, bbox)


def aabb_to_polygon(aabb: Column) -> Column:
    """[x,y,w,h] → 4-corner flat polygon [x0,y0,...] (F11;
    reference aabb2poly COCOUtils.py:91-101)."""
    return let(
        aabb,
        lambda a: F.array(
            F.element_at(a, 1),
            F.element_at(a, 2),
            F.element_at(a, 1) + F.element_at(a, 3),
            F.element_at(a, 2),
            F.element_at(a, 1) + F.element_at(a, 3),
            F.element_at(a, 2) + F.element_at(a, 4),
            F.element_at(a, 1),
            F.element_at(a, 2) + F.element_at(a, 4),
        ),
    )


def rect_to_closed_polygon(ltrb: Column) -> Column:
    """[left,top,right,bottom] → closed 5-point flat polygon (F10;
    reference rect shape expansion CvatApi.py:317-325)."""
    return let(
        ltrb,
        lambda r: F.array(
            F.element_at(r, 1), F.element_at(r, 2),
            F.element_at(r, 3), F.element_at(r, 2),
            F.element_at(r, 3), F.element_at(r, 4),
            F.element_at(r, 1), F.element_at(r, 4),
            F.element_at(r, 1), F.element_at(r, 2),
        ),
    )


def bbox_area(bbox: Column) -> Column:
    """w*h of an [x,y,w,h] box (F12; reference rcoco[2]*rcoco[3],
    create_coco_from_feather.py:21,40)."""
    return (F.element_at(bbox, 3) * F.element_at(bbox, 4)).cast("double")


def yolo_box(bbox: Column, img_w: Column, img_h: Column) -> Column:
    """[x,y,w,h] absolute → YOLO [x_center,y_center,w,h] normalized to
    image dims (F9; reference create_yolo_from_feather.py:9-23)."""
    return let(
        bbox,
        lambda b: F.array(
            (F.element_at(b, 1) + F.element_at(b, 3) / 2) / img_w,
            (F.element_at(b, 2) + F.element_at(b, 4) / 2) / img_h,
            F.element_at(b, 3) / img_w,
            F.element_at(b, 4) / img_h,
        ),
    )
