"""COCO JSON export (SURVEY.md §2.1 S10, §2.4 A4/A6/A7).

Re-expresses the reference exporter (create_coco_from_feather.py:46-116)
as Spark plans: category dictionary-encoding, dense image/annotation id
assignment, and the image↔annotation join all run distributed; only the
final (small) JSON document assembly collects to the driver — a COCO file
is a single small document by definition, so the edge collect is the
export, not a shortcut.

Reference semantics preserved:
- category ids are 1-based over the *sorted* distinct categories
  (background = 0 stays reserved; :59-70).
- image ids and annotation ids are dense 0-based integers. The reference
  uses nondeterministic iteration order (:75-84, :98-106); here ids come
  from ``row_number()`` over an explicit ordering (image_name; then
  annotation sort keys) so exports are reproducible — the SURVEY §7
  risk-3 divergence, on purpose.
- ODTK records: bbox = rcoco, area = rcoco[2]*rcoco[3]; segmentation only
  for validation sets (:14-26). D2 records: bbox = axis-aligned envelope
  of the segmentation, segmentation always present, and area *still*
  rcoco-based — a reference quirk (:28-44) kept for parity.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.geometry import segmentation_bbox
from ..operators.ids import dense_ids

COCO_INFO = {
    "description": "Dataset",
    "url": "http://permaling.com",
    "version": "1.0",
    "year": 2022,
    "contributor": "Permaling",
    "date_created": "2022/04/29",
}

COCO_LICENSES = [
    {
        "url": "http://creativecommons.org/licenses/by-nc-sa/2.0/",
        "id": 1,
        "name": "Attribution-NonCommercial-ShareAlike License",
    }
]


def coco_categories(anno: DataFrame, category_col: str = "category") -> DataFrame:
    """Sorted-distinct dictionary encode, ids from 1
    (A6; create_coco_from_feather.py:59-70)."""
    return (
        anno.select(F.col(category_col).alias("name"))
        .distinct()
        .withColumn("category_id", F.row_number().over(Window.orderBy("name")))
    )


def coco_images(images: DataFrame) -> DataFrame:
    """Dense 0-based image ids by image_name order
    (A7; create_coco_from_feather.py:73-84). Distributed assignment —
    no single-task global window (operators.ids)."""
    return dense_ids(
        images.select("image_name", "width", "height"),
        ["image_name"],
        id_col="image_id",
    )


def coco_annotations(
    anno: DataFrame,
    images: DataFrame,
    odtk: bool = True,
    train: bool = True,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Annotation records with dense ids, joined to image ids
    (J1 + A7; create_coco_from_feather.py:98-106).

    The image side is dimension-sized next to annotations, so the join
    broadcasts; id assignment is distributed over the explicit
    ``order_cols`` (default: image_name, category) via ``dense_ids`` —
    deterministic, dense, and free of single-task global windows.
    """
    order_cols = order_cols or ["image_name", "category"]
    img_ids = F.broadcast(coco_images(images).select("image_name", "image_id"))
    cats = F.broadcast(coco_categories(anno))
    joined = (
        anno.join(img_ids, "image_name", "inner")
        .join(cats, anno["category"] == cats["name"], "inner")
        .drop("name")
    )
    out = dense_ids(joined, order_cols, id_col="anno_id").withColumn(
        "iscrowd", F.lit(0)
    )
    area = (F.element_at("rcoco", 3) * F.element_at("rcoco", 4)).alias("area")
    if odtk:
        out = out.select(
            "anno_id",
            "image_id",
            "category_id",
            "iscrowd",
            F.col("rcoco").alias("bbox"),
            area,
            *([] if train else [F.col("segmentation")]),
        )
    else:
        out = out.select(
            "anno_id",
            "image_id",
            "category_id",
            "iscrowd",
            segmentation_bbox(F.col("segmentation")).alias("bbox"),
            area,
            "segmentation",
        )
    return out


def coco_document(
    anno: DataFrame,
    images: DataFrame,
    odtk: bool = True,
    train: bool = True,
) -> dict:
    """Assemble the complete COCO dict (edge collect — the document is
    small by contract; data stays distributed until here)."""
    cats = [
        {"supercategory": r["name"], "id": r["category_id"], "name": r["name"]}
        for r in coco_categories(anno).orderBy("category_id").collect()
    ]
    imgs = [
        {
            "license": 1,
            "file_name": r["image_name"] + ".jpeg",
            "height": r["height"],
            "width": r["width"],
            "id": r["image_id"],
        }
        for r in coco_images(images).orderBy("image_id").collect()
    ]
    annos = []
    for r in (
        coco_annotations(anno, images, odtk=odtk, train=train)
        .orderBy("anno_id")
        .collect()
    ):
        rec = {
            "iscrowd": r["iscrowd"],
            "image_id": r["image_id"],
            "bbox": list(r["bbox"]) if r["bbox"] is not None else None,
            "category_id": r["category_id"],
            "area": r["area"],
            "id": r["anno_id"],
        }
        if "segmentation" in r.__fields__:
            rec["segmentation"] = [list(r["segmentation"])]
        annos.append(rec)
    return {
        "info": COCO_INFO,
        "licenses": COCO_LICENSES,
        "images": imgs,
        "annotations": annos,
        "categories": cats,
    }


def write_coco_json(
    anno: DataFrame,
    images: DataFrame,
    output_json: str,
    odtk: bool = True,
    train: bool = True,
) -> dict:
    doc = coco_document(anno, images, odtk=odtk, train=train)
    with open(output_json, "w") as f:
        json.dump(doc, f)
    return doc
