"""Dataset facade (ml_pipelines_spark.datasets) — the reference's class
API surface (TrainDatasets.py:70-533) driven end-to-end on a synthetic
corpus: round-trip writes, skip-tag filtering, the seeded entity-keyed
sampler with its leakage invariant, and crop/item sampling."""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F

from ml_pipelines_spark.datasets import (
    DatasetN1Crops,
    DatasetN1CropsMulti,
    DatasetObjDetect,
)
from ml_pipelines_spark.operators.images import encode_image, synth_pixels
from ml_pipelines_spark.schemas import ANNO_SCHEMA, CROPS_SCHEMA, IMAGE_SCHEMA

TS = datetime.datetime(2026, 1, 1, tzinfo=datetime.timezone.utc)


def _seg(cx, cy):
    return [float(cx), float(cy), float(cx + 10), float(cy),
            float(cx + 10), float(cy + 8), float(cx), float(cy + 8)]


@pytest.fixture(scope="module")
def od(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("odroot"))
    d = DatasetObjDetect(spark, root, dataset="od_rbb")
    images = []
    annos = []
    for p in (1, 2):
        for i in range(10):
            name = f"p{p}_img{i}"
            tags = ["badimage"] if i == 9 else ["ok"]
            images.append(
                (p, 10 * p, 100 * p, name,
                 encode_image(synth_pixels(8, 6, seed=i)), tags, TS)
            )
            for j in range(3):
                annos.append(
                    (p, 10 * p, 100 * p, -1, 1000 + i, name,
                     "excluderegion" if j == 2 else "car", "[]",
                     _seg(5 * j, 4 * j), [1.0, 2.0, 3.0, 4.0, 0.0],
                     [1.0, 2.0, 3.0, 4.0], TS)
                )
    d.add_images(spark.createDataFrame(images, IMAGE_SCHEMA))
    d.add_annotations(spark.createDataFrame(annos, ANNO_SCHEMA))
    return d


def test_round_trip_and_layout(od):
    assert od.images().count() == 20
    assert od.annotations().count() == 60
    # low-cardinality partitioning, not per-image (SURVEY §4 anti-pattern)
    dirs = os.listdir(od.anno_path)
    assert any(x.startswith("project_id=") for x in dirs)
    assert not any("image_name=" in x for x in dirs)


def test_unique_image_names_skip_tags(od):
    names = od.unique_image_names([1, 2], skip_tags=["badimage"])
    got = {r["image_name"] for r in names.collect()}
    assert len(got) == 18 and not any(n.endswith("img9") for n in got)


def test_fetch_image_partitions_metadata_only(od):
    parts = od.fetch_image_partitions()
    assert {r["project_id"] for r in parts.collect()} == {1, 2}
    # partition-value scan must not touch data columns
    assert "ReadSchema: struct<>" in parts._jdf.queryExecution().executedPlan().toString() or \
        "image_bytes" not in parts._jdf.queryExecution().executedPlan().toString()


def test_image_sampler_leakage_and_coverage(od):
    train, val, test = od.image_sampler(
        [1, 2], skip_tags=["badimage"], p=0.4, test_split=True, seed=7
    )
    splits = {"train": train, "val": val, "test": test}
    names = {
        k: {r["image_name"] for r in v.select("image_name").distinct().collect()}
        for k, v in splits.items()
    }
    # leakage invariant: an image's annotations live in exactly one split
    assert not (names["train"] & names["val"])
    assert not (names["train"] & names["test"])
    assert not (names["val"] & names["test"])
    assert len(names["train"] | names["val"] | names["test"]) == 18
    # every kept image contributes all 3 of its annotations to its split
    total = sum(v.count() for v in splits.values())
    assert total == 18 * 3
    # seeded: repeat run identical
    t2, v2, x2 = od.image_sampler(
        [1, 2], skip_tags=["badimage"], p=0.4, test_split=True, seed=7
    )
    assert {r["image_name"] for r in v2.select("image_name").collect()} == names["val"]


def test_get_annotations_by_project(od):
    anno = od.get_annotations_by_project(1, skip_tags=["badimage"])
    assert anno.count() == 9 * 3
    assert anno.select("project_id").distinct().first()[0] == 1


def test_write_images_redacts_and_manifests(od, tmp_path):
    out = str(tmp_path / "export")
    anno = od.get_annotations_by_project(1)
    manifest = od.write_images(anno, out)
    rows = manifest.collect()
    assert len(rows) == 10
    files = os.listdir(out)
    assert len(files) == 10 and all(f.endswith(".fimg") for f in files)


@pytest.fixture(scope="module")
def crops(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("croproot"))
    d = DatasetN1CropsMulti(spark, root)
    rows = []
    for iid in range(6):
        for cap in ("aaaa", "bbbb"):
            rows.append(
                (iid, 0, 0, f"crop_{iid}_{cap}", cap,
                 encode_image(synth_pixels(4, 4, seed=iid)),
                 ["word1", "word2"], [4.0, 4.0], True, TS)
            )
    d.add_images(spark.createDataFrame(rows, CROPS_SCHEMA))
    return d


def test_unique_items_and_sampler(crops):
    items = {r["item_id"] for r in crops.unique_items().collect()}
    assert items == set(range(6))
    train, hold = crops.iid_sampler(p=0.4, seed=3)
    tr = {r["item_id"] for r in train.collect()}
    ho = {r["item_id"] for r in hold.collect()}
    assert tr | ho == items and not (tr & ho)


def test_fetch_partitions_and_training_data(crops):
    parts = {(r["item_id"], r["capture_uuid"]) for r in crops.fetch_partitions().collect()}
    assert len(parts) == 12
    td = crops.fetch_training_data(2)
    assert td.count() == 2
    assert set(td.columns) == {"item_id", "capture_uuid", "image_name", "crop", "bow", "in_fence"}


def test_crops_write_images(crops, tmp_path):
    out = str(tmp_path / "cropexp")
    crops.write_images([0, 1], out)
    files = os.listdir(out)
    assert len(files) == 4 and all(f.startswith(("0_", "1_")) for f in files)
