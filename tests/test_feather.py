"""Feather (Arrow IPC) source — lossless read of reference-style snapshots
(sources.feather; reference TrainDatasets.py:195 reads feather via pyarrow).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.feather as feather
import pytest

from ml_pipelines_spark.sources.feather import (
    feather_to_parquet,
    read_feather,
    write_feather,
)


def _anno_table(start: int, n: int) -> pa.Table:
    """Reference-shaped annotation rows: ids, names, floats, a list col."""
    return pa.table(
        {
            "anno_id": pa.array(range(start, start + n), pa.int64()),
            "image_name": pa.array([f"img_{i % 7}.jpg" for i in range(n)]),
            "score": pa.array([i * 0.5 for i in range(n)], pa.float64()),
            "bbox": pa.array(
                [[float(i), float(i + 1), 10.0, 20.0] for i in range(n)],
                pa.list_(pa.float32()),
            ),
        }
    )


@pytest.fixture(scope="module")
def feather_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("feather_src")
    feather.write_feather(_anno_table(0, 40), str(d / "part0.feather"))
    feather.write_feather(_anno_table(40, 25), str(d / "part1.feather"))
    return str(d)


def test_read_feather_roundtrip(spark, feather_dir):
    df = read_feather(spark, feather_dir)
    assert df.count() == 65
    assert set(df.columns) == {"anno_id", "image_name", "score", "bbox"}
    rows = {r["anno_id"]: r for r in df.collect()}
    assert rows[3]["image_name"] == "img_3.jpg"
    assert rows[42]["score"] == pytest.approx(1.0)
    assert rows[0]["bbox"] == pytest.approx([0.0, 1.0, 10.0, 20.0])


def test_read_feather_column_pruning(spark, feather_dir):
    df = read_feather(spark, feather_dir, columns=["anno_id", "score"])
    assert df.columns == ["anno_id", "score"]
    assert df.count() == 65


def test_read_feather_single_file_and_glob(spark, feather_dir):
    one = read_feather(spark, os.path.join(feather_dir, "part0.feather"))
    assert one.count() == 40
    globbed = read_feather(spark, os.path.join(feather_dir, "*.feather"))
    assert globbed.count() == 65


def test_read_feather_missing_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_feather(spark, str(tmp_path / "nope"))


def test_read_feather_casts_benign_drift(spark, tmp_path):
    # A second file with int32 ids must cast up to the probed int64
    # contract rather than corrupt or silently union.
    a = pa.table({"k": pa.array([1, 2], pa.int64()), "v": pa.array(["a", "b"])})
    b = pa.table({"k": pa.array([3, 4], pa.int32()), "v": pa.array(["c", "d"])})
    feather.write_feather(a, str(tmp_path / "a.feather"))
    feather.write_feather(b, str(tmp_path / "b.feather"))
    df = read_feather(spark, str(tmp_path))
    assert sorted(r["k"] for r in df.collect()) == [1, 2, 3, 4]
    assert dict(df.dtypes)["k"] == "bigint"


def test_write_feather_roundtrip(spark, feather_dir, tmp_path):
    df = read_feather(spark, feather_dir)
    dest = str(tmp_path / "out")
    n_files = write_feather(df.repartition(3), dest)
    assert 1 <= n_files <= 3
    back = read_feather(spark, dest)
    assert back.count() == 65
    a = sorted(r["anno_id"] for r in back.collect())
    assert a == list(range(65))
    # files are plain feather: a pyarrow consumer reads them directly
    one = sorted(os.listdir(dest))[0]
    t = feather.read_table(os.path.join(dest, one))
    assert set(t.column_names) == {"anno_id", "image_name", "score", "bbox"}


def test_feather_to_parquet_migration(spark, feather_dir, tmp_path):
    dest = str(tmp_path / "migrated")
    feather_to_parquet(spark, feather_dir, dest)
    back = spark.read.parquet(dest)
    assert back.count() == 65
    assert set(back.columns) == {"anno_id", "image_name", "score", "bbox"}
