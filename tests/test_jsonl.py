"""JSONL reader: valid/quarantine split, round-trip, schema guard."""

from __future__ import annotations

import pytest

from pyspark.sql.types import LongType, StringType, StructField, StructType

from ml_pipelines_spark.sources.jsonl import read_jsonl, write_jsonl

SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ]
)


def test_read_jsonl_splits_corrupt_lines(spark, tmp_path):
    p = tmp_path / "corpus.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "good"}\n'
        '{"doc_id": 2, "text": "also good"}\n'
        "this is not json\n"
        '{"doc_id": "three", "text": "bad type"}\n'
        '{"doc_id": 4, "text": "fine"}\n'
    )
    valid, quarantine = read_jsonl(spark, str(p), SCHEMA)
    ids = sorted(r["doc_id"] for r in valid.collect())
    assert ids == [1, 2, 4]
    assert valid.columns == ["doc_id", "text"]
    bad = [r["raw_line"] for r in quarantine.collect()]
    assert len(bad) == 2
    assert any("not json" in b for b in bad)
    assert any("three" in b for b in bad)


def test_read_jsonl_rejects_corrupt_col_in_schema(spark):
    s = StructType([StructField("_corrupt_record", StringType())])
    with pytest.raises(ValueError):
        read_jsonl(spark, "/nonexistent", s)


def test_jsonl_round_trip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None)], "doc_id long, text string"
    )
    out = str(tmp_path / "out")
    write_jsonl(df, out)
    valid, quarantine = read_jsonl(spark, out, SCHEMA)
    assert quarantine.count() == 0
    got = {r["doc_id"]: r["text"] for r in valid.collect()}
    assert got == {1: "a", 2: "b", 3: None}


# ---------------------------------------------------------------------------
# CSV quarantine twin (sources/csvsrc.py)
# ---------------------------------------------------------------------------


def test_read_csv_audited_splits_valid_and_quarantine(spark, tmp_path):
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from ml_pipelines_spark.sources.csvsrc import read_csv_audited

    p = tmp_path / "in.csv"
    p.write_text(
        "id,name,score\n"          # header
        "1,alice,0.5\n"            # ok
        "2,bob,not_a_number\n"     # type garbage -> quarantine
        "3,carol,0.25\n"           # ok
        "4,dave\n"                 # wrong arity -> quarantine
        "5,eve,1.0\n"              # ok
    )
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("name", StringType()),
            StructField("score", DoubleType()),
        ]
    )
    valid, quarantine = read_csv_audited(
        spark, str(p), schema, header=True
    )
    got = {(r.id, r.name, r.score) for r in valid.collect()}
    assert got == {(1, "alice", 0.5), (3, "carol", 0.25), (5, "eve", 1.0)}
    bad = sorted(r.raw_line for r in quarantine.collect())
    assert bad == ["2,bob,not_a_number", "4,dave"]
    assert valid.columns == ["id", "name", "score"]


def test_read_csv_audited_rejects_corrupt_column_in_schema(spark):
    import pytest
    from pyspark.sql.types import StringType, StructField, StructType

    from ml_pipelines_spark.sources.csvsrc import read_csv_audited

    with pytest.raises(ValueError, match="_corrupt_record"):
        read_csv_audited(
            spark,
            "/nonexistent",
            StructType([StructField("_corrupt_record", StringType())]),
        )


def test_read_csv_audited_drops_one_header_per_file_only(spark, tmp_path):
    """With an all-string schema a data row can equal the header line;
    exactly ONE header-matching line is dropped per file, so that row
    parses as data instead of vanishing from both outputs — and a
    second file keeps its own header handling independent."""
    from pyspark.sql.types import StringType, StructField, StructType

    from ml_pipelines_spark.sources.csvsrc import read_csv_audited

    d = tmp_path / "csvs"
    d.mkdir()
    (d / "a.csv").write_text(
        "a,b\n"      # header
        "x,y\n"      # ok
        "a,b\n"      # DATA row identical to the header -> must survive
        "z,w\n"      # ok
    )
    (d / "b.csv").write_text(
        "a,b\n"      # header
        "p,q\n"      # ok
    )
    schema = StructType(
        [StructField("a", StringType()), StructField("b", StringType())]
    )
    valid, quarantine = read_csv_audited(
        spark, str(d), schema, header=True
    )
    got = sorted((r.a, r.b) for r in valid.collect())
    assert got == [("a", "b"), ("p", "q"), ("x", "y"), ("z", "w")]
    assert quarantine.count() == 0
