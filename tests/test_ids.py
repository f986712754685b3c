"""dense_ids property tests (operators/ids.py).

The failure mode that motivates these: a partition-index-based
implementation produced correct ids when the consumer pruned to the id
column (exchange reuse made both branches agree) and corrupted them when
the consumer kept all columns (non-canonical exchanges, independent range
sampling). So every check here consumes the FULL row, not just the id.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ml_pipelines_spark.operators.ids import dense_ids


def _df(spark, n=5000, parts=7):
    return (
        spark.range(n)
        .repartition(parts)
        .select(
            (F.col("id") % 97).alias("grp"),
            (F.col("id") * 2654435761 % 1000).alias("sub"),
            F.col("id").alias("payload"),
        )
    )


def test_ids_dense_and_ordered(spark):
    df = _df(spark)
    out = dense_ids(df, ["grp", "sub", "payload"], id_col="rid")
    rows = out.collect()  # full rows — exercises the no-pruning path
    ids = sorted(r["rid"] for r in rows)
    assert ids == list(range(len(rows)))
    by_id = sorted(rows, key=lambda r: r["rid"])
    keys = [(r["grp"], r["sub"], r["payload"]) for r in by_id]
    assert keys == sorted(keys)


def test_ids_match_global_window(spark):
    df = _df(spark, n=2000)
    oc = ["grp", "sub", "payload"]
    out = {
        (r["grp"], r["sub"], r["payload"]): r["rid"]
        for r in dense_ids(df, oc, id_col="rid").collect()
    }
    w = Window.orderBy(*oc)
    ref = {
        (r["grp"], r["sub"], r["payload"]): r["rid"]
        for r in df.withColumn(
            "rid", F.row_number().over(w) - 1
        ).collect()
    }
    assert out == ref


def test_ids_start_offset_and_tiny_input(spark):
    df = spark.range(3).select(F.col("id").alias("k"))
    rows = dense_ids(df, ["k"], id_col="rid", start=10).collect()
    assert sorted((r["k"], r["rid"]) for r in rows) == [
        (0, 10),
        (1, 11),
        (2, 12),
    ]


def test_ids_with_duplicate_keys_stay_dense(spark):
    df = spark.range(1000).select((F.col("id") % 5).alias("k"))
    ids = sorted(
        r["rid"] for r in dense_ids(df, ["k"], id_col="rid").collect()
    )
    assert ids == list(range(1000))
