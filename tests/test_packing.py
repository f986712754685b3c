"""Sequence packing (operators.packing).

Properties that define the operator:
- every document is packed exactly once (both variants);
- segment_pack: bins are contiguous runs in group order, and every bin
  except possibly its last document stays under budget (overflow by at
  most one document);
- pack_first_fit: NO bin exceeds the budget unless a single oversized
  document occupies it alone.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ml_pipelines_spark.operators.packing import pack_first_fit, segment_pack


def _docs(spark):
    # token counts spanning tiny to over-budget
    rows = [(i, (i * 37) % 700 + 1) for i in range(500)]
    rows += [(1000 + i, 2500) for i in range(3)]  # oversized singletons
    return spark.createDataFrame(rows, ["doc_id", "n_tokens"])


def test_segment_pack_every_doc_once(spark):
    df = _docs(spark)
    packed = segment_pack(df, "n_tokens", ["doc_id"], budget=2048, num_groups=4)
    assert packed.count() == df.count()
    assert packed.select("doc_id").distinct().count() == df.count()


def test_segment_pack_bins_start_under_budget(spark):
    packed = segment_pack(
        _docs(spark), "n_tokens", ["doc_id"], budget=2048, num_groups=4
    )
    fills = packed.groupBy("bin_id").agg(
        F.sum("n_tokens").alias("fill"),
        F.max("n_tokens").alias("biggest"),
    )
    # removing the largest doc of a bin always lands under budget:
    # overflow is bounded by one document.
    bad = fills.filter(F.col("fill") - F.col("biggest") >= 2048).count()
    assert bad == 0


def test_first_fit_capacity_guarantee(spark):
    df = _docs(spark)
    packed = pack_first_fit(df, "n_tokens", "doc_id", budget=2048, num_groups=4)
    assert packed.count() == df.count()
    fills = packed.groupBy("bin_id").agg(
        F.sum("n_tokens").alias("fill"), F.count("*").alias("n")
    )
    # over-budget bins must be singletons (one oversized doc)
    assert fills.filter((F.col("fill") > 2048) & (F.col("n") > 1)).count() == 0
    # the oversized docs exist, so some singleton over-budget bin does too
    assert fills.filter(F.col("fill") > 2048).count() == 3


def test_first_fit_deterministic(spark):
    df = _docs(spark)
    a = pack_first_fit(df, "n_tokens", "doc_id", budget=2048, num_groups=4)
    b = pack_first_fit(df, "n_tokens", "doc_id", budget=2048, num_groups=4)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_first_fit_fill_quality(spark):
    # First-fit invariant: no two bins in a group can both be <= half
    # full (the later bin's docs would have fit in the earlier one).
    df = _docs(spark)
    packed = pack_first_fit(df, "n_tokens", "doc_id", budget=2048, num_groups=4)
    half_empty_per_group = (
        packed.groupBy("bin_id")
        .agg(F.sum("n_tokens").alias("fill"))
        .filter(F.col("fill") <= 1024)
        .select((F.col("bin_id") / (1 << 40)).cast("int").alias("grp"))
        .groupBy("grp")
        .count()
    )
    assert half_empty_per_group.filter(F.col("count") > 1).count() == 0


def test_length_bucket_batches_shape(spark):
    from pyspark.sql import functions as F

    from ml_pipelines_spark.operators.packing import length_bucket_batches

    df = spark.createDataFrame(
        [(i, (i * 37) % 100 + 1) for i in range(500)], "doc_id long, n long"
    )
    out = length_bucket_batches(df, "n", "doc_id", batch_size=16, num_groups=4)
    # every doc assigned exactly once
    assert out.count() == 500
    assert out.select("doc_id").distinct().count() == 500
    rows = out.groupBy("batch_id").agg(
        F.count(F.lit(1)).alias("sz"),
        F.min("n").alias("lo"),
        F.max("n").alias("hi"),
    ).collect()
    # full batches hold exactly batch_size; at most one ragged tail per group
    ragged = {}
    for r in rows:
        grp = r["batch_id"] >> 40
        if r["sz"] != 16:
            assert r["sz"] < 16
            assert grp not in ragged
            ragged[grp] = True
    # within a group, batches are length-ordered: sort batches by their
    # local index and check lo/hi are non-decreasing across consecutive ones
    by_grp = {}
    for r in rows:
        by_grp.setdefault(r["batch_id"] >> 40, []).append(r)
    for grp, rs in by_grp.items():
        rs.sort(key=lambda r: r["batch_id"] & ((1 << 40) - 1))
        for a, b in zip(rs, rs[1:]):
            # row_number over (len, id) guarantees every doc in batch k+1
            # is at least as long as every doc in batch k (ties included)
            assert a["hi"] <= b["lo"]
