"""Incremental maintenance (operators.incremental): N incremental steps
must equal the single-shot computation over all data."""

from __future__ import annotations

from pyspark.sql import functions as F

from ml_pipelines_spark.operators.incremental import (
    _rollup,
    dedup_against_index,
    incremental_rollup,
    init_fingerprint_index,
    init_rollup,
    read_rollup,
)
from ml_pipelines_spark.queries.relational import t

SF = "/root/testdata/sf0.001"


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_incremental_rollup_equals_full(spark, tmp_path):
    path = str(tmp_path / "rollup")
    events = t(spark, SF, "events")
    cut1 = F.expr("percentile(cast(ts as double), 0.5)")
    # three slices by event_id (stable, disjoint, covers all rows)
    s1 = events.filter(F.col("event_id") % 3 == 0)
    s2 = events.filter(F.col("event_id") % 3 == 1)
    s3 = events.filter(F.col("event_id") % 3 == 2)

    init_rollup(s1, path)
    incremental_rollup(spark, path, s2)
    incremental_rollup(spark, path, s3)

    cols = ["event_date", "event_type", "n_events", "sum_value"]
    got = _rows(
        read_rollup(spark, path).withColumn(
            "sum_value", F.round("sum_value", 6)
        ),
        cols,
    )
    want = _rows(
        _rollup(events).withColumn("sum_value", F.round("sum_value", 6)), cols
    )
    assert got == want


def test_incremental_rollup_overlapping_keys(spark, tmp_path):
    # same dates/types in both batches — counts must ADD, not replace
    path = str(tmp_path / "r2")
    events = t(spark, SF, "events")
    s1 = events.filter(F.col("event_id") % 2 == 0)
    s2 = events.filter(F.col("event_id") % 2 == 1)
    init_rollup(s1, path)
    incremental_rollup(spark, path, s2)
    total = read_rollup(spark, path).agg(F.sum("n_events")).first()[0]
    assert total == events.count()


def test_dedup_against_index_first_wins(spark, tmp_path):
    idx = str(tmp_path / "fpidx")
    init_fingerprint_index(spark, idx)
    docs = t(spark, SF, "documents").limit(200)

    b1 = docs.filter(F.col("doc_id") < 100)
    b2 = docs  # overlaps b1 entirely, plus new rows
    a1 = dedup_against_index(spark, idx, b1)
    a2 = dedup_against_index(spark, idx, b2)

    n1, n2 = a1.count(), a2.count()
    assert n1 > 0 and n2 > 0
    # no fingerprint admitted twice across batches
    from ml_pipelines_spark.functions.text import fingerprint

    all_admitted = a1.unionByName(a2).withColumn("fp", fingerprint(F.col("text")))
    assert (
        all_admitted.select("fp").distinct().count() == all_admitted.count()
    )
    # same distinct-fingerprint total as a global single-shot dedup
    global_distinct = (
        docs.withColumn("fp", fingerprint(F.col("text")))
        .select("fp")
        .distinct()
        .count()
    )
    assert n1 + n2 == global_distinct


def test_dedup_against_index_idempotent_batch(spark, tmp_path):
    idx = str(tmp_path / "fpidx2")
    init_fingerprint_index(spark, idx)
    docs = t(spark, SF, "documents").limit(50)
    a1 = dedup_against_index(spark, idx, docs)
    a2 = dedup_against_index(spark, idx, docs)  # replay the same batch
    assert a1.count() > 0
    assert a2.count() == 0


def test_join_view_delta_union_equals_full_recompute(spark):
    # The IVM invariant: V_old ∪ ΔV == (A_old∪ΔA) ⨝ (B_old∪ΔB), as a
    # row multiset, with the three delta terms disjoint.
    import collections

    import pyspark.sql.functions as F

    from ml_pipelines_spark.operators.incremental import join_view_delta

    a = spark.range(0, 400).select(
        (F.col("id") % 37).alias("k"), F.col("id").alias("av")
    )
    b = spark.range(0, 120).select(
        (F.col("id") % 37).alias("k"), (F.col("id") * 10).alias("bv")
    )
    a_old, delta_a = a.filter("av % 3 != 0"), a.filter("av % 3 = 0")
    b_old, delta_b = b.filter("bv % 40 != 0"), b.filter("bv % 40 = 0")
    v_old = a_old.join(b_old, "k").select("k", "av", "bv")
    dv = join_view_delta(a_old, delta_a, b_old, delta_b, "k")
    got = collections.Counter(
        (r.k, r.av, r.bv)
        for r in v_old.unionByName(
            dv.select("k", "av", "bv")
        ).collect()
    )
    want = collections.Counter(
        (r.k, r.av, r.bv) for r in a.join(b, "k").collect()
    )
    assert got == want
    # term disjointness: every delta row appears exactly once
    n_delta = dv.count()
    assert n_delta == sum(want.values()) - sum(
        collections.Counter(
            (r.k, r.av, r.bv) for r in v_old.collect()
        ).values()
    )
