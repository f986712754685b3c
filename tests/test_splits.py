"""Property tests for the split module — the reference's leakage
invariant (TrainDatasets.py:149-150): the split unit is the entity key,
never the row; no entity appears in two splits; every row is assigned."""

from __future__ import annotations

from pyspark.sql import functions as F

from ml_pipelines_spark.operators.splits import (
    hash_split,
    nested_entity_split,
    shuffle_split,
)
from ml_pipelines_spark.queries.relational import t


def test_hash_split_leakage_and_coverage(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    tagged = hash_split(orders, "o_custkey", {"train": 0.8, "val": 0.1, "test": 0.1})
    # Every row assigned exactly one label.
    assert tagged.filter(F.col("split").isNull()).count() == 0
    assert tagged.count() == orders.count()
    # No key in two splits.
    leaked = (
        tagged.select("o_custkey", "split")
        .distinct()
        .groupBy("o_custkey")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert leaked == 0
    # Fractions roughly honored (keys, not rows).
    by_split = dict(
        tagged.select("o_custkey", "split")
        .distinct()
        .groupBy("split")
        .count()
        .collect()
    )
    total = sum(by_split.values())
    assert abs(by_split.get("train", 0) / total - 0.8) < 0.06
    # Deterministic across invocations.
    again = hash_split(orders, "o_custkey", {"train": 0.8, "val": 0.1, "test": 0.1})
    assert (
        tagged.select("o_custkey", "split")
        .exceptAll(again.select("o_custkey", "split"))
        .count()
        == 0
    )


def test_nested_entity_split_partitions_rows(spark, sf_dir):
    orders = t(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "c_custkey")
    cust = t(spark, sf_dir, "customer")
    splits = nested_entity_split(orders, cust, "c_custkey", p=0.2, test_split=True, seed=7)
    n_total = orders.count()
    n_assigned = sum(df.count() for df in splits.values())
    assert n_assigned == n_total
    # Leakage: pairwise key-set intersections empty.
    keysets = {k: df.select("c_custkey").distinct() for k, df in splits.items()}
    names = list(keysets)
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            assert keysets[names[i]].intersect(keysets[names[j]]).count() == 0


def test_shuffle_split_disjoint_and_complete(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    rest, sampled = shuffle_split(cust, "c_custkey", p=0.3, seed=11)
    n = cust.select("c_custkey").distinct().count()
    assert rest.count() + sampled.count() == n
    assert rest.intersect(sampled).count() == 0
    # Seeded: same seed, same result.
    rest2, sampled2 = shuffle_split(cust, "c_custkey", p=0.3, seed=11)
    assert sampled.exceptAll(sampled2).count() == 0


def test_stratified_hash_sample(spark):
    from ml_pipelines_spark.operators.splits import stratified_hash_sample

    rows = [(i, "en" if i % 3 == 0 else ("de" if i % 3 == 1 else "zh"))
            for i in range(600)]
    df = spark.createDataFrame(rows, "k long, lang string")
    out = stratified_hash_sample(
        df, "k", "lang", {"en": 1.0, "de": 0.5}, salt="t"
    ).collect()
    langs = {r["lang"] for r in out}
    # unlisted stratum dropped entirely; fraction-1.0 stratum kept whole
    assert "zh" not in langs
    n_en = sum(1 for r in out if r["lang"] == "en")
    assert n_en == 200
    n_de = sum(1 for r in out if r["lang"] == "de")
    assert 60 <= n_de <= 140  # ~100 expected at p=0.5
    # deterministic: identical on rerun
    again = stratified_hash_sample(
        df, "k", "lang", {"en": 1.0, "de": 0.5}, salt="t"
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_stratified_hash_sample_rejects_bad_fraction(spark):
    import pytest as _pytest

    from ml_pipelines_spark.operators.splits import stratified_hash_sample

    df = spark.createDataFrame([(1, "en")], "k long, lang string")
    with _pytest.raises(ValueError, match="not in"):
        stratified_hash_sample(df, "k", "lang", {"en": 1.5})


def test_approx_distinct_within_tolerance(spark, sf_dir):
    # The tolerance check is encoded IN the query output now (the oracle
    # contract): approx_within_5pct must be True for every event_type.
    from ml_pipelines_spark.queries.registry import QUERIES

    rows = QUERIES["approx_distinct_users"](spark, sf_dir).collect()
    ev = t(spark, sf_dir, "events")
    n_types = ev.select("event_type").distinct().count()
    assert len(rows) == n_types
    for r in rows:
        assert r["approx_within_5pct"] is True, r
        assert r["n_events"] > 0


def test_weighted_sample_bias_and_partition_invariance(spark):
    from pyspark.sql import functions as F

    from ml_pipelines_spark.operators.splits import weighted_sample_topk

    # 1000 light items (w=1) + 1000 heavy items (w=100): a
    # weight-proportional sample of 100 must be dominated by heavy items
    df = spark.range(0, 2000).select(
        F.col("id"),
        F.when(F.col("id") < 1000, F.lit(1.0)).otherwise(F.lit(100.0)).alias("w"),
    )
    got = weighted_sample_topk(df, "id", "w", k=100).collect()
    heavy = sum(1 for r in got if r["id"] >= 1000)
    assert heavy >= 80, heavy

    # determinism under repartitioning: md5 keys are row-local, so the
    # selected set must not depend on physical layout
    a = {r["id"] for r in got}
    b = {
        r["id"]
        for r in weighted_sample_topk(df.repartition(17), "id", "w", k=100).collect()
    }
    assert a == b


def test_temporal_cv_embargo_gap(spark, sf_dir):
    # The defining property: for every fold, the training window's last
    # event is at least the 1-day embargo BEFORE the validation
    # window's first admissible instant (no temporal adjacency leak),
    # and folds are expanding (train counts non-decreasing).
    import datetime

    from ml_pipelines_spark.queries.splits import _TCV_CUTS, temporal_cv_folds

    rows = {
        (r.fold, r.role): r for r in temporal_cv_folds(spark, sf_dir).collect()
    }
    prev_train = 0
    for k, cut in enumerate(_TCV_CUTS, start=1):
        cut_dt = datetime.datetime.strptime(cut, "%Y-%m-%d %H:%M:%S")
        tr, va = rows[(k, "train")], rows[(k, "valid")]
        last_train = datetime.datetime.strptime(
            tr.last_ts, "%Y-%m-%d %H:%M:%S"
        )
        first_valid = datetime.datetime.strptime(
            va.first_ts, "%Y-%m-%d %H:%M:%S"
        )
        assert last_train < cut_dt - datetime.timedelta(days=1) + datetime.timedelta(seconds=1)
        assert first_valid >= cut_dt
        assert tr.n_events >= prev_train
        prev_train = tr.n_events
