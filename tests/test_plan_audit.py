"""Plan linter: each rule fires on a plan built to violate it and is
silent on the clean twin."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F

from ml_pipelines_spark.plans import (
    count_exchanges,
    count_scans,
    lint,
    pushed_filters,
)


def _rules(findings):
    return {f.rule for f in findings}


def test_lint_flags_cartesian(spark):
    a = spark.range(0, 10)
    b = spark.range(0, 10).select(F.col("id").alias("j"))
    assert "cartesian" in _rules(lint(a.crossJoin(b)))
    assert "cartesian" not in _rules(
        lint(a.join(b, a.id == b.j))
    )


def test_lint_flags_global_window(spark):
    from pyspark.sql.window import Window

    df = spark.range(0, 100).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("v")
    )
    bad = df.withColumn("rn", F.row_number().over(Window.orderBy("v")))
    good = df.withColumn(
        "rn", F.row_number().over(Window.partitionBy("k").orderBy("v"))
    )
    assert "global-window" in _rules(lint(bad))
    assert "global-window" not in _rules(lint(good))
    # audited dimension-sized windows can be allowed explicitly
    assert "global-window" not in _rules(
        lint(bad, max_unpartitioned_window_inputs=1)
    )


def test_lint_flags_row_at_a_time_python(spark):
    from pyspark.sql.functions import pandas_udf, udf

    df = spark.range(0, 50).select(F.col("id").alias("v"))

    @udf("long")
    def slow(v):
        return v + 1

    @pandas_udf("long")
    def fast(v: pd.Series) -> pd.Series:
        return v + 1

    assert "python-row-udf" in _rules(lint(df.select(slow("v"))))
    assert "python-row-udf" not in _rules(lint(df.select(fast("v"))))


def test_counters_and_pushdown(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q = (
        li.filter(F.col("l_quantity") < 10)
        .groupBy("l_returnflag")
        .count()
    )
    assert count_scans(q, "lineitem") == 1
    assert count_exchanges(q) == 1
    pushed = pushed_filters(q, "lineitem")
    assert pushed and "l_quantity" in pushed[0]


def test_lint_clean_on_registry_flagships(spark, sf_dir):
    # the flagship and the forced-SMJ export both lint clean (coco's
    # dictionary-sized windows are partitioned or dimension-fed)
    from ml_pipelines_spark.queries.registry import QUERIES

    assert lint(QUERIES["q1_pricing_summary"](spark, sf_dir)) == []
    assert lint(QUERIES["star_join_revenue"](spark, sf_dir)) == []


def test_skew_partition_window_rule(spark, sf_dir):
    # VERDICT r11 item 3: rank/ntile windows partitioned ONLY by a
    # dictionary-class column (lang, source, nation...) are a skew
    # funnel the global-window rule cannot see. Violating plan fires;
    # the grouped range-bucket twin (partition includes the helper
    # bucket column) and a high-cardinality partition are clean.
    from pyspark.sql.window import Window

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bad = docs.select(
        "doc_id",
        F.ntile(4)
        .over(Window.partitionBy("lang").orderBy("n_chars", "doc_id"))
        .alias("q"),
    )
    assert "skew-partition-window" in _rules(lint(bad))
    # audited-caller escape hatch mirrors max_unpartitioned_window_inputs
    assert "skew-partition-window" not in _rules(
        lint(bad, max_skew_partition_windows=1)
    )

    from ml_pipelines_spark.operators.edf import (
        _SMALL_GROUP_CONF,
        grouped_ordered_ntiles,
    )

    # above the size gate the grouped range-bucket twin is clean...
    spark.conf.set(_SMALL_GROUP_CONF, "0")
    try:
        good = grouped_ordered_ntiles(
            docs.select("doc_id", "lang", "n_chars"),
            ["lang"], ["n_chars", "doc_id"], 4, "q",
        )
    finally:
        spark.conf.unset(_SMALL_GROUP_CONF)
    assert "skew-partition-window" not in _rules(lint(good))
    # ...below it the bare per-group window is DELIBERATE (the gate
    # probe proved the bound) and fires — registered callers carry the
    # SKEW_WINDOW waiver citing the runtime gate (r13)
    small = grouped_ordered_ntiles(
        docs.select("doc_id", "lang", "n_chars"),
        ["lang"], ["n_chars", "doc_id"], 4, "q",
    )
    assert "skew-partition-window" in _rules(lint(small))

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    high_card = ev.select(
        "event_id",
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("rn"),
    )
    assert "skew-partition-window" not in _rules(lint(high_card))


def test_skew_rule_composite_key_with_fact_column_is_clean(spark, sf_dir):
    # partitioning by (dictionary key, data-sized key) is real
    # parallelism — the rule only fires when EVERY partition column is
    # dictionary-class
    from pyspark.sql.window import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    df = ev.select(
        "event_id",
        F.row_number()
        .over(
            Window.partitionBy("event_type", "user_id").orderBy("ts")
        )
        .alias("rn"),
    )
    assert "skew-partition-window" not in _rules(lint(df))


def test_duplicate_scan_rule_fires_and_clean_twin_passes(spark, sf_dir):
    # VERDICT r12 item 6: the shared-lineage re-execution smell. The
    # violating shape — one lazy frame consumed by two sinks — repeats
    # an identical parquet scan in the plan; the clean twin (different
    # column sets per branch) and the cached twin (swap_cache-style
    # persist) must both pass.
    from ml_pipelines_spark.plans.audit import duplicate_scan_fingerprints

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    shared = ev.select("user_id", "value").filter(F.col("value") > 0)
    violating = shared.groupBy("user_id").count().join(
        shared.groupBy("user_id").agg(F.sum("value").alias("s")),
        "user_id",
    )
    dups = duplicate_scan_fingerprints(violating)
    assert dups and all(n >= 2 for n in dups.values()), dups

    # clean twin: the two branches scan DIFFERENT column sets — two
    # column-pruned scans, deliberately not flagged
    a = ev.select("user_id").groupBy("user_id").count()
    b = ev.select("event_id", "value").groupBy("event_id").agg(
        F.sum("value").alias("s")
    )
    assert duplicate_scan_fingerprints(a.crossJoin(b.limit(1))) == {}

    # cached twin: a persisted shared frame prints its build lineage
    # per consumer but executes once — not flagged
    cached = shared.persist()
    try:
        cached.count()
        joined = cached.groupBy("user_id").count().join(
            cached.groupBy("user_id").agg(F.sum("value").alias("s")),
            "user_id",
        )
        assert duplicate_scan_fingerprints(joined) == {}
    finally:
        cached.unpersist()
