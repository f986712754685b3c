"""Portable-sketch properties: accuracy bands and — the property that
makes these the distributed shapes — mergeability of partial sketches."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_hll_estimate_within_band(spark, sf_dir):
    from ml_pipelines_spark.queries.sketches import portable_hll_users

    rows = portable_hll_users(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # 256-register HLL at these cardinalities sits in the
        # linear-counting regime; 15% is a loose band over its ~2% rse
        assert abs(r["hll_est"] - r["exact_users"]) <= max(
            0.15 * r["exact_users"], 3.0
        ), r


def test_hll_registers_merge_by_max(spark, sf_dir):
    # Partial HLLs from disjoint partitions must merge into exactly the
    # whole-data sketch: register_j = max(part1_j, part2_j). This is the
    # re-aggregation property a 1000-executor distinct count relies on.
    from ml_pipelines_spark.queries.relational import t

    ev = t(spark, sf_dir, "events")
    h = F.md5(F.col("user_id").cast("string"))
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("long")
    w = F.conv(F.substring(h, 3, 15), 16, 10).cast("long")
    rho = F.when(w == 0, F.lit(61)).otherwise(61 - F.length(F.bin(w)))

    def regs(df):
        return (
            df.select(bucket.alias("bucket"), rho.alias("rho"))
            .groupBy("bucket")
            .agg(F.max("rho").alias("m_j"))
        )

    whole = {r["bucket"]: r["m_j"] for r in regs(ev).collect()}
    p1 = {r["bucket"]: r["m_j"] for r in regs(ev.filter("event_id % 2 = 0")).collect()}
    p2 = {r["bucket"]: r["m_j"] for r in regs(ev.filter("event_id % 2 = 1")).collect()}
    merged = {
        b: max(p1.get(b, 0), p2.get(b, 0)) for b in set(p1) | set(p2)
    }
    assert merged == whole


def test_bench_only_sketch_contract(spark, sf_dir):
    """approx_distinct_users_sketch is bench-only (VERDICT r10 item 3):
    the driver never samples it, so THIS test is its checkable contract
    — rows + schema + n_events pinned against the registered invariant
    twin, estimate pinned within the twin's ±5% tolerance of exact."""
    from ml_pipelines_spark.queries.registry import BENCH_ONLY, QUERIES
    from ml_pipelines_spark.queries.relational import (
        approx_distinct_users_sketch,
        t,
    )

    # registry hygiene: bench-only means NOT driver-sampleable
    assert "approx_distinct_users_sketch" in BENCH_ONLY
    assert "approx_distinct_users_sketch" not in QUERIES

    out = approx_distinct_users_sketch(spark, sf_dir)
    assert [f.name for f in out.schema.fields] == [
        "event_type", "n_events", "approx_users",
    ]
    got = {r["event_type"]: r for r in out.collect()}

    ev = t(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for et, r in got.items():
        assert r["n_events"] == exact[et]["n_events"]
        e = exact[et]["exact_users"]
        assert abs(r["approx_users"] - e) <= 0.05 * e, (et, r, e)


def test_count_min_one_sided_and_additive(spark, sf_dir):
    from ml_pipelines_spark.queries.relational import t
    from ml_pipelines_spark.queries.sketches import count_min_user_freq

    rows = count_min_user_freq(spark, sf_dir).collect()
    assert rows
    # the classic CMS guarantee: never underestimates
    assert all(r["overestimates"] for r in rows)
    assert all(r["cms_est"] >= r["exact_n"] for r in rows)

    # counters are additive: sketch(part1) + sketch(part2) == sketch(all)
    ev = t(spark, sf_dir, "events")

    def cms(df):
        pos = (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("user_id").cast("string"),
                                   F.lit("cm"), F.col("i").cast("string"))),
                    1, 4,
                ), 16, 10,
            ).cast("long") % 256
        )
        return {
            (r["i"], r["pos"]): r["c"]
            for r in df.select(
                "user_id",
                F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("i"),
            )
            .select("i", pos.alias("pos"))
            .groupBy("i", "pos")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }

    whole = cms(ev)
    p1 = cms(ev.filter("event_id % 2 = 0"))
    p2 = cms(ev.filter("event_id % 2 = 1"))
    merged: dict = {}
    for d in (p1, p2):
        for k, v in d.items():
            merged[k] = merged.get(k, 0) + v
    assert merged == whole
