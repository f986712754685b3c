"""ordered_cumsum / ks_two_sample vs serial references."""

from __future__ import annotations

import random

import pytest

from ml_pipelines_spark.operators.edf import ks_two_sample, ordered_cumsum


@pytest.mark.parametrize("seed", [1, 2, 5])
def test_ordered_cumsum_matches_serial(spark, seed):
    rng = random.Random(seed)
    vals = rng.sample(range(100000), 500)
    rows = [(v, rng.randrange(1, 9), rng.randrange(0, 5)) for v in vals]
    df = spark.createDataFrame(rows, ["v", "a", "b"])
    out = {
        r.v: (r.cum_a, r.cum_b)
        for r in ordered_cumsum(df, "v", ["a", "b"], num_partitions=8).collect()
    }
    ca = cb = 0
    for v, a, b in sorted(rows):
        ca += a
        cb += b
        assert out[v] == (ca, cb), v
    assert len(out) == len(rows)


@pytest.mark.parametrize("seed", [3, 11])
def test_ks_two_sample_matches_bruteforce(spark, seed):
    rng = random.Random(seed)
    # two overlapping discrete distributions with heavy ties
    sample_a = [rng.randrange(0, 40) for _ in range(400)]
    sample_b = [min(39, rng.randrange(0, 40) + rng.randrange(0, 4)) for _ in range(300)]
    rows = [(v, 1) for v in sample_a] + [(v, 0) for v in sample_b]
    df = spark.createDataFrame(rows, ["v", "f"])
    got = ks_two_sample(df, "v", "f").collect()[0]
    # serial KS over the pooled distinct values
    n_a, n_b = len(sample_a), len(sample_b)
    best = 0
    for v in sorted(set(sample_a) | set(sample_b)):
        ca = sum(1 for x in sample_a if x <= v)
        cb = sum(1 for x in sample_b if x <= v)
        best = max(best, abs(ca * n_b - cb * n_a))
    assert (got.n_a, got.n_b, got.d_num) == (n_a, n_b, best)
    assert abs(got.d_stat - best / (n_a * n_b)) <= 5e-7 + 1e-12


def test_ks_identical_samples_is_zero(spark):
    rows = [(v, f) for v in range(50) for f in (0, 1)]
    df = spark.createDataFrame(rows, ["v", "f"])
    got = ks_two_sample(df, "v", "f").collect()[0]
    assert got.d_num == 0 and got.d_stat == 0.0


def test_mannwhitney_matches_serial_midranks(spark, sf_dir):
    # Replay the doubled-rank-sum arithmetic serially from the raw
    # values and require exact equality of the integer statistics.
    import pyspark.sql.functions as F

    from ml_pipelines_spark.queries.stats import mannwhitney_segments
    from ml_pipelines_spark.queries.relational import t

    got = mannwhitney_segments(spark, sf_dir).collect()[0]
    cust = t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("AUTOMOBILE", "HOUSEHOLD")
    )
    rows = (
        t(spark, sf_dir, "orders")
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .select(
            F.floor(F.col("o_totalprice") * 100.0 + 0.5)
            .cast("long")
            .alias("v"),
            (F.col("c_mktsegment") == "AUTOMOBILE").alias("is_a"),
        )
        .collect()
    )
    vals = sorted(r.v for r in rows)
    # midrank per value: first_index + (count+1)/2, doubled to stay int
    import collections

    first = {}
    cnt = collections.Counter(vals)
    i = 1
    for v in sorted(cnt):
        first[v] = i
        i += cnt[v]
    two_r1 = sum(
        2 * (first[r.v] - 1) + cnt[r.v] + 1 for r in rows if r.is_a
    )
    n_a = sum(1 for r in rows if r.is_a)
    assert (got.n_a, got.two_u1) == (n_a, two_r1 - n_a * (n_a + 1))


@pytest.mark.parametrize("seed,n_rows,n", [(7, 137, 5), (9, 4, 5), (13, 500, 7)])
def test_ordered_ntile_matches_serial_ntile(spark, seed, n_rows, n):
    # exact SQL NTILE semantics: sizes differ by at most 1, larger
    # buckets first, over a composite total order with heavy ties on
    # the leading key (the skew case a per-value partition would lose)
    from ml_pipelines_spark.operators.edf import ordered_ntile

    rng = random.Random(seed)
    rows = [(rng.randrange(0, 6), i) for i in range(n_rows)]
    df = spark.createDataFrame(rows, ["k", "uid"])
    got = {
        r.uid: r.tile
        for r in ordered_ntile(
            df, ["k", "uid"], n, "tile", num_partitions=8
        ).collect()
    }
    order = sorted(rows)
    q, rem = divmod(n_rows, n)
    serial = {}
    r = 0
    for b in range(1, n + 1):
        size = q + 1 if b <= rem else q
        for _ in range(size):
            if r < n_rows:
                serial[order[r][1]] = b
                r += 1
    assert got == serial


def test_ordered_ntile_no_global_window(spark):
    from ml_pipelines_spark.operators.edf import ordered_ntile
    from ml_pipelines_spark.plans.audit import lint

    df = spark.range(1000).selectExpr("id % 37 AS k", "id AS uid")
    out = ordered_ntile(df, ["k", "uid"], 5, "tile", num_partitions=8)
    # zero unpartitioned Window nodes, no cartesian, no python UDF —
    # the whole point of the driver-cumulated offsets
    assert lint(out) == []


@pytest.fixture(params=["small", "big"])
def edf_gate(spark, request):
    """Run a test under BOTH sides of the grouped-* size gate: the
    default small path (bare per-group window behind the gate probe)
    and the bucket path forced by a zero-row gate. Values must be
    identical either way — the gate may only change the plan."""
    from ml_pipelines_spark.operators.edf import _SMALL_GROUP_CONF

    if request.param == "big":
        spark.conf.set(_SMALL_GROUP_CONF, "0")
    try:
        yield request.param
    finally:
        spark.conf.unset(_SMALL_GROUP_CONF)


@pytest.mark.parametrize(
    "seed,n_rows,n", [(7, 211, 4), (9, 9, 4), (13, 400, 7)]
)
def test_grouped_ordered_ntiles_matches_serial(spark, edf_gate, seed, n_rows, n):
    # exact NTILE(n) OVER (PARTITION BY g ORDER BY k, uid) on a SKEWED
    # group key (one group holds ~70% of rows), a null group, and a
    # tiny group with fewer rows than n
    from ml_pipelines_spark.operators.edf import grouped_ordered_ntiles

    rng = random.Random(seed)
    rows = []
    for i in range(n_rows):
        r = rng.random()
        g = "big" if r < 0.7 else ("mid" if r < 0.9 else None)
        rows.append((g, rng.randrange(0, 8), i))
    rows += [("tiny", 0, n_rows), ("tiny", 1, n_rows + 1)]
    df = spark.createDataFrame(rows, ["g", "k", "uid"])
    got = {
        r.uid: r.tile
        for r in grouped_ordered_ntiles(
            df, ["g"], ["k", "uid"], n, "tile", num_partitions=8
        ).collect()
    }
    serial = {}
    for g in {"big", "mid", "tiny", None}:
        grp = sorted((k, uid) for gg, k, uid in rows if gg == g)
        q, rem = divmod(len(grp), n)
        r = 0
        for b in range(1, n + 1):
            size = q + 1 if b <= rem else q
            for _ in range(size):
                if r < len(grp):
                    serial[grp[r][1]] = b
                    r += 1
    assert got == serial
    assert len(got) == len(rows)


def test_grouped_ordered_ntiles_plan_is_skew_free(spark):
    # no unpartitioned window, no cartesian, no per-group single-task
    # funnel: every Window node partitions by (group, range-bucket)
    from ml_pipelines_spark.operators.edf import (
        _SMALL_GROUP_CONF,
        grouped_ordered_ntiles,
    )
    from ml_pipelines_spark.plans.audit import lint, plan_text

    df = spark.range(2000).selectExpr(
        "CAST(id % 3 AS STRING) AS g", "id % 97 AS k", "id AS uid"
    )
    spark.conf.set(_SMALL_GROUP_CONF, "0")  # force the bucket path
    try:
        out = grouped_ordered_ntiles(df, ["g"], ["k", "uid"], 4, "tile",
                                     num_partitions=8)
    finally:
        spark.conf.unset(_SMALL_GROUP_CONF)
    assert lint(out) == []
    # the window partition key includes the helper bucket column
    text = plan_text(out)
    assert "__gb" in text


def test_grouped_size_gate_small_path_skips_probes(spark):
    # Below the gate (VERDICT r12 item 2) the grouped-* operators must
    # not pay the bucket machinery: no cut-point sample, no cell
    # collect, no offset-lookup broadcast join — the plan is the bare
    # per-group window keyed on (group, constant bucket), and the only
    # probe is ONE dictionary-sized groupBy count. Above the gate the
    # lookup join must be back.
    from ml_pipelines_spark.operators.edf import (
        _SMALL_GROUP_CONF,
        grouped_ordered_rank,
    )
    from ml_pipelines_spark.plans.audit import lint, plan_text

    df = spark.range(2000).selectExpr(
        "CAST(id % 3 AS STRING) AS g", "id % 97 AS k", "id AS uid"
    )
    small = grouped_ordered_rank(df, ["g"], ["k", "uid"], "rk")
    small_text = plan_text(small)
    assert "__lgb" not in small_text, "small path must not build the lookup"
    assert small_text.count("Exchange hashpartitioning") == 1
    assert lint(small) == []
    spark.conf.set(_SMALL_GROUP_CONF, "0")
    try:
        big = grouped_ordered_rank(df, ["g"], ["k", "uid"], "rk")
    finally:
        spark.conf.unset(_SMALL_GROUP_CONF)
    assert "__lgb" in plan_text(big), "bucket path must keep the lookup"
    # identical values either way — the gate only changes the plan
    assert sorted(map(tuple, small.collect())) == sorted(
        map(tuple, big.collect())
    )


def test_grouped_cumsum_matches_serial_both_paths(spark, edf_gate):
    from ml_pipelines_spark.operators.edf import grouped_ordered_cumsum

    rng = random.Random(17)
    rows = [
        ("big" if rng.random() < 0.8 else None, i, rng.randrange(1, 9))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, ["g", "uid", "c"])
    got = {
        r.uid: r.cum_c
        for r in grouped_ordered_cumsum(
            df, ["g"], ["uid"], ["c"], num_partitions=8
        ).collect()
    }
    running: dict = {}
    serial = {}
    for g, uid, c in sorted(rows, key=lambda t: t[1]):
        running[g] = running.get(g, 0) + c
        serial[uid] = running[g]
    assert got == serial


def test_ntile_helper_name_collision_raises(spark):
    from ml_pipelines_spark.operators.edf import (
        grouped_ordered_ntiles,
        ordered_ntiles,
    )

    df = spark.range(10).selectExpr("id AS uid", "id % 3 AS __nb")
    with pytest.raises(ValueError, match="__nb"):
        ordered_ntiles(df, [(["uid"], "tile")], 4)
    df2 = spark.range(10).selectExpr("id AS uid", "id % 3 AS __gb")
    with pytest.raises(ValueError, match="__gb"):
        grouped_ordered_ntiles(df2, ["__gb"], ["uid"], 4, "tile")
    # output-name collision is also an error, not a silent clobber
    df3 = spark.range(10).selectExpr("id AS uid", "id % 3 AS tile")
    with pytest.raises(ValueError, match="tile"):
        grouped_ordered_ntiles(df3, ["tile"], ["uid"], 4, "tile")
