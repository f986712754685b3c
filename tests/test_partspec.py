"""Partition-spec evolution: per-file tuples, per-spec pruning,
time travel, and value equality with the plain declarative filter."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from ml_pipelines_spark.operators.partspec import (
    read_spec_pruned,
    spec_pruned_file_count,
    spec_versions,
    write_spec_snapshot,
)
from ml_pipelines_spark.queries.relational import t


@pytest.fixture(scope="module")
def spec_table(spark, sf_dir):
    out = tempfile.mkdtemp(prefix="partspec_test_")
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.date_format("o_orderdate", "yyyy-MM").alias("o_month"),
        F.floor(F.col("o_totalprice") * 100.0 + 0.5)
        .cast("long")
        .alias("cents"),
    )
    v1 = write_spec_snapshot(
        orders.filter(F.col("o_orderkey") % 2 == 1),
        out,
        ["o_orderstatus"],
    )
    v2 = write_spec_snapshot(
        orders.filter(F.col("o_orderkey") % 2 == 0),
        out,
        ["o_month"],
    )
    yield out, orders, v1, v2
    shutil.rmtree(out, ignore_errors=True)


def test_versions_and_single_tuple_per_file(spark, spec_table):
    out, _, v1, v2 = spec_table
    assert (v1, v2) == (1, 2)
    assert spec_versions(spark, out) == [1, 2]
    man = (
        spark.read.parquet(f"{out}/_specmanifest")
        .filter(F.col("v") == 2)
        .collect()
    )
    # every file records exactly the columns of the spec it was
    # written under, and files are distinct per tuple within a spec
    specs = {frozenset((r["part"] or {}).keys()) for r in man}
    assert specs == {
        frozenset({"o_orderstatus"}),
        frozenset({"o_month"}),
    }


def test_pruning_is_per_spec(spark, spec_table):
    out, _, _, _ = spec_table
    man = (
        spark.read.parquet(f"{out}/_specmanifest")
        .filter(F.col("v") == 2)
        .collect()
    )
    n_status_files = sum(
        1 for r in man if "o_orderstatus" in (r["part"] or {})
    )
    n_month_files = sum(1 for r in man if "o_month" in (r["part"] or {}))
    # a status predicate prunes only status-spec files: every
    # month-spec file survives
    kept, total = spec_pruned_file_count(
        spark, out, {"o_orderstatus": "F"}
    )
    assert total == n_status_files + n_month_files
    assert n_month_files <= kept < total
    # a month predicate prunes only month-spec files symmetric-ly
    kept_m, _ = spec_pruned_file_count(spark, out, {"o_month": "1996-03"})
    assert n_status_files <= kept_m < total
    # both predicates intersect the kept sets
    kept_b, _ = spec_pruned_file_count(
        spark, out, {"o_orderstatus": "F", "o_month": "1996-03"}
    )
    assert kept_b <= min(kept, kept_m)


def test_values_match_plain_filter(spark, spec_table):
    out, orders, _, _ = spec_table
    got = (
        read_spec_pruned(
            spark, out, {"o_orderstatus": "F", "o_month": "1996-03"}
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("c"),
        )
        .collect()[0]
    )
    want = (
        orders.filter(
            (F.col("o_orderstatus") == "F")
            & (F.col("o_month") == "1996-03")
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("c"))
        .collect()[0]
    )
    assert (got["n"], got["c"]) == (want["n"], want["c"])
    assert got["n"] > 0


def test_time_travel_sees_only_v1(spark, spec_table):
    out, orders, v1, _ = spec_table
    old = read_spec_pruned(spark, out, {}, version=v1)
    assert old.filter(F.col("o_orderkey") % 2 == 0).count() == 0
    assert (
        old.count()
        == orders.filter(F.col("o_orderkey") % 2 == 1).count()
    )


def test_no_shadow_columns_leak(spark, spec_table):
    out, orders, _, _ = spec_table
    scan = read_spec_pruned(spark, out, {"o_orderstatus": "O"})
    assert not [c for c in scan.columns if c.startswith("_p_")]
    assert set(scan.columns) == set(orders.columns)


def test_null_partition_value_rejected(spark, spec_table):
    out, orders, _, _ = spec_table
    bad = orders.withColumn(
        "o_month",
        F.when(F.col("o_orderkey") % 5 == 0, F.lit(None)).otherwise(
            F.col("o_month")
        ),
    )
    with pytest.raises(ValueError, match="null partition value"):
        write_spec_snapshot(bad, out + "_null", ["o_month"])


def test_compact_spec_snapshot(spark, spec_table):
    """OPTIMIZE: after a same-spec append creates multiple files per
    tuple, compaction reduces to one file per tuple, preserves every
    tuple and row exactly, and leaves older versions readable."""
    import shutil
    import tempfile

    from ml_pipelines_spark.operators.partspec import (
        compact_spec_snapshot,
    )

    _, orders, _, _ = spec_table
    out = tempfile.mkdtemp(prefix="partspec_compact_")
    try:
        write_spec_snapshot(
            orders.filter(F.col("o_orderkey") % 2 == 1),
            out,
            ["o_orderstatus"],
        )
        write_spec_snapshot(
            orders.filter(F.col("o_orderkey") % 2 == 0),
            out,
            ["o_orderstatus"],
        )
        man2 = (
            spark.read.parquet(f"{out}/_specmanifest")
            .filter(F.col("v") == 2)
            .collect()
        )
        tuples2 = {tuple(sorted((r["part"] or {}).items())) for r in man2}
        assert len(man2) > len(tuples2)  # >1 file per tuple pre-compact
        v3 = compact_spec_snapshot(spark, out)
        assert v3 == 3
        man3 = (
            spark.read.parquet(f"{out}/_specmanifest")
            .filter(F.col("v") == 3)
            .collect()
        )
        tuples3 = {tuple(sorted((r["part"] or {}).items())) for r in man3}
        assert tuples3 == tuples2
        assert len(man3) == len(tuples3)  # exactly one file per tuple
        # row equality with the pre-compact version
        before = read_spec_pruned(spark, out, {}, version=2)
        after = read_spec_pruned(spark, out, {}, version=3)
        assert sorted(map(tuple, before.collect())) == sorted(
            map(tuple, after.collect())
        )
        # pruning still works post-compact
        kept, total = spec_pruned_file_count(
            spark, out, {"o_orderstatus": "F"}, version=3
        )
        assert kept < total
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_band_stats_prune_files(spark, sf_dir):
    """Per-file column stats skip files inside surviving tuples; files
    without stats for the band column are conservatively kept."""
    import shutil
    import tempfile

    from ml_pipelines_spark.queries.relational import t as _t

    out = tempfile.mkdtemp(prefix="partspec_band_")
    try:
        orders = _t(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_orderstatus",
            F.floor(F.col("o_totalprice") * 100.0 + 0.5)
            .cast("long")
            .alias("cents"),
        )
        # range-cluster within each status so per-file stats are tight:
        # several snapshots, each covering one cents band per status
        m = orders.agg(F.max("cents")).collect()[0][0]
        step = m // 4 + 1
        for i in range(4):
            write_spec_snapshot(
                orders.filter(
                    (F.col("cents") >= i * step)
                    & (F.col("cents") < (i + 1) * step)
                ),
                out,
                ["o_orderstatus"],
                stats_col="cents",
            )
        lo, hi = 0, step - 1  # first quartile band only
        kept, total = spec_pruned_file_count(
            spark, out, {}, band=("cents", lo, hi)
        )
        assert kept < total  # stats skipped non-overlapping files
        got = (
            read_spec_pruned(spark, out, {}, band=("cents", lo, hi))
            .agg(F.count(F.lit(1)), F.sum("cents"))
            .collect()[0]
        )
        want = (
            orders.filter(F.col("cents").between(lo, hi))
            .agg(F.count(F.lit(1)), F.sum("cents"))
            .collect()[0]
        )
        assert tuple(got) == tuple(want)
        # a band on a column with NO recorded stats keeps every file
        kept_u, total_u = spec_pruned_file_count(
            spark, out, {}, band=("o_orderkey", 0, 10)
        )
        assert kept_u == total_u
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_numeric_string_tuples_survive_inference(spark):
    """Partition values that LOOK numeric ('007') or boolean must round
    trip exactly — directory-name re-inference ('007' -> 7) must never
    leak into the manifest (the _v_ in-file twin guards it)."""
    import shutil
    import tempfile

    out = tempfile.mkdtemp(prefix="partspec_str_")
    try:
        df = spark.createDataFrame(
            [("007", 1), ("007", 2), ("42", 3), ("x9", 4)],
            "region_code string, v int",
        )
        write_spec_snapshot(df, out, ["region_code"])
        kept, total = spec_pruned_file_count(
            spark, out, {"region_code": "007"}
        )
        assert kept == 1 and total == 3
        got = read_spec_pruned(spark, out, {"region_code": "007"})
        assert sorted(r["v"] for r in got.collect()) == [1, 2]
        # boolean partition values normalize to Spark's lowercase form
        bdf = spark.createDataFrame(
            [(True, 1), (False, 2)], "flag boolean, v int"
        )
        write_spec_snapshot(bdf, out + "_b", ["flag"])
        gotb = read_spec_pruned(spark, out + "_b", {"flag": True})
        assert [r["v"] for r in gotb.collect()] == [1]
        shutil.rmtree(out + "_b", ignore_errors=True)
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_empty_prune_schema_matches_nonempty(spark, sf_dir):
    """The zero-files-kept path must return the DATA schema — no
    inferred g=/shadow partition columns — even on compacted tables."""
    import shutil
    import tempfile

    from ml_pipelines_spark.operators.partspec import (
        compact_spec_snapshot,
    )
    from ml_pipelines_spark.queries.relational import t as _t

    out = tempfile.mkdtemp(prefix="partspec_empty_")
    try:
        orders = _t(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderstatus"
        )
        write_spec_snapshot(orders, out, ["o_orderstatus"])
        compact_spec_snapshot(spark, out)
        empty = read_spec_pruned(spark, out, {"o_orderstatus": "ZZ"})
        full = read_spec_pruned(spark, out, {"o_orderstatus": "O"})
        assert empty.count() == 0
        assert empty.columns == full.columns
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_spec_writers_respect_version_claims(spark):
    """The spec table shares the manifest layer's atomic commit point:
    a held version claim makes writers fail with CommitConflict instead
    of writing into a contested directory."""
    import shutil
    import tempfile

    import pytest
    from pyspark.sql import functions as F

    from ml_pipelines_spark.operators.manifest import (
        CommitConflict,
        _claim_version,
        _release_claim,
    )
    from ml_pipelines_spark.operators.partspec import write_spec_snapshot

    d = tempfile.mkdtemp(prefix="mlps_spec_claim_")
    try:
        df = spark.range(0, 100).select(
            F.col("id").alias("k"),
            (F.col("id") % 3).cast("string").alias("status"),
        )
        assert write_spec_snapshot(df, d, ["status"]) == 1
        # a concurrent writer holds v=2: the next write must conflict
        assert _claim_version(spark, d, 2)
        with pytest.raises(CommitConflict, match="v=2"):
            write_spec_snapshot(df, d, ["status"])
        # released claim: the write lands
        _release_claim(spark, d, 2)
        assert write_spec_snapshot(df, d, ["status"]) == 2
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ---------------------------------------------------------------------------
# Round-10: bucket(N,col) / truncate(W,col) partition transforms
# (VERDICT r09 item 5) — the Iceberg answer to high-cardinality keys
# (the reference's per-image partitioning). Write and read must agree
# on bucket ids via Spark's own hash; equality predicates prune to ONE
# bucket, physically asserted by file counts.
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def bucket_table(spark, sf_dir):
    out = tempfile.mkdtemp(prefix="partspec_bucket_")
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        F.floor(F.col("o_totalprice") * 100.0 + 0.5)
        .cast("long")
        .alias("cents"),
    )
    write_spec_snapshot(orders, out, ["bucket(8,o_custkey)"])
    yield out, orders
    shutil.rmtree(out, ignore_errors=True)


def test_bucket_transform_prunes_to_one_bucket(spark, bucket_table):
    out, orders = bucket_table
    # 8 buckets -> 8 tuple dirs; an equality predicate on the SOURCE
    # column keeps exactly the files of one bucket
    man = spark.read.parquet(f"{out}/_specmanifest").collect()
    buckets = {(r["part"] or {}).get("bucket(8,o_custkey)") for r in man}
    assert len(buckets) == 8
    key = int(orders.select(F.min("o_custkey")).collect()[0][0])
    kept, total = spec_pruned_file_count(spark, out, {"o_custkey": key})
    per_bucket = total / 8
    assert kept <= per_bucket  # one bucket's files only
    assert kept >= 1


def test_bucket_transform_read_is_exact(spark, bucket_table):
    out, orders = bucket_table
    key = int(orders.select(F.min("o_custkey")).collect()[0][0])
    got = read_spec_pruned(spark, out, {"o_custkey": key})
    want = orders.filter(F.col("o_custkey") == key)
    assert got.count() == want.count() > 0
    assert (
        got.agg(F.sum("cents")).collect()[0][0]
        == want.agg(F.sum("cents")).collect()[0][0]
    )
    # no shadow columns leak
    assert all(not c.startswith(("_p_", "_v_")) for c in got.columns)


def test_bucket_keeps_files_opened_to_one_bucket(spark, bucket_table):
    # physical assertion: the pruned read OPENS only the kept files
    out, orders = bucket_table
    key = int(orders.select(F.min("o_custkey")).collect()[0][0])
    kept, total = spec_pruned_file_count(spark, out, {"o_custkey": key})
    got = read_spec_pruned(spark, out, {"o_custkey": key})
    opened = {
        r["f"]
        for r in got.select(
            F.input_file_name().alias("f")
        ).distinct().collect()
    }
    assert len(opened) <= kept < total


def test_truncate_transform_prunes_and_is_exact(spark, sf_dir):
    out = tempfile.mkdtemp(prefix="partspec_trunc_")
    try:
        cust = t(spark, sf_dir, "customer").select(
            "c_custkey", "c_name", "c_acctbal"
        )
        # c_name is 'Customer#000000001' — truncate(10) groups by the
        # shared prefix; use c_custkey cast to string via truncate(2)
        # for real grouping instead
        df = cust.withColumn("ck", F.col("c_custkey").cast("string"))
        write_spec_snapshot(df, out, ["truncate(1,ck)"])
        man = spark.read.parquet(f"{out}/_specmanifest").collect()
        prefixes = {(r["part"] or {}).get("truncate(1,ck)") for r in man}
        assert prefixes <= set("0123456789")  # first digit of the key
        # equality on the source column prunes to one prefix group
        kept, total = spec_pruned_file_count(spark, out, {"ck": "42"})
        assert kept < total
        got = read_spec_pruned(spark, out, {"ck": "42"})
        assert got.count() == 1
        assert got.collect()[0]["c_custkey"] == 42
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_identity_and_bucket_compose(spark, sf_dir):
    out = tempfile.mkdtemp(prefix="partspec_compose_")
    try:
        orders = t(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_orderstatus"
        )
        write_spec_snapshot(
            orders, out, ["o_orderstatus", "bucket(4,o_custkey)"]
        )
        key = int(orders.select(F.min("o_custkey")).collect()[0][0])
        # both predicates prune multiplicatively: <= files of one
        # (status, bucket) tuple
        k_both, total = spec_pruned_file_count(
            spark, out, {"o_orderstatus": "F", "o_custkey": key}
        )
        k_status, _ = spec_pruned_file_count(
            spark, out, {"o_orderstatus": "F"}
        )
        assert k_both < k_status < total
        got = read_spec_pruned(
            spark, out, {"o_orderstatus": "F", "o_custkey": key}
        )
        want = orders.filter(
            (F.col("o_orderstatus") == "F") & (F.col("o_custkey") == key)
        )
        assert got.count() == want.count()
    finally:
        shutil.rmtree(out, ignore_errors=True)
