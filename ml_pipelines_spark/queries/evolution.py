"""Maintenance-path queries: skew-salted join and schema-evolution read.

Both wrap operators that previously had pytest-only evidence; these
registry entries give them cross-engine value oracles. The salted join's
contract IS result-equality with the plain join, so the oracle is simply
the plain SQL join; the evolution reader writes two real file
generations (renamed column, added column) to a temp dir and the oracle
replays the reconciliation declaratively from the registered tables.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import query
from .relational import t


# ---------------------------------------------------------------------------
# Salted join: factor-way salt spreading of the big side; result must be
# row-identical to the unsalted join (the salt only reshapes the
# physical shuffle). The oracle is the plain join — any salting bug
# (lost rows, duplicated small side) breaks the hash.
# ---------------------------------------------------------------------------
@query(
    "salted_join_revenue",
    """
    SELECT s_nationkey,
           COUNT(*) AS n_items,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_nationkey
    """,
)
def salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_join

    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("s_suppkey"),
        "l_extendedprice",
        "l_discount",
    )
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    joined = salted_join(li, supp, on=["s_suppkey"], factor=8)
    return joined.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# Schema evolution: generation 1 files carry (o_orderkey, price) — the
# retired column name, no status; generation 2 carries the current
# schema. evolve_read must present ONE uniform schema: rename mapped,
# missing status defaulted. The oracle replays the same reconciliation
# from the orders table directly.
# ---------------------------------------------------------------------------
@query(
    "schema_evolution_read",
    """
    SELECT o_orderkey,
           ROUND(o_totalprice, 2) AS o_totalprice,
           CASE WHEN o_orderkey % 2 = 0 THEN 'UNKNOWN' ELSE o_orderstatus END
               AS o_orderstatus
    FROM orders
    """,
)
def schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from ..io import evolve_read

    orders = t(spark, sf_dir, "orders")
    out_dir = tempfile.mkdtemp(prefix="schema_evo_")
    # The returned plan lazily reads these files, so the dir must outlive
    # the query (cleaned at interpreter exit, not eagerly).
    atexit.register(shutil.rmtree, out_dir, ignore_errors=True)
    orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", F.col("o_totalprice").alias("price")
    ).write.mode("overwrite").parquet(f"{out_dir}/gen=1")
    orders.filter(F.col("o_orderkey") % 2 != 0).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    ).write.mode("overwrite").parquet(f"{out_dir}/gen=2")

    target = StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_totalprice", DoubleType()),
            StructField("o_orderstatus", StringType()),
        ]
    )
    df = evolve_read(
        spark,
        out_dir,
        target,
        renames={"price": "o_totalprice"},
        defaults={"o_orderstatus": "UNKNOWN"},
    )
    return df.select(
        "o_orderkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        "o_orderstatus",
    )


# ---------------------------------------------------------------------------
# CDC apply (io.cdc_apply): a deterministic change batch — updates on
# keys %7==0 (price +10), deletes on keys %21==0 (issued at a LATER
# sequence than their own update, so latest-wins must delete), inserts
# of key+10M for keys %13==0 — applied to a real partitioned copy of
# orders, then the FINAL TABLE STATE is read back and summarized per
# partition. The oracle derives the same final state declaratively from
# the orders table, so the whole latest-wins/delete/upsert/rewrite path
# is value-checked; the touched-partition write bound is asserted in
# tests/test_maintenance.py.
# ---------------------------------------------------------------------------
@query(
    "cdc_apply_orders",
    """
    WITH survivors AS (
        SELECT o_orderpriority,
               CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 10
                    ELSE o_totalprice END AS price
        FROM orders WHERE o_orderkey % 21 <> 0
    ),
    inserts AS (
        -- +5, not /2: halving creates half-cent values that can park a
        -- group SUM exactly on a .xx5 rounding boundary, where the two
        -- engines' float partial-sum orders legitimately disagree at 2dp
        SELECT o_orderpriority, o_totalprice + 5 AS price
        FROM orders WHERE o_orderkey % 13 = 0
    ),
    final AS (
        SELECT * FROM survivors UNION ALL SELECT * FROM inserts
    )
    SELECT o_orderpriority,
           COUNT(*) AS n_rows,
           ROUND(SUM(price), 2) AS total_price
    FROM final GROUP BY o_orderpriority
    """,
)
def cdc_apply_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..io import cdc_apply

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    d = tempfile.mkdtemp(prefix="mlps_cdc_")
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    path = f"{d}/orders"
    orders.write.partitionBy("o_orderpriority").parquet(path)

    updates = orders.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        (F.col("o_totalprice") + 10).alias("o_totalprice"),
        "o_orderpriority",
        F.lit("U").alias("op"),
        F.lit(1).alias("seq"),
    )
    deletes = orders.filter(F.col("o_orderkey") % 21 == 0).select(
        "o_orderkey",
        F.col("o_totalprice"),
        "o_orderpriority",
        F.lit("D").alias("op"),
        F.lit(2).alias("seq"),
    )
    inserts = orders.filter(F.col("o_orderkey") % 13 == 0).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        (F.col("o_totalprice") + 5).alias("o_totalprice"),
        "o_orderpriority",
        F.lit("I").alias("op"),
        F.lit(1).alias("seq"),
    )
    changes = updates.unionByName(deletes).unionByName(inserts)
    cdc_apply(
        spark,
        path,
        changes,
        key_cols=["o_orderkey"],
        partition_cols=["o_orderpriority"],
    )
    final = spark.read.parquet(path)
    result = final.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )
    rows = result.collect()
    shutil.rmtree(d, ignore_errors=True)
    return spark.createDataFrame(rows, result.schema)


# ---------------------------------------------------------------------------
# Manifest-based file skipping (operators/manifest.py): orders are
# written range-clustered on exact price cents with a file-level zone
# map under _manifest/, then a narrow price band is answered by reading
# ONLY the overlapping files (pruned_file_count proves files were
# skipped in tests/test_manifest.py). The oracle computes the same band
# aggregate straight from the source table — pruning must be invisible
# in the values. The write happens once per (session, sf_dir); the
# returned plan reads the pruned file list lazily.
# ---------------------------------------------------------------------------
_MANIFEST_DIRS: dict[tuple[str, str], str] = {}
_BAND_LO, _BAND_HI = 5_000_00, 15_000_00  # $5,000 .. $15,000 in cents


def _manifest_orders_dir(spark: SparkSession, sf_dir: str) -> str:
    from ..operators.manifest import write_manifest_table

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _MANIFEST_DIRS:
        out_dir = tempfile.mkdtemp(prefix="manifest_orders_")
        atexit.register(shutil.rmtree, out_dir, ignore_errors=True)
        orders = t(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_orderstatus",
            F.floor(F.col("o_totalprice") * 100.0 + 0.5)
            .cast("long")
            .alias("price_cents"),
        )
        write_manifest_table(orders, out_dir, "price_cents", num_files=16)
        _MANIFEST_DIRS[key] = out_dir
    return _MANIFEST_DIRS[key]


@query(
    "manifest_pruned_scan",
    f"""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) / 100.0 AS band_revenue
    FROM orders
    WHERE CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
          BETWEEN {_BAND_LO} AND {_BAND_HI}
    GROUP BY o_orderstatus
    """,
)
def manifest_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.manifest import read_pruned

    path = _manifest_orders_dir(spark, sf_dir)
    band = read_pruned(spark, path, "price_cents", _BAND_LO, _BAND_HI)
    return band.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        (F.sum("price_cents").cast("long") / 100.0).alias("band_revenue"),
    )


# ---------------------------------------------------------------------------
# Manifest-of-manifests (Iceberg manifest-list) tier under the oracle
# gate: the same orders projection is written as 64 range-laid files,
# the manifest itself is sharded into 8 range shards with a per-shard
# bounds list, and a narrow price band is planned by opening ONLY the
# overlapping manifest shards (pruned_shard_count proves shards were
# skipped in tests/test_manifest.py) before pruning data files. The
# oracle computes the band aggregate straight from the source table —
# two tiers of metadata pruning must be invisible in the values.
# ---------------------------------------------------------------------------
_2T_LO, _2T_HI = 2_000_00, 8_000_00  # $2,000 .. $8,000 in cents
_MANIFEST2_DIRS: dict[tuple[str, str], str] = {}


def _manifest_two_tier_dir(spark: SparkSession, sf_dir: str) -> str:
    from ..operators.manifest import build_manifest_list, write_manifest_table

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _MANIFEST2_DIRS:
        out_dir = tempfile.mkdtemp(prefix="manifest2_orders_")
        atexit.register(shutil.rmtree, out_dir, ignore_errors=True)
        orders = t(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_orderstatus",
            F.floor(F.col("o_totalprice") * 100.0 + 0.5)
            .cast("long")
            .alias("price_cents"),
        )
        write_manifest_table(orders, out_dir, "price_cents", num_files=64)
        build_manifest_list(spark, out_dir, num_shards=8)
        _MANIFEST2_DIRS[key] = out_dir
    return _MANIFEST2_DIRS[key]


@query(
    "manifest_two_tier_scan",
    f"""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) / 100.0 AS band_revenue
    FROM orders
    WHERE CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
          BETWEEN {_2T_LO} AND {_2T_HI}
    GROUP BY o_orderstatus
    """,
)
def manifest_two_tier_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.manifest import read_pruned_two_tier

    path = _manifest_two_tier_dir(spark, sf_dir)
    band = read_pruned_two_tier(
        spark, path, "price_cents", _2T_LO, _2T_HI
    )
    return band.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        (F.sum("price_cents").cast("long") / 100.0).alias("band_revenue"),
    )


# ---------------------------------------------------------------------------
# Table-format lifecycle under the oracle gate: v1 = full snapshot of
# the orders projection, v2 = copy-on-write MERGE (price bump on
# o_orderkey%13=0 — overlapping files rewritten, rest carried), v3 =
# merge-on-read DELETE (o_orderkey%17=0 tombstoned, zero data files
# touched). The query reads the LATEST version back; the oracle derives
# the same final state declaratively from the source table, so a wrong
# carry, a resurrected tombstone, or a double-applied merge breaks the
# hash. (The per-op physical claims — carried files verbatim, byte-
# identical v1 after deletes, compaction purge — are pytest-asserted in
# tests/test_manifest.py; this query pins the VALUES end-to-end.)
# ---------------------------------------------------------------------------
_TABLE_LC_DIRS: dict[tuple[str, str], str] = {}


def _table_lifecycle_dir(spark: SparkSession, sf_dir: str) -> str:
    from ..operators.manifest import (
        delete_from_snapshot,
        merge_snapshot,
        write_manifest_table,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _TABLE_LC_DIRS:
        out_dir = tempfile.mkdtemp(prefix="table_lc_")
        atexit.register(shutil.rmtree, out_dir, ignore_errors=True)
        orders = t(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_orderstatus",
            F.floor(F.col("o_totalprice") * 100.0 + 0.5)
            .cast("long")
            .alias("cents"),
        )
        write_manifest_table(orders, out_dir, "o_orderkey", num_files=16)
        updates = orders.filter(F.col("o_orderkey") % 13 == 0).withColumn(
            "cents", F.col("cents") + 100000
        )
        merge_snapshot(spark, out_dir, "o_orderkey", updates, num_files=4)
        dels = orders.filter(F.col("o_orderkey") % 17 == 0).select(
            "o_orderkey"
        )
        delete_from_snapshot(spark, out_dir, "o_orderkey", dels)
        _TABLE_LC_DIRS[key] = out_dir
    return _TABLE_LC_DIRS[key]


@query(
    "table_format_lifecycle",
    """
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CASE WHEN o_orderkey % 13 = 0
                         THEN CAST(floor(o_totalprice * 100.0 + 0.5)
                                   AS BIGINT) + 100000
                         ELSE CAST(floor(o_totalprice * 100.0 + 0.5)
                                   AS BIGINT) END)
                AS BIGINT) / 100.0 AS total_value
    FROM orders
    WHERE o_orderkey % 17 <> 0
    GROUP BY o_orderstatus
    """,
)
def table_format_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.manifest import read_snapshot

    path = _table_lifecycle_dir(spark, sf_dir)
    latest = read_snapshot(spark, path)
    return latest.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        (F.sum("cents").cast("long") / 100.0).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# Schema evolution under the oracle gate: v1 = orders snapshot
# (o_orderkey, cents), v2 = metadata-only ADD COLUMN channel DEFAULT
# 'store', v3 = append of NEW keys (offset) carrying channel='web'
# physically, v4 = RENAME cents -> price_cents (old files keep the old
# physical name; readers alias at plan time), v5 = MoR delete of
# o_orderkey % 7 = 0. The query reads the LATEST version and
# aggregates by channel over the renamed column; the oracle re-derives
# the same final state declaratively from the source table — a miss in
# default fill, alias mapping, per-origin replay, or tombstone scoping
# breaks the hash. Per-op physical claims (zero files touched by
# ALTERs, time travel to the pre-evolution schema, rename-crossing
# tombstones) are pytest-asserted in tests/test_manifest.py.
# ---------------------------------------------------------------------------
_EVO_DIRS: dict[tuple[str, str], str] = {}
_EVO_OFFSET = 3_000_000


def _schema_evolution_dir(spark: SparkSession, sf_dir: str) -> str:
    from ..operators.manifest import (
        add_column,
        append_snapshot,
        delete_from_snapshot,
        rename_column,
        write_manifest_table,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _EVO_DIRS:
        out_dir = tempfile.mkdtemp(prefix="schema_evo_")
        atexit.register(shutil.rmtree, out_dir, ignore_errors=True)
        orders = t(spark, sf_dir, "orders").select(
            "o_orderkey",
            F.floor(F.col("o_totalprice") * 100.0 + 0.5)
            .cast("long")
            .alias("cents"),
        )
        write_manifest_table(orders, out_dir, "o_orderkey", num_files=16)
        add_column(spark, out_dir, "channel", "string", "'store'")
        web = orders.filter(F.col("o_orderkey") % 10 == 0).select(
            (F.col("o_orderkey") + _EVO_OFFSET).alias("o_orderkey"),
            "cents",
            F.lit("web").alias("channel"),
        )
        append_snapshot(web, out_dir, "o_orderkey", num_files=4)
        rename_column(spark, out_dir, "cents", "price_cents")
        dels = orders.filter(F.col("o_orderkey") % 7 == 0).select(
            "o_orderkey"
        )
        delete_from_snapshot(spark, out_dir, "o_orderkey", dels)
        _EVO_DIRS[key] = out_dir
    return _EVO_DIRS[key]


@query(
    "schema_evolution_orders",
    """
    WITH base AS (
        SELECT o_orderkey,
               CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
        FROM orders
    )
    SELECT channel,
           COUNT(*) AS n_rows,
           CAST(SUM(cents) AS BIGINT) / 100.0 AS total_value
    FROM (
        SELECT 'store' AS channel, cents
        FROM base WHERE o_orderkey % 7 <> 0
        UNION ALL
        SELECT 'web' AS channel, cents
        FROM base WHERE o_orderkey % 10 = 0
    )
    GROUP BY channel
    """,
)
def schema_evolution_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.manifest import read_snapshot_evolved

    path = _schema_evolution_dir(spark, sf_dir)
    latest = read_snapshot_evolved(spark, path)
    return latest.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.sum("price_cents").cast("long") / 100.0).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# Change data feed between table versions: diff the lifecycle table's
# v1 (initial write) against its latest (after the CoW merge and the
# MoR delete) — the "what changed since I last read" API a downstream
# incremental consumer needs, derived purely from the two snapshot
# reads (no change log was kept; at scale the zone maps narrow the diff
# join to overlapping files). The oracle re-derives each key's fate
# declaratively: updated (%13, surviving), deleted (%17), unchanged
# otherwise — so a wrong merge carry or resurrected tombstone shows up
# as a misclassified key.
# ---------------------------------------------------------------------------
@query(
    "table_change_feed",
    """
    SELECT CASE WHEN o_orderkey % 17 = 0 THEN 'delete'
                WHEN o_orderkey % 13 = 0 THEN 'update'
                ELSE 'unchanged' END AS change_type,
           COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN o_orderkey % 17 <> 0 AND o_orderkey % 13 = 0
                         THEN 100000 ELSE 0 END) AS BIGINT) / 100.0
               AS value_delta
    FROM orders
    GROUP BY change_type
    """,
)
def table_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.manifest import read_snapshot

    path = _table_lifecycle_dir(spark, sf_dir)
    v1 = read_snapshot(spark, path, 1).select(
        "o_orderkey", F.col("cents").alias("old_cents")
    )
    latest = read_snapshot(spark, path).select(
        "o_orderkey", F.col("cents").alias("new_cents")
    )
    joined = v1.join(latest, "o_orderkey", "full_outer")
    change = (
        F.when(F.col("new_cents").isNull(), "delete")
        .when(F.col("new_cents") != F.col("old_cents"), "update")
        .otherwise("unchanged")
    )
    return (
        joined.select(
            change.alias("change_type"),
            F.coalesce(
                F.col("new_cents") - F.col("old_cents"), F.lit(0)
            ).alias("delta"),
        )
        .groupBy("change_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.sum("delta").cast("long") / 100.0).alias("value_delta"),
        )
    )


# ---------------------------------------------------------------------------
# RESTORE under the oracle gate: v1 = orders snapshot, v2 = CoW MERGE
# (price bump on o_orderkey%11=0), v3 = MoR DELETE (%13=0), v4 =
# RESTORE to v1 (metadata-only — the merge and the delete stop
# applying), v5 = a FRESH MoR delete (%7=0) that must apply to the
# restored state. The query reads the latest version; the oracle is the
# ORIGINAL orders values minus the fresh delete — if the restore leaks
# the v2 merge, fails to shadow the v3 tombstones, or the post-restore
# delete misses, the hash breaks. Physical claims (no data reads or
# writes during restore, intact history) are pytest-asserted in
# tests/test_manifest.py.
# ---------------------------------------------------------------------------
_RESTORE_DIRS: dict[tuple[str, str], str] = {}


def _table_restore_dir(spark: SparkSession, sf_dir: str) -> str:
    from ..operators.manifest import (
        delete_from_snapshot,
        merge_snapshot,
        restore_snapshot,
        write_manifest_table,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _RESTORE_DIRS:
        out_dir = tempfile.mkdtemp(prefix="table_restore_")
        atexit.register(shutil.rmtree, out_dir, ignore_errors=True)
        orders = t(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_orderstatus",
            F.floor(F.col("o_totalprice") * 100.0 + 0.5)
            .cast("long")
            .alias("cents"),
        )
        write_manifest_table(orders, out_dir, "o_orderkey", num_files=16)
        updates = orders.filter(F.col("o_orderkey") % 11 == 0).withColumn(
            "cents", F.col("cents") + 50000
        )
        merge_snapshot(spark, out_dir, "o_orderkey", updates, num_files=4)
        delete_from_snapshot(
            spark,
            out_dir,
            "o_orderkey",
            orders.filter(F.col("o_orderkey") % 13 == 0).select(
                "o_orderkey"
            ),
        )
        restore_snapshot(spark, out_dir, 1)
        delete_from_snapshot(
            spark,
            out_dir,
            "o_orderkey",
            orders.filter(F.col("o_orderkey") % 7 == 0).select("o_orderkey"),
        )
        _RESTORE_DIRS[key] = out_dir
    return _RESTORE_DIRS[key]


@query(
    "table_restore_orders",
    """
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) / 100.0 AS total_value
    FROM orders
    WHERE o_orderkey % 7 <> 0
    GROUP BY o_orderstatus
    """,
)
def table_restore_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.manifest import read_snapshot

    path = _table_restore_dir(spark, sf_dir)
    latest = read_snapshot(spark, path)
    return latest.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        (F.sum("cents").cast("long") / 100.0).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# EXPIRE + WAP under the oracle gate: v1 = orders snapshot (16 small
# files), v2 = staged-audited-published append of NEW keys (offset,
# write-audit-publish — a staged-but-ABORTED bad batch must leave no
# trace), v3 = compaction, then expire_snapshots(keep_last=1) physically
# reclaims v1/v2's unreferenced bytes. The query reads the surviving
# latest version; the oracle re-derives it from the source — a GC bug
# that deletes a still-referenced file surfaces as missing rows, an
# aborted stage that leaks surfaces as phantom rows. Physical claims
# (files actually deleted, expired time travel raising) are
# pytest-asserted in tests/test_manifest.py.
# ---------------------------------------------------------------------------
_EXPIRE_DIRS: dict[tuple[str, str], str] = {}
_EXP_OFFSET = 4_000_000


def _table_expire_dir(spark: SparkSession, sf_dir: str) -> str:
    from ..operators.manifest import (
        abort_staged,
        compact_snapshot,
        expire_snapshots,
        publish_staged,
        read_staged,
        stage_snapshot,
        write_manifest_table,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _EXPIRE_DIRS:
        out_dir = tempfile.mkdtemp(prefix="table_expire_")
        atexit.register(shutil.rmtree, out_dir, ignore_errors=True)
        orders = t(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_orderstatus",
            F.floor(F.col("o_totalprice") * 100.0 + 0.5)
            .cast("long")
            .alias("cents"),
        )
        write_manifest_table(orders, out_dir, "o_orderkey", num_files=16)
        # a bad batch: staged, audited (negative prices), ABORTED
        bad = orders.filter(F.col("o_orderkey") % 10 == 0).select(
            (F.col("o_orderkey") + _EXP_OFFSET).alias("o_orderkey"),
            "o_orderstatus",
            (-F.col("cents")).alias("cents"),
        )
        sv = stage_snapshot(bad, out_dir, "o_orderkey", num_files=2)
        audit_bad = read_staged(spark, out_dir, sv).filter(
            F.col("cents") < 0
        )
        assert audit_bad.limit(1).count() > 0  # audit catches it
        abort_staged(spark, out_dir, sv)
        # the good batch: staged, audited, PUBLISHED
        good = orders.filter(F.col("o_orderkey") % 10 == 0).select(
            (F.col("o_orderkey") + _EXP_OFFSET).alias("o_orderkey"),
            "o_orderstatus",
            "cents",
        )
        sv = stage_snapshot(good, out_dir, "o_orderkey", num_files=2)
        assert (
            read_staged(spark, out_dir, sv)
            .filter(F.col("cents") < 0)
            .limit(1)
            .count()
            == 0
        )
        publish_staged(spark, out_dir, sv)
        compact_snapshot(spark, out_dir, "o_orderkey", target_rows=200000)
        expire_snapshots(spark, out_dir, keep_last=1)
        _EXPIRE_DIRS[key] = out_dir
    return _EXPIRE_DIRS[key]


@query(
    "table_expire_maintenance",
    """
    WITH base AS (
        SELECT o_orderstatus,
               CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
        FROM orders
        UNION ALL
        SELECT o_orderstatus,
               CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
        FROM orders WHERE o_orderkey % 10 = 0
    )
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(cents) AS BIGINT) / 100.0 AS total_value
    FROM base
    GROUP BY o_orderstatus
    """,
)
def table_expire_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.manifest import read_snapshot

    path = _table_expire_dir(spark, sf_dir)
    latest = read_snapshot(spark, path)
    return latest.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        (F.sum("cents").cast("long") / 100.0).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# Snapshot TAGS under the oracle gate (Iceberg named refs): v1/v2/v3/v4
# built by disjoint appends, v2 tagged "release", then
# expire_snapshots(keep_last=1). The retention contract says the tagged
# v2 must survive GC while untagged v1/v3 expire — so the query reads
# BOTH refs after the expire: 'release' (time travel by NAME through
# the tag, exactly the v1+v2 key universe) and 'latest' (all four
# appends). The oracle re-derives both row sets from the source table;
# a GC bug that collects the tagged version surfaces as a read error,
# one that deletes its files as missing rows. Physical claims (expired
# versions actually gone, drop_tag re-exposing to GC) are
# pytest-asserted in tests/test_manifest.py.
# ---------------------------------------------------------------------------
_TAG_DIRS: dict[tuple[str, str], str] = {}


def _table_tag_dir(spark: SparkSession, sf_dir: str) -> str:
    from ..operators.manifest import (
        append_snapshot,
        expire_snapshots,
        tag_snapshot,
        write_manifest_table,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _TAG_DIRS:
        out_dir = tempfile.mkdtemp(prefix="table_tags_")
        atexit.register(shutil.rmtree, out_dir, ignore_errors=True)
        orders = t(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_orderstatus",
            F.floor(F.col("o_totalprice") * 100.0 + 0.5)
            .cast("long")
            .alias("cents"),
        )

        def batch(rem: int):
            return orders.filter(F.col("o_orderkey") % 4 == rem)

        write_manifest_table(batch(1), out_dir, "o_orderkey", num_files=4)
        append_snapshot(batch(2), out_dir, "o_orderkey", num_files=2)
        tag_snapshot(spark, out_dir, "release")  # pins v2
        append_snapshot(batch(3), out_dir, "o_orderkey", num_files=2)
        append_snapshot(batch(0), out_dir, "o_orderkey", num_files=2)
        # keep_last=1 would collect v1-v3; the tag must keep v2 alive
        expire_snapshots(spark, out_dir, keep_last=1)
        _TAG_DIRS[key] = out_dir
    return _TAG_DIRS[key]


@query(
    "table_tag_travel",
    """
    SELECT 'latest' AS ref,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) / 100.0 AS total_value
    FROM orders
    UNION ALL
    SELECT 'release' AS ref,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) / 100.0 AS total_value
    FROM orders WHERE o_orderkey % 4 IN (1, 2)
    """,
)
def table_tag_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.manifest import read_snapshot

    path = _table_tag_dir(spark, sf_dir)

    def agg(df: DataFrame, ref: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum("cents").cast("long") / 100.0).alias("total_value"),
        ).select(F.lit(ref).alias("ref"), "n_orders", "total_value")

    latest = agg(read_snapshot(spark, path), "latest")
    release = agg(read_snapshot(spark, path, ref="release"), "release")
    return latest.unionByName(release)


# ---------------------------------------------------------------------------
# Secondary-column file skipping under the oracle gate: the events
# projection is range-laid on event_id; event time correlates with
# event_id (ingest order), so per-file [min,max] stats on t_us
# (operators/filestats.write_file_stats) prune a time-band read down to
# the few files whose interval overlaps — pruning on a column the
# manifest's sort key does NOT cover. The band is derived from the
# table's own [min,max] span with integer arithmetic (identical on both
# engines); the oracle recomputes the aggregate from the source table.
# Physical skipping (kept << total) is pytest-asserted in
# tests/test_filestats.py.
# ---------------------------------------------------------------------------
_FSTATS_DIRS: dict[tuple[str, str], str] = {}


def _filestats_dir(spark: SparkSession, sf_dir: str) -> str:
    from ..operators.filestats import write_file_stats
    from ..operators.manifest import write_manifest_table

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _FSTATS_DIRS:
        out_dir = tempfile.mkdtemp(prefix="table_fstats_")
        atexit.register(shutil.rmtree, out_dir, ignore_errors=True)
        ev = t(spark, sf_dir, "events").select(
            "event_id",
            F.unix_micros(F.col("ts")).alias("t_us"),
            "event_type",
            F.floor(F.col("value") * 100.0 + 0.5)
            .cast("long")
            .alias("value_cents"),
        )
        write_manifest_table(ev, out_dir, "event_id", num_files=16)
        write_file_stats(spark, out_dir, ["t_us"])
        _FSTATS_DIRS[key] = out_dir
    return _FSTATS_DIRS[key]


@query(
    "manifest_stats_scan",
    """
    WITH span AS (
        SELECT MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx
        FROM events
    ), band AS (
        SELECT mn + (mx - mn) // 5 AS lo,
               mn + (3 * (mx - mn)) // 10 AS hi
        FROM span
    )
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) / 100.0 AS band_value
    FROM events, band
    WHERE epoch_us(ts) BETWEEN lo AND hi
    GROUP BY event_type
    """,
)
def manifest_stats_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.filestats import read_pruned_stats

    path = _filestats_dir(spark, sf_dir)
    span = (
        t(spark, sf_dir, "events")
        .agg(
            F.min(F.unix_micros("ts")).alias("mn"),
            F.max(F.unix_micros("ts")).alias("mx"),
        )
        .collect()[0]
    )
    mn, mx = int(span["mn"]), int(span["mx"])
    lo = mn + (mx - mn) // 5
    hi = mn + (3 * (mx - mn)) // 10
    band = read_pruned_stats(spark, path, "t_us", lo, hi)
    return band.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.sum("value_cents").cast("long") / 100.0).alias("band_value"),
    )


# ---------------------------------------------------------------------------
# Bloom point-lookup under the oracle gate: orders are range-laid on
# o_orderkey, then looked up by o_custkey — a column the layout
# scatters, where range stats prune nothing. The per-file bloom sidecar
# (operators/filestats.write_file_bloom) keeps only files whose bitmap
# contains all k probe positions; the equality residual keeps it exact
# (no false negatives by construction). The probe key is the table's
# own MIN customer key, derived identically on both engines. Skipping
# evidence is pytest-asserted on clustered synthetic data.
# ---------------------------------------------------------------------------
_FBLOOM_DIRS: dict[tuple[str, str], str] = {}


def _filebloom_dir(spark: SparkSession, sf_dir: str) -> str:
    from ..operators.filestats import write_file_bloom
    from ..operators.manifest import write_manifest_table

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _FBLOOM_DIRS:
        out_dir = tempfile.mkdtemp(prefix="table_fbloom_")
        atexit.register(shutil.rmtree, out_dir, ignore_errors=True)
        orders = t(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_custkey",
            F.floor(F.col("o_totalprice") * 100.0 + 0.5)
            .cast("long")
            .alias("cents"),
        )
        write_manifest_table(orders, out_dir, "o_orderkey", num_files=16)
        write_file_bloom(spark, out_dir, "o_custkey")
        _FBLOOM_DIRS[key] = out_dir
    return _FBLOOM_DIRS[key]


@query(
    "manifest_bloom_lookup",
    """
    SELECT o_orderkey,
           CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) / 100.0
               AS order_value
    FROM orders
    WHERE o_custkey = (SELECT MIN(o_custkey) FROM orders)
    """,
)
def manifest_bloom_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.filestats import point_lookup

    path = _filebloom_dir(spark, sf_dir)
    probe = (
        t(spark, sf_dir, "orders")
        .agg(F.min("o_custkey").alias("k"))
        .collect()[0]["k"]
    )
    hits = point_lookup(spark, path, "o_custkey", int(probe))
    return hits.select(
        "o_orderkey", (F.col("cents").cast("long") / 100.0).alias("order_value")
    )


# ---------------------------------------------------------------------------
# Z-ordered rectangle scan under the oracle gate: orders are laid out
# by the MORTON KEY of (o_custkey, cents) — each file owns a small
# rectangle of (customer, price) space, so the keep set for a
# two-sided band is the INTERSECTION of both axes' file prunes
# (operators/filestats.read_pruned_rect). A linear layout prunes one
# axis and scans the other; Z-order is how two-axis workloads scale.
# The rectangle is the lower 25% of each axis derived from the table's
# own min/max spans with integer arithmetic (identical on both
# engines); the oracle recomputes from the source. Two-axis pruning is
# pytest-asserted on uniform synthetic data.
# ---------------------------------------------------------------------------
_ZORD_DIRS: dict[tuple[str, str], str] = {}


def _zorder_rect_dir(spark: SparkSession, sf_dir: str) -> str:
    from ..operators.filestats import write_manifest_table_zordered

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _ZORD_DIRS:
        out_dir = tempfile.mkdtemp(prefix="table_zorder_")
        atexit.register(shutil.rmtree, out_dir, ignore_errors=True)
        orders = t(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_custkey",
            F.floor(F.col("o_totalprice") * 100.0 + 0.5)
            .cast("long")
            .alias("cents"),
        )
        write_manifest_table_zordered(
            orders, out_dir, "o_custkey", "cents", num_files=16
        )
        _ZORD_DIRS[key] = out_dir
    return _ZORD_DIRS[key]


@query(
    "zorder_rectangle_scan",
    """
    WITH src AS (
        SELECT o_orderkey, o_custkey,
               CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
        FROM orders
    ), span AS (
        SELECT MIN(o_custkey) AS ka, MAX(o_custkey) AS kb,
               MIN(cents) AS ca, MAX(cents) AS cb
        FROM src
    )
    SELECT COUNT(*) AS n_orders,
           CAST(SUM(cents) AS BIGINT) / 100.0 AS rect_value,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM src, span
    WHERE o_custkey BETWEEN ka AND ka + (kb - ka) // 4
      AND cents BETWEEN ca AND ca + (cb - ca) // 4
    """,
)
def zorder_rectangle_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.filestats import read_pruned_rect

    path = _zorder_rect_dir(spark, sf_dir)
    span = (
        t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            F.floor(F.col("o_totalprice") * 100.0 + 0.5)
            .cast("long")
            .alias("cents"),
        )
        .agg(
            F.min("o_custkey").alias("ka"),
            F.max("o_custkey").alias("kb"),
            F.min("cents").alias("ca"),
            F.max("cents").alias("cb"),
        )
        .collect()[0]
    )
    ka, kb, ca, cb = (int(span[c]) for c in ("ka", "kb", "ca", "cb"))
    rect = read_pruned_rect(
        spark,
        path,
        ("o_custkey", ka, ka + (kb - ka) // 4),
        ("cents", ca, ca + (cb - ca) // 4),
    )
    return rect.agg(
        F.count(F.lit(1)).alias("n_orders"),
        (F.sum("cents").cast("long") / 100.0).alias("rect_value"),
        F.countDistinct("o_custkey").cast("long").alias("n_customers"),
    )


# ---------------------------------------------------------------------------
# Partition-spec evolution under the oracle gate: v1 writes the odd
# half of orders partitioned by o_orderstatus (the GB-scale layout),
# v2 appends the even half partitioned by order month (the TB-scale
# layout) WITHOUT touching v1's files — per-file partition tuples in
# the manifest, the Iceberg "Partition Evolution" contract. The scan
# predicates on BOTH partition columns: status prunes only files whose
# spec recorded status, month prunes only month-spec files, and the
# residual filter restores exactness on the survivors. The oracle is
# the plain declarative filter over the source table — a file pruned
# under the wrong spec, a tuple recorded against the wrong file, or a
# missing residual breaks the hash. Physical skipping is asserted in
# tests/test_partspec.py.
# ---------------------------------------------------------------------------
_SPEC_DIRS: dict[tuple[str, str], str] = {}
_SPEC_MONTH = "1996-03"


def _partition_spec_dir(spark: SparkSession, sf_dir: str) -> str:
    from ..operators.partspec import write_spec_snapshot

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _SPEC_DIRS:
        out_dir = tempfile.mkdtemp(prefix="partspec_orders_")
        atexit.register(shutil.rmtree, out_dir, ignore_errors=True)
        orders = t(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_orderstatus",
            "o_orderpriority",
            F.date_format("o_orderdate", "yyyy-MM").alias("o_month"),
            F.floor(F.col("o_totalprice") * 100.0 + 0.5)
            .cast("long")
            .alias("cents"),
        )
        write_spec_snapshot(
            orders.filter(F.col("o_orderkey") % 2 == 1),
            out_dir,
            ["o_orderstatus"],
            stats_col="cents",
        )
        write_spec_snapshot(
            orders.filter(F.col("o_orderkey") % 2 == 0),
            out_dir,
            ["o_month"],
            stats_col="cents",
        )
        _SPEC_DIRS[key] = out_dir
    return _SPEC_DIRS[key]


@query(
    "partition_spec_evolution_scan",
    f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) / 100.0 AS total_value
    FROM orders
    WHERE o_orderstatus = 'F'
      AND strftime(o_orderdate, '%Y-%m') = '{_SPEC_MONTH}'
    GROUP BY o_orderpriority
    """,
)
def partition_spec_evolution_scan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.partspec import read_spec_pruned

    path = _partition_spec_dir(spark, sf_dir)
    scan = read_spec_pruned(
        spark, path, {"o_orderstatus": "F", "o_month": _SPEC_MONTH}
    )
    return scan.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        (F.sum("cents").cast("long") / 100.0).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# GDPR erasure cascade under the oracle gate: the right-to-be-forgotten
# propagated THROUGH the table layer. Three manifest tables (customer,
# orders, lineitem) are snapshotted; an erasure set (c_custkey%50=7) is
# cascaded customer -> orders -> lineitem by key joins, and each table
# takes a MERGE-ON-READ tombstone delete — zero data files rewritten,
# which is what erasure must cost at 100 TB until the next compaction
# purges the bytes (compact_snapshot reads through tombstones, so the
# physical purge is the existing maintenance pass). The audit row per
# table reports before/deleted/after counts FROM THE TABLE LAYER (the
# after-count is a real read of the post-delete snapshot) plus an
# orphan count — surviving rows that still reference an erased parent,
# read back through the tombstone filter. The oracle re-derives every
# number declaratively from the source tables; a leaked tombstone, an
# unscoped delete, or a missed cascade level breaks the hash (orphans
# would go nonzero on the Spark side only).
# ---------------------------------------------------------------------------
_GDPR_DIRS: dict[tuple[str, str], str] = {}


def _gdpr_tables_dir(spark: SparkSession, sf_dir: str) -> str:
    from ..operators.manifest import (
        delete_from_snapshot,
        write_manifest_table,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _GDPR_DIRS:
        out_dir = tempfile.mkdtemp(prefix="gdpr_tables_")
        atexit.register(shutil.rmtree, out_dir, ignore_errors=True)
        cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
        orders = t(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey"
        )
        li = t(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_quantity"
        )
        write_manifest_table(cust, f"{out_dir}/customer", "c_custkey", 4)
        write_manifest_table(orders, f"{out_dir}/orders", "o_orderkey", 8)
        write_manifest_table(li, f"{out_dir}/lineitem", "l_orderkey", 8)
        erased = cust.filter(F.col("c_custkey") % 50 == 7).select(
            "c_custkey"
        )
        erased_orders = (
            orders.join(
                F.broadcast(erased),
                orders.o_custkey == erased.c_custkey,
                "left_semi",
            )
            .select("o_orderkey")
        )
        erased_li_keys = erased_orders.select(
            F.col("o_orderkey").alias("l_orderkey")
        )
        delete_from_snapshot(
            spark, f"{out_dir}/customer", "c_custkey", erased
        )
        delete_from_snapshot(
            spark, f"{out_dir}/orders", "o_orderkey", erased_orders
        )
        delete_from_snapshot(
            spark, f"{out_dir}/lineitem", "l_orderkey", erased_li_keys
        )
        _GDPR_DIRS[key] = out_dir
    return _GDPR_DIRS[key]


@query(
    "gdpr_erasure_audit",
    """
    WITH erased AS (
        SELECT c_custkey FROM customer WHERE c_custkey % 50 = 7
    ),
    eo AS (
        SELECT o_orderkey FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM erased)
    )
    SELECT * FROM (
        SELECT 'customer' AS table_name,
               (SELECT COUNT(*) FROM customer) AS rows_before,
               (SELECT COUNT(*) FROM erased) AS rows_deleted,
               (SELECT COUNT(*) FROM customer)
                   - (SELECT COUNT(*) FROM erased) AS rows_after,
               0 AS orphans
        UNION ALL
        SELECT 'orders',
               (SELECT COUNT(*) FROM orders),
               (SELECT COUNT(*) FROM eo),
               (SELECT COUNT(*) FROM orders)
                   - (SELECT COUNT(*) FROM eo),
               0
        UNION ALL
        SELECT 'lineitem',
               (SELECT COUNT(*) FROM lineitem),
               (SELECT COUNT(*) FROM lineitem
                WHERE l_orderkey IN (SELECT o_orderkey FROM eo)),
               (SELECT COUNT(*) FROM lineitem)
                   - (SELECT COUNT(*) FROM lineitem
                      WHERE l_orderkey IN (SELECT o_orderkey FROM eo)),
               0
    ) ORDER BY table_name
    """,
)
def gdpr_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.manifest import read_snapshot

    path = _gdpr_tables_dir(spark, sf_dir)
    erased = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 50 == 7)
        .select("c_custkey")
    )
    from ..operators.manifest import snapshot_row_count

    # v1 predates every tombstone, so the before-counts come straight
    # from the manifest's per-file row counts — zero data reads (the
    # count-from-metadata fast path); the after-counts pay one
    # tombstone-filtered union job across all three tables
    survivors = {
        name: read_snapshot(spark, f"{path}/{name}")
        for name in ("customer", "orders", "lineitem")
    }
    counts = {
        (name, "before"): snapshot_row_count(
            spark, f"{path}/{name}", version=1
        )
        for name in ("customer", "orders", "lineitem")
    }
    legs = [
        survivors[name].select(
            F.lit(name).alias("tbl"), F.lit("after").alias("phase")
        )
        for name in ("customer", "orders", "lineitem")
    ]
    union = legs[0]
    for leg in legs[1:]:
        union = union.unionByName(leg)
    after_agg = union.groupBy("tbl", "phase").agg(
        F.count(F.lit(1)).alias("n")
    )
    # orphan audit: surviving children that still reference an erased
    # parent, read back THROUGH the tombstone filter on both levels
    orphan_orders_df = survivors["orders"].join(
        F.broadcast(erased),
        survivors["orders"].o_custkey == erased.c_custkey,
        "left_semi",
    )
    live_orderkeys = survivors["orders"].select("o_orderkey")
    orphan_li_df = survivors["lineitem"].join(
        live_orderkeys,
        survivors["lineitem"].l_orderkey == live_orderkeys.o_orderkey,
        "left_anti",
    )
    # The after-count union and the two orphan counts are independent
    # actions; submit them from a small thread pool so the scheduler
    # overlaps the three jobs (each job's tail backfills the others'
    # executors) instead of running them back to back.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=3) as pool:
        f_after = pool.submit(after_agg.collect)
        f_oo = pool.submit(orphan_orders_df.count)
        f_ol = pool.submit(orphan_li_df.count)
        after_rows = f_after.result()
        orphan_orders = f_oo.result()
        orphan_li = f_ol.result()
    counts.update(
        {(r["tbl"], r["phase"]): r["n"] for r in after_rows}
    )
    orphans = {"customer": 0, "orders": orphan_orders, "lineitem": orphan_li}
    data = [
        (
            name,
            counts[(name, "before")],
            counts[(name, "before")] - counts[(name, "after")],
            counts[(name, "after")],
            orphans[name],
        )
        for name in ("customer", "orders", "lineitem")
    ]
    return spark.createDataFrame(
        data,
        "table_name string, rows_before bigint, rows_deleted bigint,"
        " rows_after bigint, orphans bigint",
    ).orderBy("table_name")


# ---------------------------------------------------------------------------
# Optimistic-concurrency branch publish under the oracle gate: three
# writers stage append branches against the SAME base (v1 = orderkeys
# <= q). alpha appends (q, 2q] and publishes first; beta staged an
# overlapping range (q + q/2, 2q + q/2] and must be REFUSED at commit
# validation (write-write conflict on the key interval); gamma staged
# the disjoint (3q, m] and REBASES onto alpha's commit (directory
# rename, zero data rewritten). The audit reports each branch's staged
# row count and the table's row count after its publish attempt, all
# read back from the table layer; the oracle re-derives the counts
# declaratively and pins the expected statuses — a false conflict, a
# missed conflict, or a rebase that dropped/duplicated rows breaks the
# hash. Physical claims (rename not rewrite, conflict leaves the table
# untouched) are pytest-asserted in tests/test_manifest_branches.py.
# ---------------------------------------------------------------------------
_WAP_AUDITS: dict[tuple[str, str], list] = {}


def _wap_branch_audit(spark: SparkSession, sf_dir: str) -> list:
    from ..operators.manifest import (
        abort_branch,
        publish_branch,
        read_snapshot,
        stage_branch,
        write_manifest_table,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _WAP_AUDITS:
        out_dir = tempfile.mkdtemp(prefix="wap_branches_")
        atexit.register(shutil.rmtree, out_dir, ignore_errors=True)
        orders = t(spark, sf_dir, "orders").select(
            "o_orderkey",
            F.floor(F.col("o_totalprice") * 100.0 + 0.5)
            .cast("long")
            .alias("cents"),
        )
        m = orders.agg(F.max("o_orderkey")).collect()[0][0]
        q = m // 4
        write_manifest_table(
            orders.filter(F.col("o_orderkey") <= q), out_dir, "o_orderkey", 4
        )
        ranges = {
            "alpha": (q, 2 * q),
            "beta": (q + q // 2, 2 * q + q // 2),
            "gamma": (3 * q, m),
        }
        staged_rows = {}
        for name, (lo, hi) in ranges.items():
            part = orders.filter(
                (F.col("o_orderkey") > lo) & (F.col("o_orderkey") <= hi)
            )
            staged_rows[name] = part.count()
            stage_branch(part, out_dir, "o_orderkey", name, num_files=2)
        audit = []
        for name in ("alpha", "beta", "gamma"):
            v, status = publish_branch(spark, out_dir, name)
            if status == "conflict":
                abort_branch(spark, out_dir, name)
            table_rows = read_snapshot(spark, out_dir).count()
            audit.append((name, status, staged_rows[name], table_rows))
        _WAP_AUDITS[key] = audit
    return _WAP_AUDITS[key]


@query(
    "wap_branch_publish_audit",
    """
    WITH b AS (
        SELECT MAX(o_orderkey) // 4 AS q, MAX(o_orderkey) AS m
        FROM orders
    ),
    counts AS (
        SELECT
            (SELECT COUNT(*) FROM orders, b
             WHERE o_orderkey <= q) AS base_n,
            (SELECT COUNT(*) FROM orders, b
             WHERE o_orderkey > q AND o_orderkey <= 2 * q) AS alpha_n,
            (SELECT COUNT(*) FROM orders, b
             WHERE o_orderkey > q + q // 2
               AND o_orderkey <= 2 * q + q // 2) AS beta_n,
            (SELECT COUNT(*) FROM orders, b
             WHERE o_orderkey > 3 * q AND o_orderkey <= m) AS gamma_n
    )
    SELECT * FROM (
        SELECT 'alpha' AS branch, 'published' AS status,
               alpha_n AS branch_rows,
               base_n + alpha_n AS table_rows_after
        FROM counts
        UNION ALL
        SELECT 'beta', 'conflict', beta_n, base_n + alpha_n FROM counts
        UNION ALL
        SELECT 'gamma', 'rebased', gamma_n,
               base_n + alpha_n + gamma_n
        FROM counts
    ) ORDER BY branch
    """,
)
def wap_branch_publish_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    audit = _wap_branch_audit(spark, sf_dir)
    return spark.createDataFrame(
        audit,
        "branch string, status string, branch_rows bigint,"
        " table_rows_after bigint",
    ).orderBy("branch")


# ---------------------------------------------------------------------------
# Band scan over the spec-evolved table: tuple pruning AND per-file
# column stats compose — the status predicate prunes status-spec files,
# and within the survivors the cents band skips files whose recorded
# [min, max] miss it (the v1 writes are range-clustered per tuple only
# by arrival, so stats skipping is the only lever a non-partition
# column has). The oracle is the plain declarative filter; both-axis
# physical skipping is asserted in tests/test_partspec.py.
# ---------------------------------------------------------------------------
_SPEC_BAND_LO, _SPEC_BAND_HI = 100_00, 20_000_00  # $100 .. $20,000


@query(
    "partition_spec_band_scan",
    f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) / 100.0 AS band_value
    FROM orders
    WHERE o_orderstatus = 'F'
      AND CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
          BETWEEN {_SPEC_BAND_LO} AND {_SPEC_BAND_HI}
    GROUP BY o_orderpriority
    """,
)
def partition_spec_band_scan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.partspec import read_spec_pruned

    path = _partition_spec_dir(spark, sf_dir)
    scan = read_spec_pruned(
        spark,
        path,
        {"o_orderstatus": "F"},
        band=("cents", _SPEC_BAND_LO, _SPEC_BAND_HI),
    )
    return scan.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        (F.sum("cents").cast("long") / 100.0).alias("band_value"),
    )


# ---------------------------------------------------------------------------
# Bucket-transform scan (round 10; VERDICT r09 item 5): the Iceberg
# bucket(N,col) partition transform applied to the HIGH-CARDINALITY
# key the identity spec cannot handle — the reference partitions
# datasets by image_name/item_id (TrainDatasets.py:383-385, its own
# TODO regrets it), which at 100 TB means either one directory per key
# (a metadata storm) or no pruning at all. bucket(16,o_custkey) caps
# the directory count at 16 FOREVER while an equality predicate still
# prunes to ONE bucket: the writer materializes
# pmod(hash(cast(key AS string)), 16) via Spark's own hash, the read
# path maps the literal through the SAME hash (a one-row job), and the
# residual filter restores exactness for the other keys sharing the
# bucket. Two snapshots (odd/even orderkeys) exercise appends into the
# same bucket space. The oracle is the plain declarative filter over
# the source table; a write/read hash disagreement, a mis-recorded
# tuple, or a missing residual breaks the hash. Physical one-bucket
# pruning is asserted in tests/test_partspec.py.
# ---------------------------------------------------------------------------
_SPEC_BUCKET_DIRS: dict[tuple[str, str], str] = {}


def _spec_bucket_dir(spark: SparkSession, sf_dir: str) -> str:
    from ..operators.partspec import write_spec_snapshot

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _SPEC_BUCKET_DIRS:
        out_dir = tempfile.mkdtemp(prefix="partspec_bucket_")
        atexit.register(shutil.rmtree, out_dir, ignore_errors=True)
        orders = t(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_custkey",
            "o_orderpriority",
            F.floor(F.col("o_totalprice") * 100.0 + 0.5)
            .cast("long")
            .alias("cents"),
        )
        write_spec_snapshot(
            orders.filter(F.col("o_orderkey") % 2 == 1),
            out_dir,
            ["bucket(16,o_custkey)"],
        )
        write_spec_snapshot(
            orders.filter(F.col("o_orderkey") % 2 == 0),
            out_dir,
            ["bucket(16,o_custkey)"],
        )
        _SPEC_BUCKET_DIRS[key] = out_dir
    return _SPEC_BUCKET_DIRS[key]


@query(
    "partition_spec_bucket_scan",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) / 100.0 AS cust_value
    FROM orders
    WHERE o_custkey = (SELECT MIN(o_custkey) FROM orders)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def partition_spec_bucket_scan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.partspec import read_spec_pruned

    path = _spec_bucket_dir(spark, sf_dir)
    key = int(
        t(spark, sf_dir, "orders").agg(F.min("o_custkey")).collect()[0][0]
    )
    scan = read_spec_pruned(spark, path, {"o_custkey": key})
    return (
        scan.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum("cents").cast("long") / 100.0).alias("cust_value"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Hilbert-curve rectangle scan (round 10; VERDICT r09 item 8): the same
# two-axis table as zorder_rectangle_scan laid out by the HILBERT
# position instead of the Morton interleave. Every unit step along a
# Hilbert curve is a unit grid step, so equal-length curve segments
# (= files) cover squarer regions and fewer files straddle a query
# rectangle — measured head-to-head against Morton on the same
# harness in tests/test_layout.py (aggregate keep set strictly
# smaller). The result is layout-independent (the residual filter
# restores exactness), so the oracle is the same declarative
# rectangle aggregate — what the layout changes is only WHICH files
# open, asserted physically in pytest.
# ---------------------------------------------------------------------------
_HILBERT_DIRS: dict[tuple[str, str], str] = {}


def _hilbert_rect_dir(spark: SparkSession, sf_dir: str) -> str:
    from ..operators.filestats import write_manifest_table_zordered

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _HILBERT_DIRS:
        out_dir = tempfile.mkdtemp(prefix="table_hilbert_")
        atexit.register(shutil.rmtree, out_dir, ignore_errors=True)
        orders = t(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_custkey",
            F.floor(F.col("o_totalprice") * 100.0 + 0.5)
            .cast("long")
            .alias("cents"),
        )
        write_manifest_table_zordered(
            orders, out_dir, "o_custkey", "cents",
            num_files=16, curve="hilbert",
        )
        _HILBERT_DIRS[key] = out_dir
    return _HILBERT_DIRS[key]


@query(
    "hilbert_rectangle_scan",
    """
    WITH src AS (
        SELECT o_orderkey, o_custkey,
               CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
        FROM orders
    ), span AS (
        SELECT MIN(o_custkey) AS ka, MAX(o_custkey) AS kb,
               MIN(cents) AS ca, MAX(cents) AS cb
        FROM src
    )
    SELECT COUNT(*) AS n_orders,
           CAST(SUM(cents) AS BIGINT) / 100.0 AS rect_value,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM src, span
    WHERE o_custkey BETWEEN ka + (kb - ka) // 2 AND ka + 3 * (kb - ka) // 4
      AND cents BETWEEN ca + (cb - ca) // 2 AND ca + 3 * (cb - ca) // 4
    """,
)
def hilbert_rectangle_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.filestats import read_pruned_rect

    path = _hilbert_rect_dir(spark, sf_dir)
    span = (
        t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            F.floor(F.col("o_totalprice") * 100.0 + 0.5)
            .cast("long")
            .alias("cents"),
        )
        .agg(
            F.min("o_custkey").alias("ka"),
            F.max("o_custkey").alias("kb"),
            F.min("cents").alias("ca"),
            F.max("cents").alias("cb"),
        )
        .collect()[0]
    )
    ka, kb, ca, cb = (int(span[c]) for c in ("ka", "kb", "ca", "cb"))
    rect = read_pruned_rect(
        spark,
        path,
        ("o_custkey", ka + (kb - ka) // 2, ka + 3 * (kb - ka) // 4),
        ("cents", ca + (cb - ca) // 2, ca + 3 * (cb - ca) // 4),
    )
    return rect.agg(
        F.count(F.lit(1)).alias("n_orders"),
        (F.sum("cents").cast("long") / 100.0).alias("rect_value"),
        F.countDistinct("o_custkey").cast("long").alias("n_customers"),
    )


# ---------------------------------------------------------------------------
# Positional deletion vectors under the oracle gate (round 10; VERDICT
# r09 item 8): the WIDE-delete shape. A manifest table of orders takes
# a merge-on-read positional delete of every 'F'-status row —
# operators/posdeletes records per-file (pos_start, pos_end) RUNS from
# Spark's native _metadata.row_index (zero data files rewritten,
# sidecar size O(runs) not O(deleted rows)) — and the audit reads the
# survivor state back THROUGH the DV filter: per-priority counts and
# values, plus before/after totals from the table layer (the before
# total is the count-from-metadata fast path on v1). The oracle
# re-derives everything declaratively from the source table; a
# position off by one, a run boundary bug, or a DV leaking across
# versions breaks the hash. Physical zero-rewrite, RLE compression,
# merge/compaction interplay and GC are pytest-asserted
# (tests/test_posdeletes.py).
# ---------------------------------------------------------------------------
_DV_DIRS: dict[tuple[str, str], str] = {}


def _dv_orders_dir(spark: SparkSession, sf_dir: str) -> str:
    from ..operators.manifest import write_manifest_table
    from ..operators.posdeletes import delete_where

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _DV_DIRS:
        out_dir = tempfile.mkdtemp(prefix="dv_orders_")
        atexit.register(shutil.rmtree, out_dir, ignore_errors=True)
        orders = t(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_orderstatus",
            "o_orderpriority",
            F.floor(F.col("o_totalprice") * 100.0 + 0.5)
            .cast("long")
            .alias("cents"),
        )
        write_manifest_table(orders, out_dir, "o_orderkey", num_files=8)
        delete_where(spark, out_dir, "o_orderstatus = 'F'")
        _DV_DIRS[key] = out_dir
    return _DV_DIRS[key]


@query(
    "dv_position_delete_audit",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) / 100.0 AS surv_value,
           (SELECT COUNT(*) FROM orders) AS rows_before,
           (SELECT COUNT(*) FROM orders
            WHERE o_orderstatus <> 'F') AS rows_after
    FROM orders
    WHERE o_orderstatus <> 'F'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def dv_position_delete_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.manifest import read_snapshot, snapshot_row_count

    path = _dv_orders_dir(spark, sf_dir)
    before = snapshot_row_count(spark, path, version=1)  # metadata-only
    after = snapshot_row_count(spark, path)  # through the DV filter
    surv = read_snapshot(spark, path)
    return (
        surv.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum("cents").cast("long") / 100.0).alias("surv_value"),
        )
        .withColumn("rows_before", F.lit(before))
        .withColumn("rows_after", F.lit(after))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Merge-on-read MERGE (round 10, second session): the Iceberg v2 upsert
# shape. A manifest table of orders takes a merge_on_read batch — half
# UPDATES (every 97th key, value doubled, status 'U'), half INSERTS (50
# brand-new keys past max) — matched rows die by positional DV runs and
# the batch appends as new files; NO existing file is rewritten. The
# audit reads the upserted state back through the DV filter (per-status
# counts and values) and carries the no-rewrite property in-plan:
# n_files_rewritten counts v1 manifest files absent from v2 (must be 0;
# the DuckDB oracle pins the literal while re-deriving every value from
# a declarative upsert). The CoW/MoR read-equivalence, zero-rewrite
# byte-identity, pruned victim scan, claim/failure paths are
# pytest-asserted (test_posdeletes.py, test_concurrency.py).
# ---------------------------------------------------------------------------
_MOR_DIRS: dict[tuple[str, str], str] = {}


def _mor_merge_dir(spark: SparkSession, sf_dir: str) -> str:
    from ..operators.manifest import write_manifest_table
    from ..operators.posdeletes import merge_on_read

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _MOR_DIRS:
        out_dir = tempfile.mkdtemp(prefix="mor_merge_")
        atexit.register(shutil.rmtree, out_dir, ignore_errors=True)
        base = t(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("status"),
            F.floor(F.col("o_totalprice") * 100.0 + 0.5)
            .cast("long")
            .alias("cents"),
        )
        write_manifest_table(base, out_dir, "k", num_files=8)
        maxk = base.agg(F.max("k")).first()[0]
        matched = base.filter(F.col("k") % 97 == 0).select(
            "k",
            F.lit("U").alias("status"),
            (F.col("cents") * 2).alias("cents"),
        )
        inserts = spark.range(1, 51).select(
            (F.lit(maxk) + F.col("id")).alias("k"),
            F.lit("N").alias("status"),
            (F.col("id") * 1000).alias("cents"),
        )
        merge_on_read(
            spark, out_dir, matched.unionByName(inserts), "k"
        )
        _MOR_DIRS[key] = out_dir
    return _MOR_DIRS[key]


@query(
    "mor_merge_audit",
    """
    WITH base AS (
        SELECT o_orderkey AS k, o_orderstatus AS status,
               CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
        FROM orders
    ), upd AS (
        SELECT k, 'U' AS status, cents * 2 AS cents
        FROM base WHERE k % 97 = 0
        UNION ALL
        SELECT maxk + i, 'N', i * 1000
        FROM generate_series(1, 50) AS g(i),
             (SELECT MAX(k) AS maxk FROM base)
    ), final AS (
        SELECT * FROM upd
        UNION ALL
        SELECT * FROM base WHERE k NOT IN (SELECT k FROM upd)
    )
    SELECT status,
           COUNT(*) AS n_rows,
           CAST(SUM(cents) AS BIGINT) / 100.0 AS total_value,
           CAST(0 AS BIGINT) AS n_files_rewritten
    FROM final
    GROUP BY status
    ORDER BY status
    """,
)
def mor_merge_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.manifest import read_snapshot

    path = _mor_merge_dir(spark, sf_dir)
    man = spark.read.parquet(f"{path}/_manifest")
    # one manifest collect for both versions (guide §2.6 class: the two
    # filtered collects were two sequential driver-blocking jobs on the
    # same tiny sidecar)
    vf = man.filter(F.col("v").isin(1, 2)).select("v", "file").collect()
    v1 = {r["file"] for r in vf if r["v"] == 1}
    v2 = {r["file"] for r in vf if r["v"] == 2}
    rewritten = len(v1 - v2)  # MoR contract: every v1 file carried
    surv = read_snapshot(spark, path)
    return (
        surv.groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.sum("cents").cast("long") / 100.0).alias("total_value"),
        )
        .withColumn(
            "n_files_rewritten", F.lit(rewritten).cast("long")
        )
        .orderBy("status")
    )


# ---------------------------------------------------------------------------
# DVs x schema evolution under one reader (round 10, second session —
# the round-11 lead from COVERAGE): metadata-only ALTERs (add with SQL
# default, rename) and a positional DV delete issued BETWEEN them must
# compose in read_snapshot_evolved — the evolved scan replays per
# file-origin events AND stitches (file, position) runs on the same
# pass. The oracle re-derives the final frame declaratively; a DV
# filtering the pre-rename column name, a rename failing to forward-map
# over DV-surviving rows, or the added default leaking onto deleted
# rows all break the hash.
# ---------------------------------------------------------------------------
_DVEVO_DIRS: dict[tuple[str, str], str] = {}


def _dv_evolution_dir(spark: SparkSession, sf_dir: str) -> str:
    from ..operators.manifest import (
        add_column,
        rename_column,
        write_manifest_table,
    )
    from ..operators.posdeletes import delete_where

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _DVEVO_DIRS:
        out_dir = tempfile.mkdtemp(prefix="dv_evo_")
        atexit.register(shutil.rmtree, out_dir, ignore_errors=True)
        base = t(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("status"),
            F.floor(F.col("o_totalprice") * 100.0 + 0.5)
            .cast("long")
            .alias("cents"),
        )
        write_manifest_table(base, out_dir, "k", num_files=8)  # v1
        add_column(spark, out_dir, "src", "string", "'legacy'")  # v2
        delete_where(spark, out_dir, "status = 'F'")  # v3: DV runs
        rename_column(spark, out_dir, "cents", "cents_v2")  # v4
        _DVEVO_DIRS[key] = out_dir
    return _DVEVO_DIRS[key]


@query(
    "dv_schema_evolution_scan",
    """
    SELECT o_orderstatus AS status,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) / 100.0 AS total_value,
           'legacy' AS src
    FROM orders
    WHERE o_orderstatus <> 'F'
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def dv_schema_evolution_scan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.manifest import read_snapshot_evolved

    path = _dv_evolution_dir(spark, sf_dir)
    got = read_snapshot_evolved(spark, path)
    return (
        got.groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.sum("cents_v2").cast("long") / 100.0).alias(
                "total_value"
            ),
            F.min("src").alias("src"),
        )
        .orderBy("status")
    )


# ---------------------------------------------------------------------------
# Shallow clone divergence (round 10, second session): the O(metadata)
# table fork. orders becomes a manifest table, loses its 'F' rows to a
# DV delete, then is SHALLOW-CLONED (zero data bytes copied — the clone
# manifest references src's files; pytest asserts the no-copy and
# origin-arithmetic properties in test_clone.py). The two tables then
# DIVERGE: the clone upserts every 97th key via merge_on_read while src
# appends 50 brand-new rows. The audit unions per-table per-status
# aggregates; the oracle re-derives both final states declaratively —
# a clone seeing src's append, src seeing the clone's upsert, or the
# frozen DV state leaking either way all break the hash.
# ---------------------------------------------------------------------------
_CLONE_DIRS: dict[tuple[str, str], tuple[str, str]] = {}


def _clone_pair_dirs(
    spark: SparkSession, sf_dir: str
) -> tuple[str, str]:
    from ..operators.manifest import (
        append_snapshot,
        shallow_clone,
        write_manifest_table,
    )
    from ..operators.posdeletes import delete_where, merge_on_read

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _CLONE_DIRS:
        src_dir = tempfile.mkdtemp(prefix="clone_src_q_")
        dst_dir = tempfile.mkdtemp(prefix="clone_dst_q_") + "/t"
        atexit.register(shutil.rmtree, src_dir, ignore_errors=True)
        atexit.register(
            shutil.rmtree, os.path.dirname(dst_dir), ignore_errors=True
        )
        base = t(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("status"),
            F.floor(F.col("o_totalprice") * 100.0 + 0.5)
            .cast("long")
            .alias("cents"),
        )
        write_manifest_table(base, src_dir, "k", num_files=8)  # v1
        delete_where(spark, src_dir, "status = 'F'")  # v2 (DV)
        shallow_clone(spark, src_dir, dst_dir)  # clone born at v2
        # clone diverges: upsert every 97th surviving key
        upd = base.filter(
            (F.col("k") % 97 == 0) & (F.col("status") != "F")
        ).select(
            "k",
            F.lit("U").alias("status"),
            (F.col("cents") * 2).alias("cents"),
        )
        merge_on_read(spark, dst_dir, upd, "k")
        # src diverges: append 50 new rows
        maxk = base.agg(F.max("k")).first()[0]
        news = spark.range(1, 51).select(
            (F.lit(maxk) + F.col("id")).alias("k"),
            F.lit("A").alias("status"),
            (F.col("id") * 500).alias("cents"),
        )
        append_snapshot(news, src_dir, "k")
        _CLONE_DIRS[key] = (src_dir, dst_dir)
    return _CLONE_DIRS[key]


@query(
    "shallow_clone_divergence",
    """
    WITH base AS (
        SELECT o_orderkey AS k, o_orderstatus AS status,
               CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
        FROM orders
    ), surv AS (
        SELECT * FROM base WHERE status <> 'F'
    ), src_final AS (
        SELECT status, cents FROM surv
        UNION ALL
        SELECT 'A', i * 500
        FROM generate_series(1, 50) AS g(i),
             (SELECT MAX(k) AS maxk FROM base)
    ), clone_final AS (
        SELECT CASE WHEN k % 97 = 0 THEN 'U' ELSE status END AS status,
               CASE WHEN k % 97 = 0 THEN cents * 2 ELSE cents END AS cents
        FROM surv
    )
    SELECT tbl, status, n_rows, total_value FROM (
        SELECT 'clone' AS tbl, status, COUNT(*) AS n_rows,
               CAST(SUM(cents) AS BIGINT) / 100.0 AS total_value
        FROM clone_final GROUP BY status
        UNION ALL
        SELECT 'src', status, COUNT(*),
               CAST(SUM(cents) AS BIGINT) / 100.0
        FROM src_final GROUP BY status
    )
    ORDER BY tbl, status
    """,
)
def shallow_clone_divergence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.manifest import read_snapshot

    src_dir, dst_dir = _clone_pair_dirs(spark, sf_dir)

    def agg(path: str, tbl: str) -> DataFrame:
        return (
            read_snapshot(spark, path)
            .groupBy("status")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                (F.sum("cents").cast("long") / 100.0).alias(
                    "total_value"
                ),
            )
            .withColumn("tbl", F.lit(tbl))
        )

    return (
        agg(dst_dir, "clone")
        .unionByName(agg(src_dir, "src"))
        .select("tbl", "status", "n_rows", "total_value")
        .orderBy("tbl", "status")
    )


# ---------------------------------------------------------------------------
# Snapshot metadata report (round 10, second session): the Iceberg
# `tbl.snapshots`/`files` metadata-table parity — per-version file
# counts, live row counts and merge-on-read delete DEBT, all answered
# from the table layer's own metadata (manifest rows, count-from-
# manifest fast path, DV run lengths). Built over a 3-version orders
# table (write 8 files -> DV-delete 'F' rows -> append 4 files); the
# oracle re-derives live/dead rows from the source table and pins the
# deterministic file counts, so a manifest carrying the wrong rows, a
# row-count fast path ignoring debt, or DV run-length bookkeeping
# drift all break the hash. The observability story a 100 TB table
# needs before anyone trusts expire/compact decisions.
# ---------------------------------------------------------------------------
_METRICS_DIRS: dict[tuple[str, str], str] = {}


def _metrics_table_dir(spark: SparkSession, sf_dir: str) -> str:
    from ..operators.manifest import (
        append_snapshot,
        write_manifest_table,
    )
    from ..operators.posdeletes import delete_where

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _METRICS_DIRS:
        out_dir = tempfile.mkdtemp(prefix="tbl_metrics_")
        atexit.register(shutil.rmtree, out_dir, ignore_errors=True)
        base = t(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("status"),
        )
        write_manifest_table(base, out_dir, "k", num_files=8)  # v1
        delete_where(spark, out_dir, "status = 'F'")  # v2
        maxk = base.agg(F.max("k")).first()[0]
        news = spark.range(1, 51).select(
            (F.lit(maxk) + F.col("id")).alias("k"),
            F.lit("A").alias("status"),
        )
        append_snapshot(news, out_dir, "k", num_files=4)  # v3
        _METRICS_DIRS[key] = out_dir
    return _METRICS_DIRS[key]


@query(
    "table_snapshots_metadata",
    """
    WITH tot AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                    AS BIGINT) AS f
        FROM orders
    )
    SELECT version, n_files, live_rows, dead_rows FROM (
        SELECT 1 AS version, CAST(8 AS BIGINT) AS n_files,
               n AS live_rows, CAST(0 AS BIGINT) AS dead_rows FROM tot
        UNION ALL
        SELECT 2, CAST(8 AS BIGINT), n - f, f FROM tot
        UNION ALL
        SELECT 3, CAST(12 AS BIGINT), n - f + 50, f FROM tot
    )
    ORDER BY version
    """,
)
def table_snapshots_metadata(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.manifest import snapshot_row_count, versions
    from ..operators.posdeletes import _pos_delete_runs

    path = _metrics_table_dir(spark, sf_dir)
    man = spark.read.parquet(f"{path}/_manifest")
    files_by_v = {
        int(r["v"]): int(r["nf"])
        for r in man.groupBy("v")
        .agg(F.count(F.lit(1)).alias("nf"))
        .collect()
    }
    rows = []
    for v in versions(spark, path):
        runs = _pos_delete_runs(spark, path, v)
        dead = (
            0
            if runs is None
            else int(
                runs.agg(
                    F.sum(
                        F.col("pos_end") - F.col("pos_start") + 1
                    )
                ).first()[0]
            )
        )
        rows.append(
            (
                v,
                files_by_v[v],
                snapshot_row_count(spark, path, v),
                dead,
            )
        )
    return spark.createDataFrame(
        rows,
        "version int, n_files bigint, live_rows bigint, dead_rows bigint",
    ).orderBy("version")


# ---------------------------------------------------------------------------
# Selective small-file compaction (round 10, second session): the
# steady-state maintenance loop — a CDC/streaming writer accretes tiny
# files; `compact_small_files` rewrites ONLY those (planned from the
# manifest alone), reads them through the visible delete debt, and
# carries every big file verbatim. The audit checks the surviving
# values by status AND the physical plan of the table: exactly the 8
# original big files carried + 1 new compacted file (pinned as
# literals in the value hash), with the DV delete issued before the
# compaction still honored. Byte-identity of carried files and
# debt-scoping are pytest-asserted (test_posdeletes.py).
# ---------------------------------------------------------------------------
_SFC_DIRS: dict[tuple[str, str], str] = {}


def _sfc_table_dir(spark: SparkSession, sf_dir: str) -> str:
    from ..operators.manifest import (
        append_snapshot,
        compact_small_files,
        write_manifest_table,
    )
    from ..operators.posdeletes import delete_where

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _SFC_DIRS:
        out_dir = tempfile.mkdtemp(prefix="sfc_orders_")
        atexit.register(shutil.rmtree, out_dir, ignore_errors=True)
        base = t(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("status"),
            F.floor(F.col("o_totalprice") * 100.0 + 0.5)
            .cast("long")
            .alias("cents"),
        )
        write_manifest_table(base, out_dir, "k", num_files=8)
        maxk = base.agg(F.max("k")).first()[0]
        for i in range(5):
            batch = spark.range(1 + i * 40, 41 + i * 40).select(
                (F.lit(maxk) + F.col("id")).alias("k"),
                F.lit("S").alias("status"),
                (F.col("id") * 100).alias("cents"),
            )
            append_snapshot(batch, out_dir, "k", num_files=1)
        delete_where(spark, out_dir, "status = 'F'")
        # scale-independent threshold: the 40-row append files are
        # "small", the 8 range-clustered base files (n/8 rows) are not
        n_base = base.count()
        compact_small_files(
            spark,
            out_dir,
            "k",
            target_rows=200,
            small_rows=max(41, n_base // 16),
        )
        _SFC_DIRS[key] = out_dir
    return _SFC_DIRS[key]


@query(
    "small_file_compaction_audit",
    """
    WITH base AS (
        SELECT o_orderkey AS k, o_orderstatus AS status,
               CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
        FROM orders
    ), final AS (
        SELECT status, cents FROM base WHERE status <> 'F'
        UNION ALL
        SELECT 'S', i * 100
        FROM generate_series(1, 200) AS g(i)
    )
    SELECT status,
           COUNT(*) AS n_rows,
           CAST(SUM(cents) AS BIGINT) / 100.0 AS total_value,
           CAST(9 AS BIGINT) AS n_files,
           CAST(8 AS BIGINT) AS n_big_carried
    FROM final
    GROUP BY status
    ORDER BY status
    """,
)
def small_file_compaction_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.manifest import read_snapshot, versions

    path = _sfc_table_dir(spark, sf_dir)
    man = spark.read.parquet(f"{path}/_manifest")
    latest = versions(spark, path)[-1]
    # one manifest collect for both versions (guide §2.6 class: two
    # sequential driver-blocking jobs on the same tiny sidecar)
    vf = (
        man.filter(F.col("v").isin(1, latest)).select("v", "file").collect()
    )
    cur = {r["file"] for r in vf if r["v"] == latest}
    v1 = {r["file"] for r in vf if r["v"] == 1}
    n_files = len(cur)
    n_big = len(cur & v1)
    return (
        read_snapshot(spark, path)
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.sum("cents").cast("long") / 100.0).alias("total_value"),
        )
        .withColumn("n_files", F.lit(n_files).cast("long"))
        .withColumn("n_big_carried", F.lit(n_big).cast("long"))
        .orderBy("status")
    )


# ---------------------------------------------------------------------------
# Incremental APPEND scan + the table-appends streaming source: an
# append-only 3-version table (orders sliced by o_orderkey % 3, one
# slice per commit), consumed two ways against the same declarative
# oracle. The batch query reads "(v1, latest]" — exactly the files
# versions 2 and 3 appended, tagged with their commit version from the
# v=N path (operators/appends.py). The streaming query replays ALL
# versions through spark.readStream.format("table_appends") — Spark 4
# Python DataSource, offsets = committed versions, one micro-batch per
# version under maxVersionsPerTrigger=1 — and must reconstruct every
# slice exactly. A wrong file diff (carried file re-emitted, appended
# file missed) or a version misattribution breaks either hash; the
# non-append guard rails (compaction/delete/restore in range raise)
# are pytest-asserted in tests/test_table_appends.py.
# ---------------------------------------------------------------------------
_APPENDS_DIRS: dict[tuple[str, str], str] = {}


def _appends_table_dir(spark: SparkSession, sf_dir: str) -> str:
    from ..operators.manifest import append_snapshot, write_manifest_table

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _APPENDS_DIRS:
        out_dir = tempfile.mkdtemp(prefix="table_app_")
        atexit.register(shutil.rmtree, out_dir, ignore_errors=True)
        orders = t(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_orderstatus",
            F.floor(F.col("o_totalprice") * 100.0 + 0.5)
            .cast("long")
            .alias("cents"),
        )
        write_manifest_table(
            orders.filter(F.col("o_orderkey") % 3 == 0),
            out_dir,
            "o_orderkey",
            num_files=4,
        )
        for m in (1, 2):
            append_snapshot(
                orders.filter(F.col("o_orderkey") % 3 == m),
                out_dir,
                "o_orderkey",
                num_files=2,
            )
        _APPENDS_DIRS[key] = out_dir
    return _APPENDS_DIRS[key]


@query(
    "table_incremental_appends",
    """
    SELECT CAST(o_orderkey % 3 AS INT) + 1 AS commit_version,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) / 100.0 AS total_value
    FROM orders
    WHERE o_orderkey % 3 <> 0
    GROUP BY 1
    """,
)
def table_incremental_appends(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.appends import read_appends

    path = _appends_table_dir(spark, sf_dir)
    inc = read_appends(spark, path, from_version=1)
    return inc.groupBy(
        F.col("_commit_version").alias("commit_version")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.sum("cents").cast("long") / 100.0).alias("total_value"),
    )


@query(
    "stream_table_appends_replay",
    """
    SELECT CAST(o_orderkey % 3 AS INT) + 1 AS commit_version,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) / 100.0 AS total_value
    FROM orders
    GROUP BY 1
    """,
)
def stream_table_appends_replay(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import uuid

    from ..sources.table_appends_datasource import TableAppendsDataSource

    path = _appends_table_dir(spark, sf_dir)
    try:
        spark.dataSource.register(TableAppendsDataSource)
    except Exception:
        pass  # already registered in this session
    # Aggregate INSIDE each micro-batch (guide §2.3 "aggregate before
    # you shuffle/ship", r13): the memory sink materialized every
    # streamed row on the driver and the final aggregate re-scanned
    # that in-memory table — O(table rows) of driver memory and a
    # second pass, purely to compute three per-version partial sums.
    # foreachBatch folds each trigger to (version, count, cents-sum)
    # partials — exact BIGINT arithmetic, combined per version across
    # batches — so the driver holds O(versions) state regardless of
    # table size. Every row still crosses the Python streaming source
    # (the surface this query exercises); values are identical.
    acc: dict[int, list[int]] = {}

    def _fold(batch_df: DataFrame, _bid: int) -> None:
        for r in (
            batch_df.groupBy("_commit_version")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("cents").cast("long").alias("c"),
            )
            .collect()
        ):
            a = acc.setdefault(int(r["_commit_version"]), [0, 0])
            a[0] += int(r["n"])
            a[1] += int(r["c"])

    q = (
        spark.readStream.format("table_appends")
        .option("path", path)
        .option("maxVersionsPerTrigger", 1)
        .load()
        .writeStream.foreachBatch(_fold)
        .queryName(f"tap_{uuid.uuid4().hex}")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = [(v, n, c / 100.0) for v, (n, c) in sorted(acc.items())]
    return spark.createDataFrame(
        rows, "commit_version int, n_rows bigint, total_value double"
    )
