"""Data-quality validation + snapshot-diff queries.

The validation report is one aggregation pass (conditional aggregates,
with foreign-key orphan counts fused in via broadcast presence flags)
plus one groupBy per uniqueness key; the oracle states each constraint
as an independent SQL aggregate and unions them. The snapshot diff is one full-outer join; the oracle
rebuilds the same status/changed-column logic with IS DISTINCT FROM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.diff import snapshot_diff
from ..operators.validate import (
    Suite,
    accepted_values,
    in_range,
    not_null,
    satisfies,
    validate,
)
from .registry import query
from .relational import t


@query(
    "validate_lineitem",
    """
    WITH tot AS (SELECT COUNT(*) AS total FROM lineitem),
    r AS (
        SELECT 'not_null(l_orderkey)' AS "constraint",
               (SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NULL) AS violations,
               total FROM tot
        UNION ALL
        SELECT 'in_range(l_quantity,1,50)',
               (SELECT COUNT(*) FROM lineitem
                WHERE l_quantity IS NULL OR l_quantity < 1 OR l_quantity > 50),
               total FROM tot
        UNION ALL
        SELECT 'in_range(l_discount,0.0,0.1)',
               (SELECT COUNT(*) FROM lineitem
                WHERE l_discount IS NULL OR l_discount < 0.0 OR l_discount > 0.1),
               total FROM tot
        UNION ALL
        SELECT 'accepted_values(l_returnflag)',
               (SELECT COUNT(*) FROM lineitem
                WHERE l_returnflag IS NULL OR l_returnflag NOT IN ('A', 'N', 'R')),
               total FROM tot
        UNION ALL
        SELECT 'positive_net_price',
               (SELECT COUNT(*) FROM lineitem
                WHERE NOT (l_extendedprice * (1 - l_discount) > 0)),
               total FROM tot
        UNION ALL
        SELECT 'unique(l_orderkey,l_linenumber)',
               (SELECT coalesce(SUM(n - 1), 0) FROM (
                    SELECT COUNT(*) AS n FROM lineitem
                    GROUP BY l_orderkey, l_linenumber) WHERE n > 1),
               total FROM tot
        UNION ALL
        SELECT 'references(l_orderkey)',
               (SELECT COUNT(*) FROM lineitem
                WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)),
               total FROM tot
    )
    SELECT "constraint", CAST(violations AS BIGINT) AS violations, total, violations = 0 AS passed FROM r
    """,
)
def validate_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    suite = (
        Suite()
        .add(not_null("l_orderkey"))
        .add(in_range("l_quantity", 1, 50))
        .add(in_range("l_discount", 0.0, 0.1))
        .add(accepted_values("l_returnflag", ["A", "N", "R"]))
        .add(
            satisfies(
                "positive_net_price",
                F.col("l_extendedprice") * (1 - F.col("l_discount")) > 0,
            )
        )
        .unique("l_orderkey", "l_linenumber")
        .references(["l_orderkey"], orders, ["o_orderkey"])
    )
    return validate(li, suite)


# ---------------------------------------------------------------------------
# Snapshot diff: two deterministic snapshots of orders (old = keys not
# divisible by 5; new = keys not divisible by 7, with totalprice bumped
# on keys divisible by 3) diffed by key.
# ---------------------------------------------------------------------------
@query(
    "snapshot_diff_orders",
    """
    WITH old AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 5 <> 0
    ),
    new AS (
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1 ELSE o_totalprice END AS o_totalprice
        FROM orders WHERE o_orderkey % 7 <> 0
    ),
    j AS (
        SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
               o.o_orderkey IS NOT NULL AS in_old,
               n.o_orderkey IS NOT NULL AS in_new,
               list_sort(list_filter([
                   CASE WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus THEN 'o_orderstatus' END,
                   CASE WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice THEN 'o_totalprice' END
               ], x -> x IS NOT NULL)) AS diffs
        FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    ),
    s AS (
        SELECT o_orderkey,
               CASE WHEN NOT in_old THEN 'added'
                    WHEN NOT in_new THEN 'removed'
                    WHEN len(diffs) > 0 THEN 'changed'
                    ELSE 'unchanged' END AS status,
               CASE WHEN in_old AND in_new AND len(diffs) > 0
                    THEN array_to_string(diffs, ',')
                    ELSE '' END AS changed_cols
        FROM j
    )
    SELECT * FROM s WHERE status <> 'unchanged'
    """,
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    old = orders.filter(F.col("o_orderkey") % 5 != 0)
    new = orders.filter(F.col("o_orderkey") % 7 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") + 1
        ).otherwise(F.col("o_totalprice")),
    )
    # The driver's canonicalizer hashes result cells with pandas factorize,
    # which cannot hash list cells — so the array<string> changed_cols is
    # string-encoded here (the snapshot_diff operator itself keeps the
    # typed array for API consumers).
    return snapshot_diff(old, new, ["o_orderkey"]).withColumn(
        "changed_cols", F.array_join("changed_cols", ",")
    )


# ---------------------------------------------------------------------------
# SCD2 history build from three deterministic snapshot generations of
# orders (v1: keys %5<>0; v2: %7<>0 with price+1 on %3; v3: %11<>0 with
# status->'X' on %2). Value-checks run segmentation, gap-closure
# (delete/reappear), valid_from/valid_to chaining, and is_current.
# The CTE block is shared with temporal_join_scd2 below.
# ---------------------------------------------------------------------------
_SCD2_CTES = """
    s1 AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 5 <> 0
    ),
    s2 AS (
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1
                    ELSE o_totalprice END AS o_totalprice
        FROM orders WHERE o_orderkey % 7 <> 0
    ),
    s3 AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 2 = 0 THEN 'X'
                    ELSE o_orderstatus END AS o_orderstatus,
               CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1
                    ELSE o_totalprice END AS o_totalprice
        FROM orders WHERE o_orderkey % 11 <> 0
    ),
    tagged AS (
        SELECT 1 AS version, * FROM s1
        UNION ALL SELECT 2, * FROM s2
        UNION ALL SELECT 3, * FROM s3
    ),
    seq AS (
        SELECT *,
               CASE WHEN LAG(version) OVER w IS NULL
                      OR LAG(version) OVER w <> version - 1
                      OR LAG(o_orderstatus) OVER w IS DISTINCT FROM o_orderstatus
                      OR LAG(o_totalprice) OVER w IS DISTINCT FROM o_totalprice
                    THEN 1 ELSE 0 END AS new_run
        FROM tagged WINDOW w AS (PARTITION BY o_orderkey ORDER BY version)
    ),
    runs AS (
        SELECT *, SUM(new_run) OVER (PARTITION BY o_orderkey ORDER BY version
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
        FROM seq
    ),
    hist AS (
        SELECT o_orderkey,
               MIN(o_orderstatus) AS o_orderstatus,
               MIN(o_totalprice) AS o_totalprice,
               CAST(MIN(version) AS INT) AS valid_from,
               CAST(CASE WHEN MAX(version) < 3 THEN MAX(version) + 1 END
                    AS INT) AS valid_to,
               MAX(version) = 3 AS is_current
        FROM runs GROUP BY o_orderkey, run
    )"""


@query(
    "scd2_orders_history",
    "WITH"
    + _SCD2_CTES
    + """
    SELECT o_orderkey, o_orderstatus,
           ROUND(o_totalprice, 2) AS o_totalprice,
           valid_from, valid_to, is_current
    FROM hist
    """,
)
def _scd2_history_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared three-generation SCD2 history (see _SCD2_CTES)."""
    from ..operators.diff import scd2_build

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    k = F.col("o_orderkey")
    bump = F.when(k % 3 == 0, F.col("o_totalprice") + 1).otherwise(
        F.col("o_totalprice")
    )
    s1 = orders.filter(k % 5 != 0)
    s2 = orders.filter(k % 7 != 0).withColumn("o_totalprice", bump)
    s3 = (
        orders.filter(k % 11 != 0)
        .withColumn(
            "o_orderstatus",
            F.when(k % 2 == 0, F.lit("X")).otherwise(F.col("o_orderstatus")),
        )
        .withColumn("o_totalprice", bump)
    )
    return scd2_build(
        [(1, s1), (2, s2), (3, s3)],
        keys=["o_orderkey"],
        tracked_cols=["o_orderstatus", "o_totalprice"],
    )


def scd2_orders_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    hist = _scd2_history_df(spark, sf_dir)
    return hist.select(
        "o_orderkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        F.col("valid_from").cast("int").alias("valid_from"),
        F.col("valid_to").cast("int").alias("valid_to"),
        "is_current",
    )


# ---------------------------------------------------------------------------
# Incremental view maintenance in the oracle gate: materialize the
# events rollup from the even-id half, fold the odd-id half in through
# operators.incremental.incremental_rollup (partition-pruned merge of
# stored partials + delta partials), read the table back, and compare
# against a from-scratch full rollup (the oracle). A merge that dropped
# partials, double-counted, or rewrote untouched partitions diverges.
# ---------------------------------------------------------------------------
# avg is derived via exact integer arithmetic (cents = floor(sum*100+.5)
# — sums are within float-noise of exact cent multiples, so the floor is
# stable even though stored-partial+delta and full-recompute sums differ
# in the last bits; a decimal ROUND of sum/n would tie on .xx5 values).
@query(
    "incremental_rollup_events",
    """
    SELECT strftime(ts, '%Y-%m-%d') AS event_date,
           event_type,
           COUNT(*) AS n_events,
           CAST(FLOOR(SUM(value) * 100 + 0.5) AS BIGINT) AS sum_cents,
           CAST(FLOOR(FLOOR(SUM(value) * 100 + 0.5) * 1000.0 / COUNT(*))
                AS BIGINT) AS avg_millicents
    FROM events
    GROUP BY 1, 2
    """,
)
def incremental_rollup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from ..operators.incremental import (
        incremental_rollup,
        init_rollup,
        read_rollup,
    )

    ev = t(spark, sf_dir, "events")
    d = tempfile.mkdtemp(prefix="mlps_ivm_")
    try:
        init_rollup(ev.filter(F.col("event_id") % 2 == 0), d)
        incremental_rollup(spark, d, ev.filter(F.col("event_id") % 2 == 1))
        cents = F.floor(F.col("sum_value") * 100 + 0.5).cast("long")
        out = read_rollup(spark, d).select(
            "event_date",
            "event_type",
            "n_events",
            cents.alias("sum_cents"),
            F.floor(cents * 1000.0 / F.col("n_events"))
            .cast("long")
            .alias("avg_millicents"),
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ---------------------------------------------------------------------------
# Point-in-time (temporal) dimension join — the query SCD2 history
# exists FOR: each fact carries a transaction version (here a
# deterministic l_linenumber-derived version) and must join the
# dimension attributes that were valid AT THAT VERSION, not the current
# ones. Validity intervals per key are disjoint, so the join is a plain
# hash equi-join on the key with the interval predicate evaluated
# in-stage — each fact matches at most one history row; facts whose
# order was absent at their version (deleted / not yet present) surface
# under 'MISSING' instead of silently dropping. Revenue is summed in
# exact integer cents.
# ---------------------------------------------------------------------------
@query(
    "temporal_join_scd2",
    "WITH"
    + _SCD2_CTES
    + """,
    facts AS (
        SELECT l_orderkey, (l_linenumber % 3) + 1 AS v,
               CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                    AS BIGINT) AS cents
        FROM lineitem
    ),
    joined AS (
        SELECT COALESCE(h.o_orderstatus, 'MISSING') AS status_at_version,
               f.cents
        FROM facts f
        LEFT JOIN hist h
          ON h.o_orderkey = f.l_orderkey
         AND h.valid_from <= f.v
         AND (h.valid_to IS NULL OR f.v < h.valid_to)
    )
    SELECT status_at_version,
           COUNT(*) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS revenue_cents
    FROM joined GROUP BY status_at_version
    """,
)
def temporal_join_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    hist = _scd2_history_df(spark, sf_dir).select(
        "o_orderkey", "o_orderstatus", "valid_from", "valid_to"
    )
    facts = t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (F.col("l_linenumber") % 3 + 1).alias("v"),
        F.floor(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
            + 0.5
        )
        .cast("long")
        .alias("cents"),
    )
    joined = facts.join(
        hist,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("valid_from") <= F.col("v"))
        & (F.col("valid_to").isNull() | (F.col("v") < F.col("valid_to"))),
        "left",
    ).select(
        F.coalesce("o_orderstatus", F.lit("MISSING")).alias(
            "status_at_version"
        ),
        "cents",
    )
    return joined.groupBy("status_at_version").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("cents").cast("long").alias("revenue_cents"),
    )


# ---------------------------------------------------------------------------
# Incremental JOIN-view maintenance (operators/incremental.py
# join_view_delta): the orders⋈customer view absorbs an insert batch on
# BOTH sides (new orders: o_orderkey%5=0; new customers: c_custkey%7=0)
# without rescanning the stored view. The oracle derives the SAME delta
# declaratively — a view row is new iff either constituent row is new —
# and the per-term breakdown (a_only / b_only / both) pins the
# disjointness of the three IVM terms, so any double-count or dropped
# mixed term breaks the hash.
# ---------------------------------------------------------------------------
@query(
    "incremental_join_view",
    """
    WITH j AS (
        SELECT c.c_mktsegment,
               (o.o_orderkey % 5 = 0) AS new_a,
               (c.c_custkey % 7 = 0) AS new_b,
               CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE (o.o_orderkey % 5 = 0) OR (c.c_custkey % 7 = 0)
    )
    SELECT c_mktsegment,
           CASE WHEN new_a AND new_b THEN 'both'
                WHEN new_a THEN 'a_only' ELSE 'b_only' END AS delta_term,
           COUNT(*) AS n_rows,
           CAST(SUM(cents) AS BIGINT) / 100.0 AS delta_revenue
    FROM j
    GROUP BY c_mktsegment, delta_term
    """,
)
def incremental_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.incremental import join_view_delta

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").alias("c_custkey"),
        F.floor(F.col("o_totalprice") * 100.0 + 0.5)
        .cast("long")
        .alias("cents"),
    )
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    a_old = orders.filter(F.col("o_orderkey") % 5 != 0)
    delta_a = orders.filter(F.col("o_orderkey") % 5 == 0)
    b_old = cust.filter(F.col("c_custkey") % 7 != 0)
    delta_b = cust.filter(F.col("c_custkey") % 7 == 0)
    dv = join_view_delta(a_old, delta_a, b_old, delta_b, on="c_custkey")
    return dv.groupBy("c_mktsegment", "delta_term").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.sum("cents").cast("long") / 100.0).alias("delta_revenue"),
    )
