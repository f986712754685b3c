"""Portable sketches — engine-agnostic HLL and Count-Min over md5.

Engine-built-in sketches (Spark HLL++, DuckDB approx_count_distinct) can
never hash-match across engines, which is why approx_distinct_users is
an invariant oracle. These two queries close that gap from the other
side: the sketches themselves are HAND-ROLLED from md5 — every register
and counter is deterministic integer/float64 arithmetic — so DuckDB
re-derives the ENTIRE sketch and the estimates are full cross-engine
value oracles. Both are the real 100 TB shapes:

- ``portable_hll_users``: 256-register HyperLogLog per event_type.
  The register table (groupBy(key, bucket).max(rho)) is tiny, mergeable
  (re-aggregating register tables from two partitions/days is just
  another max — the property that makes HLL the distributed-distinct
  workhorse), and the estimate is a closed-form fold over 256 rows.
- ``count_min_user_freq``: depth-4 x width-256 Count-Min frequency
  sketch. The build is ONE explode + ONE groupBy (1024 counter cells
  regardless of stream size); point estimates are min-over-depth
  lookups. Counters are additive — partial sketches merge by summing —
  and the classic one-sided error (estimate >= true count) holds by
  construction and is value-checked here, not just asserted.

Both sketches hash with md5 (no engine RNG), so a register/counter bug
on either engine flips a hashed value and fails the driver compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import query
from .relational import t

# ---------------------------------------------------------------------------
# Portable HyperLogLog: m = 256 registers (8-bit bucket from the first 2
# md5 hex chars), rho = leading-zero rank inside the next 60 bits.
# Small-range (linear-counting) correction applied exactly as published
# (Flajolet et al. 2007): E = m*ln(m/empty) when raw <= 2.5m.
# ---------------------------------------------------------------------------
_HLL_M = 256


@query(
    "portable_hll_users",
    f"""
    WITH h AS (
        SELECT event_type,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 2))::BIGINT
                   AS bucket,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 3, 15))::BIGINT
                   AS w
        FROM events
    ),
    r AS (
        SELECT event_type, bucket,
               MAX(CASE WHEN w = 0 THEN 61 ELSE 61 - len(bin(w)) END) AS m_j
        FROM h GROUP BY event_type, bucket
    ),
    p AS (
        SELECT event_type, COUNT(*) AS v, SUM(power(2.0, -m_j)) AS s_present
        FROM r GROUP BY event_type
    ),
    e AS (
        SELECT event_type, v,
               (0.7213 / (1 + 1.079 / {_HLL_M})) * {_HLL_M} * {_HLL_M}
                   / (s_present + ({_HLL_M} - v)) AS raw
        FROM p
    ),
    x AS (
        SELECT event_type, COUNT(DISTINCT user_id) AS exact_users
        FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           ROUND(CASE WHEN e.raw <= 2.5 * {_HLL_M} AND e.v < {_HLL_M}
                      THEN {_HLL_M} * ln(CAST({_HLL_M} AS DOUBLE)
                                         / ({_HLL_M} - e.v))
                      ELSE e.raw END, 4) AS hll_est,
           x.exact_users
    FROM e JOIN x USING (event_type)
    """,
)
def portable_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    h = F.md5(F.col("user_id").cast("string"))
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("long")
    w = F.conv(F.substring(h, 3, 15), 16, 10).cast("long")
    rho = F.when(w == 0, F.lit(61)).otherwise(61 - F.length(F.bin(w)))
    regs = (
        ev.select("event_type", bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("m_j"))
    )
    per = regs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("v"),
        F.sum(F.pow(F.lit(2.0), -F.col("m_j"))).alias("s_present"),
    )
    m = float(_HLL_M)
    raw = (
        (0.7213 / (1 + 1.079 / _HLL_M)) * m * m
        / (F.col("s_present") + (m - F.col("v")))
    )
    est = F.when(
        (raw <= 2.5 * _HLL_M) & (F.col("v") < _HLL_M),
        m * F.log(F.lit(m) / (m - F.col("v"))),
    ).otherwise(raw)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return (
        per.select("event_type", F.round(est, 4).alias("hll_est"))
        .join(exact, "event_type")
    )


# ---------------------------------------------------------------------------
# Count-Min frequency sketch: depth 4, width 256; row-i hash of key x is
# the first 4 hex chars of md5(x || 'cm' || i) mod width. Point
# estimates for the ten smallest user ids ride a broadcast of the
# 1024-cell counter table.
# ---------------------------------------------------------------------------
_CM_D = 4
_CM_W = 256
_CM_KEYS = 10


def _cm_pos_sql(key_expr: str, i: str) -> str:
    return (
        f"(('0x' || substr(md5(CAST({key_expr} AS VARCHAR) || 'cm' || {i}),"
        f" 1, 4))::BIGINT % {_CM_W})"
    )


@query(
    "count_min_user_freq",
    f"""
    WITH rows_i AS (
        SELECT user_id, unnest(generate_series(0, {_CM_D - 1})) AS i
        FROM events
    ),
    cms AS (
        SELECT i, {_cm_pos_sql('user_id', 'i')} AS pos, COUNT(*) AS c
        FROM rows_i GROUP BY i, pos
    ),
    keys AS (
        SELECT DISTINCT user_id FROM events
        ORDER BY user_id LIMIT {_CM_KEYS}
    ),
    probes AS (
        SELECT k.user_id, d.i, {_cm_pos_sql('k.user_id', 'd.i')} AS pos
        FROM keys k CROSS JOIN
             (SELECT unnest(generate_series(0, {_CM_D - 1})) AS i) d
    ),
    est AS (
        SELECT p.user_id, MIN(COALESCE(cms.c, 0)) AS cms_est
        FROM probes p LEFT JOIN cms ON p.i = cms.i AND p.pos = cms.pos
        GROUP BY p.user_id
    ),
    exact AS (
        SELECT user_id, COUNT(*) AS exact_n FROM events GROUP BY user_id
    )
    SELECT est.user_id, exact.exact_n, CAST(est.cms_est AS BIGINT) AS cms_est,
           est.cms_est >= exact.exact_n AS overestimates
    FROM est JOIN exact USING (user_id)
    """,
)
def count_min_user_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")

    def pos(key_col, i_col):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            key_col.cast("string"), F.lit("cm"),
                            i_col.cast("string"),
                        )
                    ),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("long")
            % _CM_W
        )

    depth = F.explode(F.array(*[F.lit(i) for i in range(_CM_D)])).alias("i")
    cms = (
        ev.select(F.col("user_id"), depth)
        .select("i", pos(F.col("user_id"), F.col("i")).alias("pos"))
        .groupBy("i", "pos")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    keys = (
        ev.select("user_id").distinct().orderBy("user_id").limit(_CM_KEYS)
    )
    probes = keys.select(
        "user_id", depth
    ).select("user_id", "i", pos(F.col("user_id"), F.col("i")).alias("pos"))
    est = (
        probes.join(F.broadcast(cms), ["i", "pos"], "left")
        .groupBy("user_id")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("cms_est"))
    )
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_n"))
    return (
        est.join(exact, "user_id")
        .select(
            "user_id",
            "exact_n",
            F.col("cms_est").cast("long").alias("cms_est"),
            (F.col("cms_est") >= F.col("exact_n")).alias("overestimates"),
        )
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values / bottom-k theta) distinct sketch: keep the k
# smallest distinct md5 hash values per group; the distinct-count
# estimate is (k-1)/h_k with hashes normalized to [0,1). The third
# portable sketch family (HLL = registers, CMS = counters, KMV = order
# statistics). KMV's superpower at 100 TB is SET ALGEBRA: intersecting
# two bottom-k sets estimates Jaccard/overlap between sources, which
# registers can't do. The build is a distinct + two-phase bottom-k (the
# ranked_topk shape — per-partition prune to <= k rows first, the global
# per-group window sees <= k*P rows); the whole sketch is md5-determined
# so DuckDB re-derives every kept hash and the estimate is a full
# cross-engine value oracle. k=8 so the sketch saturates even at the
# pytest smoke scale (15 distinct users/type at sf0.001).
# ---------------------------------------------------------------------------
_KMV_K = 8
_KMV_DENOM = float(16 ** 15)  # 15 hex chars -> uniform in [0, 1)


@query(
    "kmv_distinct_users",
    f"""
    WITH h AS (
        SELECT DISTINCT event_type,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
                   AS hv
        FROM events
    ),
    rk AS (
        SELECT event_type, hv,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rn
        FROM h
    ),
    kth AS (
        SELECT event_type, MAX(hv) AS hk, COUNT(*) AS n_kept
        FROM rk WHERE rn <= {_KMV_K} GROUP BY event_type
    ),
    x AS (
        SELECT event_type, COUNT(DISTINCT user_id) AS exact_users
        FROM events GROUP BY event_type
    )
    SELECT k.event_type,
           ROUND(CASE WHEN k.n_kept < {_KMV_K} THEN CAST(k.n_kept AS DOUBLE)
                      ELSE ({_KMV_K} - 1) / (k.hk / {_KMV_DENOM}) END,
                 4) AS kmv_est,
           x.exact_users
    FROM kth k JOIN x USING (event_type)
    """,
)
def kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    hv = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    h = ev.select("event_type", hv.alias("hv")).distinct()
    # Two-phase bottom-k: each partition keeps <= k candidates per type,
    # then the per-type window ranks <= k*P survivors — never the full
    # distinct set through one task.
    local = Window.partitionBy(F.spark_partition_id(), "event_type").orderBy(
        "hv"
    )
    pruned = (
        h.withColumn("__lr", F.row_number().over(local))
        .filter(F.col("__lr") <= _KMV_K)
        .drop("__lr")
    )
    per_type = Window.partitionBy("event_type").orderBy("hv")
    kth = (
        pruned.withColumn("rn", F.row_number().over(per_type))
        .filter(F.col("rn") <= _KMV_K)
        .groupBy("event_type")
        .agg(F.max("hv").alias("hk"), F.count(F.lit(1)).alias("n_kept"))
    )
    est = F.when(
        F.col("n_kept") < _KMV_K, F.col("n_kept").cast("double")
    ).otherwise((_KMV_K - 1) / (F.col("hk") / F.lit(_KMV_DENOM)))
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return kth.select(
        "event_type", F.round(est, 4).alias("kmv_est")
    ).join(exact, "event_type")


# ---------------------------------------------------------------------------
# Trailing-7-day distinct users via HLL register MERGE — the pattern
# that makes sketches worth their salt at scale: per-day register
# tables (tiny, mergeable state) are combined across a sliding window
# WITHOUT re-touching the event stream. Merge-by-max is implemented as
# a scatter: each (day, bucket, m_j) register row contributes to the 7
# window endpoints it covers (a bounded ×7 fan-out of a
# days×256-row table), then one groupBy takes the max per (end_day,
# bucket) — no sparse-day RANGE-frame pitfalls, no window at all.
# Restricting output to OBSERVED days keeps both engines on the same
# row set. Estimates use the identical alpha/linear-counting form as
# portable_hll_users; n_events rides along as an exact cross-engine
# anchor for each day.
# ---------------------------------------------------------------------------
@query(
    "rolling_distinct_users_hll",
    f"""
    WITH h AS (
        SELECT date_diff('day', DATE '1970-01-01',
                         CAST(date_trunc('day', ts) AS DATE)) AS d,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 2))::BIGINT
                   AS bucket,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 3, 15))::BIGINT
                   AS w
        FROM events
    ),
    r AS (
        SELECT d, bucket,
               MAX(CASE WHEN w = 0 THEN 61 ELSE 61 - len(bin(w)) END) AS m_j
        FROM h GROUP BY d, bucket
    ),
    scattered AS (
        SELECT unnest(generate_series(d, d + 6)) AS end_d, bucket, m_j
        FROM r
    ),
    merged AS (
        SELECT end_d, bucket, MAX(m_j) AS m_j
        FROM scattered GROUP BY end_d, bucket
    ),
    obs AS (SELECT d AS end_d, COUNT(*) AS n_events FROM h GROUP BY d),
    p AS (
        SELECT m.end_d, COUNT(*) AS v,
               SUM(power(2.0, -m.m_j)) AS s_present
        FROM merged m JOIN obs USING (end_d)
        GROUP BY m.end_d
    )
    SELECT strftime(DATE '1970-01-01' + CAST(p.end_d AS INTEGER), '%Y-%m-%d')
               AS day,
           CAST(p.v AS BIGINT) AS v,
           ROUND(CASE WHEN (0.7213 / (1 + 1.079 / {_HLL_M})) * {_HLL_M}
                           * {_HLL_M} / (p.s_present + ({_HLL_M} - p.v))
                           <= 2.5 * {_HLL_M} AND p.v < {_HLL_M}
                      THEN {_HLL_M} * ln(CAST({_HLL_M} AS DOUBLE)
                                         / ({_HLL_M} - p.v))
                      ELSE (0.7213 / (1 + 1.079 / {_HLL_M})) * {_HLL_M}
                           * {_HLL_M} / (p.s_present + ({_HLL_M} - p.v))
                      END, 4) AS rolling_users_est,
           CAST(obs.n_events AS BIGINT) AS n_events
    FROM p JOIN obs USING (end_d)
    """,
)
def rolling_distinct_users_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    h = F.md5(F.col("user_id").cast("string"))
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("long")
    w = F.conv(F.substring(h, 3, 15), 16, 10).cast("long")
    rho = F.when(w == 0, F.lit(61)).otherwise(61 - F.length(F.bin(w)))
    base = ev.select(
        F.unix_date(F.to_date(F.date_trunc("day", "ts"))).alias("d"),
        bucket.alias("bucket"),
        rho.alias("rho"),
    )
    regs = base.groupBy("d", "bucket").agg(F.max("rho").alias("m_j"))
    scattered = regs.select(
        F.explode(F.sequence(F.col("d"), F.col("d") + 6)).alias("end_d"),
        "bucket",
        "m_j",
    )
    merged = scattered.groupBy("end_d", "bucket").agg(
        F.max("m_j").alias("m_j")
    )
    obs = base.groupBy(F.col("d").alias("end_d")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    per = (
        merged.join(F.broadcast(obs.select("end_d")), "end_d")
        .groupBy("end_d")
        .agg(
            F.count(F.lit(1)).alias("v"),
            F.sum(F.pow(F.lit(2.0), -F.col("m_j"))).alias("s_present"),
        )
    )
    m = float(_HLL_M)
    raw = (
        (0.7213 / (1 + 1.079 / _HLL_M)) * m * m
        / (F.col("s_present") + (m - F.col("v")))
    )
    est = F.when(
        (raw <= 2.5 * _HLL_M) & (F.col("v") < _HLL_M),
        m * F.log(F.lit(m) / (m - F.col("v"))),
    ).otherwise(raw)
    return (
        per.join(F.broadcast(obs), "end_d")
        .select(
            F.date_format(
                F.date_add(F.lit("1970-01-01").cast("date"), F.col("end_d").cast("int")),
                "yyyy-MM-dd",
            ).alias("day"),
            F.col("v").cast("long").alias("v"),
            F.round(est, 4).alias("rolling_users_est"),
            F.col("n_events").cast("long").alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# KMV / theta-sketch SET ALGEBRA — the estimate family the bottom-k
# sketch exists for (kmv_distinct_users builds the sketch; this query
# exercises the algebra). Union and intersection cardinalities between
# the click-user and purchase-user sets are estimated purely from the
# two bottom-k sketches: thr = min(theta_A, theta_B) (an UNSATURATED
# sketch has theta = 1.0 — its kept set is the complete hash set),
# count kept hashes below thr once for the union and once for the
# both-sides intersection, then scale by 1/theta. At 100 TB the two
# sketches are a few hundred bytes each and the set algebra never
# re-touches the event stream — the same mergeable-state argument as
# the rolling HLL merge, extended to intersections, which registers
# fundamentally cannot do. Exact countDistinct anchors ride along.
# All sketch content is md5-determined, so every kept hash, threshold,
# count, and estimate is a full cross-engine value oracle.
# ---------------------------------------------------------------------------
_KMV_SET_K = 32
_KMV_DENOM_INT = 16 ** 15


@query(
    "kmv_set_ops_users",
    f"""
    WITH h AS (
        SELECT DISTINCT event_type,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
                   AS hv
        FROM events
        WHERE event_type IN ('click', 'purchase') AND value > 150
    ),
    rk AS (
        SELECT event_type, hv,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rn
        FROM h
    ),
    kept AS (SELECT event_type, hv FROM rk WHERE rn <= {_KMV_SET_K}),
    kth AS (
        SELECT event_type, MAX(hv) AS hk, COUNT(*) AS n_kept
        FROM kept GROUP BY event_type
    ),
    thr AS (
        SELECT MIN(CASE WHEN n_kept < {_KMV_SET_K}
                        THEN {_KMV_DENOM_INT} ELSE hk END) AS thr
        FROM kth
    ),
    below AS (
        SELECT hv,
               MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS in_a,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS in_b
        FROM kept, thr WHERE hv < thr
        GROUP BY hv
    ),
    cnts AS (
        SELECT COUNT(*) AS union_cnt,
               CAST(SUM(in_a * in_b) AS BIGINT) AS inter_cnt
        FROM below
    ),
    exact AS (
        SELECT COUNT(*) AS exact_union,
               CAST(SUM(CASE WHEN has_a + has_b = 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS exact_inter
        FROM (
            SELECT user_id,
                   MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                       AS has_a,
                   MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS has_b
            FROM events
            WHERE event_type IN ('click', 'purchase') AND value > 150
            GROUP BY user_id
        )
    )
    SELECT c.union_cnt, c.inter_cnt,
           ROUND(CAST(c.union_cnt AS DOUBLE) * {float(_KMV_DENOM_INT)!r}
                 / CAST(t.thr AS DOUBLE), 4) AS est_union,
           ROUND(CAST(c.inter_cnt AS DOUBLE) * {float(_KMV_DENOM_INT)!r}
                 / CAST(t.thr AS DOUBLE), 4) AS est_inter,
           ROUND(c.inter_cnt / CAST(c.union_cnt AS DOUBLE), 6)
               AS jaccard_est,
           e.exact_union, e.exact_inter
    FROM cnts c, thr t, exact e
    """,
)
def kmv_set_ops_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = (
        t(spark, sf_dir, "events")
        .filter(
            F.col("event_type").isin("click", "purchase")
            & (F.col("value") > 150)
        )
        .select("event_type", "user_id")
    )
    hv = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    h = ev.select("event_type", hv.alias("hv")).distinct()
    # Two-phase bottom-k (same shape as kmv_distinct_users).
    local = Window.partitionBy(F.spark_partition_id(), "event_type").orderBy(
        "hv"
    )
    pruned = (
        h.withColumn("__lr", F.row_number().over(local))
        .filter(F.col("__lr") <= _KMV_SET_K)
        .drop("__lr")
    )
    per_type = Window.partitionBy("event_type").orderBy("hv")
    kept = (
        pruned.withColumn("rn", F.row_number().over(per_type))
        .filter(F.col("rn") <= _KMV_SET_K)
        .drop("rn")
    )
    kth = kept.groupBy("event_type").agg(
        F.max("hv").alias("hk"), F.count(F.lit(1)).alias("n_kept")
    )
    thr = kth.agg(
        F.min(
            F.when(
                F.col("n_kept") < _KMV_SET_K, F.lit(_KMV_DENOM_INT)
            ).otherwise(F.col("hk"))
        ).alias("thr")
    )
    below = (
        kept.join(F.broadcast(thr))
        .filter(F.col("hv") < F.col("thr"))
        .groupBy("hv")
        .agg(
            F.max(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ).alias("in_a"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("in_b"),
        )
    )
    cnts = below.agg(
        F.count(F.lit(1)).alias("union_cnt"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("inter_cnt"),
    )
    exact = (
        ev.groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ).alias("has_a"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("has_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("exact_union"),
            F.sum(
                F.when(F.col("has_a") + F.col("has_b") == 2, 1).otherwise(0)
            )
            .cast("long")
            .alias("exact_inter"),
        )
    )
    denom_f = F.lit(float(_KMV_DENOM_INT))
    return (
        cnts.join(F.broadcast(thr))
        .join(F.broadcast(exact))
        .select(
            "union_cnt",
            "inter_cnt",
            F.round(
                F.col("union_cnt").cast("double")
                * denom_f
                / F.col("thr").cast("double"),
                4,
            ).alias("est_union"),
            F.round(
                F.col("inter_cnt").cast("double")
                * denom_f
                / F.col("thr").cast("double"),
                4,
            ).alias("est_inter"),
            F.round(
                F.col("inter_cnt") / F.col("union_cnt").cast("double"), 6
            ).alias("jaccard_est"),
            "exact_union",
            "exact_inter",
        )
    )


# ---------------------------------------------------------------------------
# Exact heavy hitters, two bounded passes (round 10, second session):
# candidates from Misra-Gries-style per-batch state (< 1/phi survivors
# per Arrow batch, shuffle-free), then EXACT counts of candidate-
# matching rows only — the shuffle is O(hitters' rows), never
# O(distinct values), which is the 100 TB frequent-item shape. The
# skewed test column floor(sqrt(o_orderkey)) gives a linearly growing
# count profile (~90 true hitters at sf0.01 above phi=0.4%); the
# oracle is the plain HAVING aggregate, so a candidate pass that drops
# a true hitter breaks the hash. The superset guarantee and
# partition-count invariance are property-tested in
# tests/test_heavyhitters.py.
# ---------------------------------------------------------------------------
_HH_PHI = 0.004


@query(
    "heavy_hitters_two_pass",
    """
    WITH vals AS (
        SELECT CAST(floor(sqrt(o_orderkey)) AS BIGINT) AS v FROM orders
    ), tot AS (
        SELECT COUNT(*) AS n FROM vals
    )
    SELECT v, COUNT(*) AS cnt
    FROM vals, tot
    GROUP BY v, n
    HAVING COUNT(*) > 0.004 * n
    ORDER BY v
    """,
)
def heavy_hitters_two_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.heavyhitters import exact_heavy_hitters

    vals = t(spark, sf_dir, "orders").select(
        F.floor(F.sqrt(F.col("o_orderkey"))).cast("long").alias("v")
    )
    return exact_heavy_hitters(vals, "v", _HH_PHI).orderBy("v")
