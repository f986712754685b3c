"""Sampling / splitting queries — SURVEY.md §2.6 (R1-R3).

The hash-split queries are fully oracle-checkable because assignment is
md5-deterministic (identical in DuckDB). The seeded-random variants use
Spark's RNG, which no oracle can reproduce — they register rows-only
checks plus property tests in tests/test_splits.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.splits import (
    hash_k_per_group,
    hash_split_expr,
    nested_entity_split,
    stratified_hash_sample,
)
from .registry import query
from .relational import t

_FRACTIONS = {"train": 0.8, "val": 0.1, "test": 0.1}

# DuckDB twin of hash_split_expr with the same thresholds:
# 0.8 -> 'cccc', 0.9 -> 'e666' (4 hex digits of round(f * 65536)).
_SPLIT_CASE = """
    CASE WHEN substr(md5(CAST(c_custkey AS VARCHAR)), 1, 4) < 'cccc' THEN 'train'
         WHEN substr(md5(CAST(c_custkey AS VARCHAR)), 1, 4) < 'e666' THEN 'val'
         ELSE 'test' END
"""


# ---------------------------------------------------------------------------
# R2 (deterministic form): entity-keyed split assignment. Every row with
# the same key gets the same label — the leakage invariant of
# TrainDatasets.py:149-150 holds by construction, with zero shuffles.
# ---------------------------------------------------------------------------
@query(
    "hash_split_assign",
    f"""
    SELECT c_custkey, {_SPLIT_CASE} AS split
    FROM customer
    """,
)
def hash_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey", hash_split_expr(F.col("c_custkey"), _FRACTIONS)
    )


# ---------------------------------------------------------------------------
# R2 materialization: split labels propagated to dependent rows (orders ≙
# annotations, customers ≙ images). The label is computed from the join
# key directly — no second pass over the entity table at all.
# ---------------------------------------------------------------------------
@query(
    "hash_split_materialize",
    f"""
    SELECT split, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS total_price
    FROM (
        SELECT o_totalprice,
               CASE WHEN substr(md5(CAST(o_custkey AS VARCHAR)), 1, 4) < 'cccc' THEN 'train'
                    WHEN substr(md5(CAST(o_custkey AS VARCHAR)), 1, 4) < 'e666' THEN 'val'
                    ELSE 'test' END AS split
        FROM orders
    )
    GROUP BY split
    """,
)
def hash_split_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return (
        orders.withColumn("split", hash_split_expr(F.col("o_custkey"), _FRACTIONS))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


# ---------------------------------------------------------------------------
# R1 (deterministic form): fraction-sample of distinct keys by hash
# bucket — the engine-portable twin of keys.sample(frac=p): ~20% of
# customers, stable under reruns, cluster layout, and appends.
# ---------------------------------------------------------------------------
@query(
    "hash_sample",
    """
    SELECT c_custkey
    FROM customer
    WHERE substr(md5('s1' || CAST(c_custkey AS VARCHAR)), 1, 4) < '3333'
    """,
)
def hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.splits import hash_bucket_expr

    cust = t(spark, sf_dir, "customer")
    return cust.select("c_custkey").filter(
        hash_bucket_expr(F.col("c_custkey"), salt="s1") < "3333"
    )


# ---------------------------------------------------------------------------
# R1+R2 (reference-exact seeded form): nested sample → 80/20 val/test →
# semi-join materialization. Spark's RNG never hash-matches another
# engine's, so (like approx_distinct_users) the oracle contract is the
# INVARIANTS, not the sample: per-split row fractions inside generous
# bounds around the expected 0.80/0.16/0.04, and the three splits
# together exactly partitioning the joinable orders. The oracle pins
# both booleans to TRUE; a broken split flips one and fails the hash.
# Exact leakage/disjointness is additionally pytest-verified.
# ---------------------------------------------------------------------------
_SPLIT_BOUNDS = {"train": (0.70, 0.90), "val": (0.10, 0.22), "test": (0.01, 0.08)}


# The booleans are self-check invariants (Spark RNG splits cannot be
# reproduced in SQL) but the n_eligible anchor is a TRUE cross-engine
# value: DuckDB recomputes the semi-join denominator every fraction is
# measured against, so a broken eligibility join cannot silently
# legitimize in-bounds fractions (ADVICE r3: vacuous-oracle hardening).
@query(
    "seeded_nested_split",
    """
    SELECT v.split, TRUE AS frac_ok, TRUE AS complete,
           (SELECT COUNT(*) FROM orders
            WHERE o_custkey IN (SELECT c_custkey FROM customer)) AS n_eligible
    FROM (VALUES ('test'), ('train'), ('val')) AS v(split)
    """,
)
def seeded_nested_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    rows = orders.withColumnRenamed("o_custkey", "c_custkey")
    splits = nested_entity_split(
        rows, cust, "c_custkey", p=0.2, test_split=True, seed=42
    )
    parts = [
        df.groupBy(F.lit(name).alias("split")).agg(F.count(F.lit(1)).alias("n_rows"))
        for name, df in splits.items()
    ]
    counts = parts[0]
    for p in parts[1:]:
        counts = counts.unionByName(p)
    eligible = (
        rows.join(cust.select("c_custkey").distinct(), "c_custkey", "left_semi")
        .agg(F.count(F.lit(1)).alias("__eligible"))
    )
    split_sum = counts.agg(F.sum("n_rows").alias("__sum"))
    frac = F.col("n_rows") / F.col("__eligible")
    frac_ok = F.lit(False)
    for name, (lo, hi) in _SPLIT_BOUNDS.items():
        frac_ok = F.when(
            F.col("split") == name, (frac >= lo) & (frac <= hi)
        ).otherwise(frac_ok)
    return (
        counts.crossJoin(F.broadcast(eligible))
        .crossJoin(F.broadcast(split_sum))
        .select(
            "split",
            frac_ok.alias("frac_ok"),
            (F.col("__sum") == F.col("__eligible")).alias("complete"),
            F.col("__eligible").alias("n_eligible"),
        )
    )


# ---------------------------------------------------------------------------
# Stratified downsampling to a target mix (deterministic sampleBy):
# per-language fractions rebalance the documents corpus; unlisted
# strata drop. 0.5 -> '8000', 0.25 -> '4000' (4 hex digits of
# round(f * 65536)).
# ---------------------------------------------------------------------------
_STRATA = {"en": 0.5, "de": 0.5, "fr": 0.25}


@query(
    "stratified_sample_docs",
    """
    SELECT lang, COUNT(*) AS n_docs, COUNT(DISTINCT source) AS n_sources
    FROM documents
    WHERE (lang = 'en' AND substr(md5('mix' || CAST(doc_id AS VARCHAR)), 1, 4) < '8000')
       OR (lang = 'de' AND substr(md5('mix' || CAST(doc_id AS VARCHAR)), 1, 4) < '8000')
       OR (lang = 'fr' AND substr(md5('mix' || CAST(doc_id AS VARCHAR)), 1, 4) < '4000')
    GROUP BY lang
    """,
)
def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    sampled = stratified_hash_sample(
        docs, key_col="doc_id", stratum_col="lang",
        fractions=_STRATA, salt="mix",
    )
    return sampled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
    )


@query(
    "sample_k_per_source",
    """
    SELECT doc_id, source FROM (
        SELECT doc_id, source,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5('kpg:' || CAST(doc_id AS VARCHAR)), doc_id
               ) AS rk
        FROM documents
    ) WHERE rk <= 3
    """,
)
def sample_k_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic reservoir: at most 3 docs per source, chosen by
    hashed-key order — bounded output per group regardless of skew."""
    docs = t(spark, sf_dir, "documents")
    return hash_k_per_group(docs, ["source"], "doc_id", k=3).select(
        "doc_id", "source"
    )


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (operators.splits.
# weighted_sample_topk): 50 documents drawn with probability
# proportional to length — the "sample long docs more" curation move —
# via the deterministic A-Res key ln(u)/w over md5 uniforms. The twin
# re-derives every key, so the SELECTED SET ITSELF is value-checked,
# not just its size.
# ---------------------------------------------------------------------------
_WS_K = 50


@query(
    "weighted_sample_docs",
    f"""
    WITH s AS (
        SELECT doc_id, n_chars,
               ROUND(ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'ws'),
                                        1, 13))::BIGINT + 0.5)
                        / {float(1 << 52)}) / n_chars, 9) AS wkey
        FROM documents
    ),
    ranked AS (
        SELECT doc_id, n_chars, wkey,
               ROW_NUMBER() OVER (ORDER BY wkey DESC, doc_id) AS rank
        FROM s
    )
    SELECT doc_id, n_chars, wkey, rank FROM ranked WHERE rank <= {_WS_K}
    """,
)
def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.splits import weighted_sample_topk

    docs = t(spark, sf_dir, "documents")
    return weighted_sample_topk(docs, "doc_id", "n_chars", k=_WS_K)


# ---------------------------------------------------------------------------
# Neyman (optimal) allocation stratified sample — survey-statistics
# sampling: each stratum's share of the fixed budget is proportional to
# N_h·S_h (size × within-stratum std-dev of the target metric), so
# high-variance strata are oversampled relative to proportional
# allocation. Every number is engine-portable: the variance comes from
# exact integer sums (Σx, Σx²), sqrt is IEEE-correctly-rounded (the one
# libm function that IS bit-deterministic), the per-stratum weights are
# quantized to a 1e-6 grid BEFORE the cross-strata total (so the
# allocation never depends on float summation order), and selection is
# the md5-rank prefix within each stratum.
# ---------------------------------------------------------------------------
_NEY_BUDGET = 40


@query(
    "neyman_allocation_sample",
    f"""
    WITH stats AS (
        SELECT source, COUNT(*) AS nh,
               SUM(n_chars) AS sx,
               SUM(n_chars * n_chars) AS sxx
        FROM documents GROUP BY source
    ),
    w AS (
        SELECT source, nh,
               CAST(floor(nh * CASE WHEN nh < 2 THEN 0.0
                    ELSE sqrt((sxx - CAST(sx AS DOUBLE) * sx / nh)
                              / (nh - 1)) END * 1000000.0 + 0.5) AS BIGINT)
                   AS w_micro
        FROM stats
    ),
    tot AS (SELECT SUM(w_micro) AS wt FROM w),
    alloc AS (
        SELECT w.source,
               LEAST(CAST(floor({_NEY_BUDGET} * CAST(w.w_micro AS DOUBLE)
                                / tot.wt + 0.5) AS BIGINT), w.nh) AS n_take
        FROM w, tot
    ),
    ranked AS (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY md5('ney' || CAST(doc_id AS VARCHAR)),
                                           doc_id) AS rn
        FROM documents
    )
    SELECT r.doc_id, r.source, a.n_take
    FROM ranked r JOIN alloc a ON r.source = a.source
    WHERE r.rn <= a.n_take
    """,
)
def neyman_allocation_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = t(spark, sf_dir, "documents")
    stats = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("nh"),
        F.sum("n_chars").alias("sx"),
        F.sum(F.col("n_chars") * F.col("n_chars")).alias("sxx"),
    )
    s_h = F.when(F.col("nh") < 2, F.lit(0.0)).otherwise(
        F.sqrt(
            (F.col("sxx") - F.col("sx").cast("double") * F.col("sx") / F.col("nh"))
            / (F.col("nh") - 1)
        )
    )
    w = stats.select(
        "source",
        "nh",
        F.floor(F.col("nh") * s_h * 1000000.0 + 0.5).cast("long").alias(
            "w_micro"
        ),
    )
    tot = w.agg(F.sum("w_micro").alias("wt"))
    alloc = w.join(F.broadcast(tot)).select(
        "source",
        F.least(
            F.floor(
                _NEY_BUDGET * F.col("w_micro").cast("double") / F.col("wt")
                + 0.5
            ).cast("long"),
            F.col("nh").cast("long"),
        ).alias("n_take"),
    )
    # Two-phase rank: n_take <= _NEY_BUDGET, so each input partition
    # first keeps its own <= budget rows per source and only <= budget*P
    # survivors ride the bare per-source window — source is a skewed
    # dictionary key (r12 skew-partition-window lint; waived as
    # bounded-input on the survivor phase).
    ney_order = [
        F.md5(F.concat(F.lit("ney"), F.col("doc_id").cast("string"))),
        F.col("doc_id"),
    ]
    local = Window.partitionBy(F.spark_partition_id(), "source").orderBy(
        *ney_order
    )
    pruned = (
        docs.withColumn("__lr", F.row_number().over(local))
        .filter(F.col("__lr") <= _NEY_BUDGET)
        .drop("__lr")
    )
    rw = Window.partitionBy("source").orderBy(*ney_order)
    ranked = pruned.select(
        "doc_id", "source", F.row_number().over(rw).alias("rn")
    )
    return (
        ranked.join(F.broadcast(alloc), "source")
        .filter(F.col("rn") <= F.col("n_take"))
        .select("doc_id", "source", "n_take")
    )


# ---------------------------------------------------------------------------
# Stratified k-fold assignment — cross-validation folds from the same
# engine-portable md5 bucketing as hash_split_assign (deterministic,
# retry-safe, no RNG state), summarized per (fold, lang) so fold
# balance within every stratum is the value being checked. The fold
# label is a pure expression of the key: assigning 100 TB of documents
# is a map-only pass.
# ---------------------------------------------------------------------------
@query(
    "stratified_kfold_assign",
    """
    SELECT fold, lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM (
        SELECT lang, n_chars,
               CAST(('0x' || substr(md5('kfold:' || CAST(doc_id AS VARCHAR)),
                                    1, 4))::BIGINT % 5 AS INT) AS fold
        FROM documents
    )
    GROUP BY fold, lang
    """,
)
def stratified_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    fold = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("kfold:"), F.col("doc_id").cast("string"))),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")
        % 5
    ).cast("int")
    return (
        docs.select("lang", "n_chars", fold.alias("fold"))
        .groupBy("fold", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Expanding-window temporal cross-validation with an EMBARGO gap — the
# split discipline for time-dependent training data (leakage through
# temporal adjacency, not just key overlap): fold k trains on
# everything strictly before cut_k MINUS a 1-day embargo and validates
# on [cut_k, cut_k + 7d). The scan carries ONE pushed range predicate —
# ts < last_cut + 7d, the union of every cell window (ADVICE r12: the
# one-scan fan-out must not turn into an unbounded full-table read) —
# partition-prunable at 100 TB when the table is date-partitioned; the
# per-cell predicates are evaluated in the fan-out stage, and the
# output is a fold-grained summary, never a row-per-membership
# materialization. Timestamps compare exactly; boundary rows land on
# one deterministic side on both engines.
# ---------------------------------------------------------------------------
_TCV_CUTS = ["2024-01-10 00:00:00", "2024-01-17 00:00:00", "2024-01-24 00:00:00"]


@query(
    "temporal_cv_folds",
    "\nUNION ALL\n".join(
        f"""
    SELECT {k + 1} AS fold, r.role, COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS last_ts
    FROM events, (SELECT 'train' AS role UNION ALL SELECT 'valid') r
    WHERE (r.role = 'train'
           AND ts < TIMESTAMP '{cut}' - INTERVAL 1 DAY)
       OR (r.role = 'valid'
           AND ts >= TIMESTAMP '{cut}'
           AND ts < TIMESTAMP '{cut}' + INTERVAL 7 DAY)
    GROUP BY r.role
    """
        for k, cut in enumerate(_TCV_CUTS)
    ),
)
def temporal_cv_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE scan of events: each row fans out to the (fold, role) cells
    # whose time window it satisfies (<= 2·folds memberships, explode in
    # the scan stage), then a single grouped aggregate computes every
    # fold summary. The previous union of 6 filtered aggregates scanned
    # the events table once per cell — 6 full passes at any scale.
    # The pre-filter below is the UNION of all cell windows (every cell
    # predicate implies ts < last_cut + 7d), so it is value-invariant
    # and restores the pushed-down range the fused scan had lost
    # (ADVICE r12 medium): rows past the last validation window are
    # skipped at the reader instead of being exploded and discarded.
    ev = (
        t(spark, sf_dir, "events")
        .filter(
            F.col("ts")
            < F.lit(_TCV_CUTS[-1]).cast("timestamp")
            + F.expr("INTERVAL 7 DAYS")
        )
        .select("ts", "user_id")
    )
    cells = []
    for k, cut in enumerate(_TCV_CUTS):
        cut_ts = F.lit(cut).cast("timestamp")
        for role, pred in (
            ("train", F.col("ts") < cut_ts - F.expr("INTERVAL 1 DAY")),
            (
                "valid",
                (F.col("ts") >= cut_ts)
                & (F.col("ts") < cut_ts + F.expr("INTERVAL 7 DAYS")),
            ),
        ):
            cells.append(
                F.when(
                    pred,
                    F.struct(
                        F.lit(k + 1).alias("fold"), F.lit(role).alias("role")
                    ),
                )
            )
    fanned = ev.select(
        "ts",
        "user_id",
        F.explode(F.array(*cells)).alias("__cell"),
    ).filter(F.col("__cell").isNotNull())
    return (
        fanned.groupBy(
            F.col("__cell.fold").alias("fold"),
            F.col("__cell.role").alias("role"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "first_ts"
            ),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "last_ts"
            ),
        )
    )
