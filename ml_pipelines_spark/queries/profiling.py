"""Column-profiling queries.

The profile query uses exact distinct counts so DuckDB can reproduce
the report value-for-value (the operator's default HLL sketch is the
scale path but is engine-specific by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.profile import profile_columns, top_values
from .registry import query


def _quality_expr() -> str:
    from .text import quality_sql

    return quality_sql("text")


from .text import quality_sql as quality_sql_  # noqa: E402
from .text import token_count_sql as token_count_sql_  # noqa: E402
from .relational import t

_PROFILE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]

_BRANCHES = []
for _c in _PROFILE_COLS:
    _numeric = _c != "o_orderstatus"
    _mean = f"(SELECT round(AVG({_c}), 4) FROM orders)" if _numeric else "CAST(NULL AS DOUBLE)"
    _BRANCHES.append(
        f"""
        SELECT '{_c}' AS "column", total,
               (SELECT COUNT(*) FROM orders WHERE {_c} IS NULL) AS nulls,
               (SELECT COUNT(DISTINCT {_c}) FROM orders) AS approx_distinct,
               (SELECT CAST(MIN({_c}) AS VARCHAR) FROM orders) AS min,
               (SELECT CAST(MAX({_c}) AS VARCHAR) FROM orders) AS max,
               {_mean} AS mean
        FROM tot"""
    )


@query(
    "profile_orders",
    "WITH tot AS (SELECT COUNT(*) AS total FROM orders)"
    + " UNION ALL ".join(_BRANCHES),
)
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    rep = profile_columns(orders, _PROFILE_COLS, exact_distinct=True)
    return rep.withColumn("mean", F.round("mean", 4))


@query(
    "top_sources",
    """
    SELECT CAST(source AS VARCHAR) AS value, COUNT(*) AS n
    FROM documents
    GROUP BY source
    ORDER BY n DESC, value ASC
    LIMIT 5
    """,
)
def top_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return top_values(docs, "source", k=5)


# ---------------------------------------------------------------------------
# Dataset card — the one-row corpus datasheet a training run records:
# document/token volume, language spread, median length, mean quality.
# ONE aggregation pass over documents (the exact median uses Spark's
# built-in percentile, matching DuckDB quantile_cont as in
# exact_percentiles); every metric value-checked cross-engine.
# ---------------------------------------------------------------------------
@query(
    "dataset_card",
    f"""
    WITH d AS (
        SELECT lang,
               (CASE WHEN len(trim(text)) = 0 THEN 0
                     ELSE len(string_split_regex(trim(text), '\\s+')) END)
                   AS n_tokens,
               {_quality_expr()} AS quality
        FROM documents
    )
    SELECT COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           ROUND(AVG(CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END), 4)
               AS frac_en,
           ROUND(quantile_cont(n_tokens, 0.5), 1) AS median_tokens,
           ROUND(AVG(quality), 4) AS mean_quality
    FROM d
    """,
)
def dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import text as T

    docs = t(spark, sf_dir, "documents").select(
        "lang",
        T.token_count(F.col("text")).alias("n_tokens"),
        T.quality_score(F.col("text")).alias("quality"),
    )
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.countDistinct("lang").alias("n_langs"),
        F.round(F.avg((F.col("lang") == "en").cast("double")), 4).alias(
            "frac_en"
        ),
        F.round(F.percentile("n_tokens", F.lit(0.5)), 1).alias(
            "median_tokens"
        ),
        F.round(F.avg("quality"), 4).alias("mean_quality"),
    )


# ---------------------------------------------------------------------------
# Chi-square independence statistic for the lang x source contingency
# table — the statistical-test family: observed vs expected cell counts
# from two marginal passes over one aggregate, exact float64 terms
# rounded on both sides. (The statistic, not the p-value — no special
# functions in either engine.)
# ---------------------------------------------------------------------------
@query(
    "lang_source_chisq",
    """
    WITH cells AS (
        SELECT lang, source, COUNT(*) AS o FROM documents GROUP BY 1, 2
    ),
    m AS (
        SELECT lang, source, o,
               SUM(o) OVER (PARTITION BY lang) AS row_n,
               SUM(o) OVER (PARTITION BY source) AS col_n,
               SUM(o) OVER () AS total
        FROM cells
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           ROUND(SUM(
               (o - row_n * col_n / CAST(total AS DOUBLE))
               * (o - row_n * col_n / CAST(total AS DOUBLE))
               / (row_n * col_n / CAST(total AS DOUBLE))
           ), 4) AS chi_sq
    FROM m
    """,
)
def lang_source_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = t(spark, sf_dir, "documents")
    cells = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o"))
    # marginals over the tiny cell table (|langs| x |sources| rows)
    row_n = F.sum("o").over(Window.partitionBy("lang"))
    col_n = F.sum("o").over(Window.partitionBy("source"))
    total = F.sum("o").over(Window.partitionBy())
    e = row_n * col_n / total.cast("double")
    return cells.select(((F.col("o") - e) * (F.col("o") - e) / e).alias("t")).agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.round(F.sum("t"), 4).alias("chi_sq"),
    )


# ---------------------------------------------------------------------------
# Pearson correlation matrix over the lineitem measures — both engines'
# built-in corr aggregates implement the same sample formula, so the
# rounded coefficients value-check; one aggregate pass produces all six
# upper-triangle pairs.
# ---------------------------------------------------------------------------
_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@query(
    "lineitem_correlations",
    """
    SELECT """
    + ",\n           ".join(
        f"ROUND(corr({a}, {b}), 6) AS corr_{a[2:]}_{b[2:]}"
        for i, a in enumerate(_CORR_COLS)
        for b in _CORR_COLS[i + 1 :]
    )
    + """
    FROM lineitem
    """,
)
def lineitem_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.agg(
        *[
            F.round(F.corr(a, b), 6).alias(f"corr_{a[2:]}_{b[2:]}")
            for i, a in enumerate(_CORR_COLS)
            for b in _CORR_COLS[i + 1 :]
        ]
    )


# ---------------------------------------------------------------------------
# Approximate-median sketch check — the quantile companion of
# approx_distinct_users: Spark's percentile_approx (Greenwald-Khanna
# style sketch, mergeable, O(1/accuracy) memory — the 100 TB substitute
# for exact sorts) has no cross-engine twin, so the oracle contract is
# the BAND invariant with exact anchors: the p45/p50/p55 exact
# percentiles are true cross-engine values (quantile_cont), and the
# sketch estimate must land inside [p45, p55] (pinned TRUE). Registered
# in SELF_CHECK_INVARIANTS.
# ---------------------------------------------------------------------------
@query(
    "approx_median_band",
    """
    SELECT event_type,
           ROUND(quantile_cont(value, 0.45), 4) AS p45,
           ROUND(quantile_cont(value, 0.50), 4) AS p50,
           ROUND(quantile_cont(value, 0.55), 4) AS p55,
           TRUE AS approx_in_band
    FROM events
    GROUP BY event_type
    """,
)
def approx_median_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.45)), 4).alias("p45"),
        F.round(F.percentile("value", F.lit(0.50)), 4).alias("p50"),
        F.round(F.percentile("value", F.lit(0.55)), 4).alias("p55"),
        (
            (
                F.percentile_approx("value", F.lit(0.5), F.lit(100))
                >= F.percentile("value", F.lit(0.45))
            )
            & (
                F.percentile_approx("value", F.lit(0.5), F.lit(100))
                <= F.percentile("value", F.lit(0.55))
            )
        ).alias("approx_in_band"),
    )


# ---------------------------------------------------------------------------
# Robust outlier flags via MAD (median absolute deviation) — the
# median/MAD pair survives the exact contamination that wrecks
# mean/stddev z-scores (one 10^9-char document shifts a mean but not a
# median), which is why robust-z is the curation default for length
# screens. Two aggregation passes (median, then MAD of deviations) with
# the per-source statistics broadcast back — the per-group state is 2
# doubles per source, never a global window. Exact percentile on both
# engines (Spark percentile == DuckDB quantile_cont). Output: every doc
# whose |robust z| > 2.5, i.e. |x - med| > 2.5 * 1.4826 * MAD.
# ---------------------------------------------------------------------------
_MAD_C = 1.4826  # consistency constant: MAD * c estimates sigma under normality
_MAD_Z = 2.5


@query(
    "mad_outlier_docs",
    f"""
    WITH med AS (
        SELECT source, quantile_cont(n_chars, 0.5) AS med
        FROM documents GROUP BY source
    ),
    dev AS (
        SELECT d.doc_id, d.source, d.n_chars, m.med,
               abs(d.n_chars - m.med) AS adev
        FROM documents d JOIN med m USING (source)
    ),
    mad AS (
        SELECT source, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY source
    )
    SELECT dev.doc_id, dev.source,
           CAST(dev.n_chars AS BIGINT) AS n_chars,
           floor(dev.med * 10.0 + 0.5) / 10.0 AS med_chars,
           floor((CASE WHEN mad.mad = 0 THEN 0.0
                       ELSE (dev.n_chars - dev.med)
                            / ({_MAD_C} * mad.mad) END) * 10000.0 + 0.5)
               / 10000.0 AS robust_z
    FROM dev JOIN mad USING (source)
    WHERE mad.mad > 0
      AND abs(dev.n_chars - dev.med) > {_MAD_Z} * {_MAD_C} * mad.mad
    """,
)
def mad_outlier_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    med = docs.groupBy("source").agg(
        F.percentile("n_chars", F.lit(0.5)).alias("med")
    )
    dev = docs.select("doc_id", "source", "n_chars").join(
        F.broadcast(med), "source"
    ).withColumn("adev", F.abs(F.col("n_chars") - F.col("med")))
    mad = dev.groupBy("source").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad")
    )
    rz = F.when(F.col("mad") == 0, F.lit(0.0)).otherwise(
        (F.col("n_chars") - F.col("med")) / (_MAD_C * F.col("mad"))
    )
    return (
        dev.join(F.broadcast(mad), "source")
        .filter(
            (F.col("mad") > 0)
            & (F.abs(F.col("n_chars") - F.col("med"))
               > _MAD_Z * _MAD_C * F.col("mad"))
        )
        .select(
            "doc_id",
            "source",
            F.col("n_chars").cast("long").alias("n_chars"),
            (F.floor(F.col("med") * 10.0 + 0.5) / 10.0).alias("med_chars"),
            (F.floor(rz * 10000.0 + 0.5) / 10000.0).alias("robust_z"),
        )
    )


# ---------------------------------------------------------------------------
# Pareto frontier (skyline) of the corpus on (token length, quality
# score) — the documents for which no other document is at least as
# long AND at least as good (strictly better on one axis). The curation
# answer to "show me the best long documents" without fixing a
# quality-vs-length weighting. Spark side: two-phase mapInPandas
# frontier (per-partition O(n log n) prune, final pass over survivors
# only — operators.skyline); oracle: the quadratic NOT EXISTS dominance
# definition. Both criteria are bit-exact cross-engine expressions, so
# dominance decisions agree exactly.
# ---------------------------------------------------------------------------
@query(
    "pareto_front_docs",
    f"""
    WITH d AS (
        SELECT doc_id,
               {token_count_sql_('text')} AS n_tokens,
               {quality_sql_('text')} AS quality
        FROM documents
    )
    SELECT p.doc_id, CAST(p.n_tokens AS BIGINT) AS n_tokens,
           floor(p.quality * 1000000.0 + 0.5) / 1000000.0 AS quality
    FROM d p
    WHERE NOT EXISTS (
        SELECT 1 FROM d q
        WHERE q.n_tokens >= p.n_tokens AND q.quality >= p.quality
          AND (q.n_tokens > p.n_tokens OR q.quality > p.quality)
    )
    """,
)
def pareto_front_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import quality_score, token_count
    from ..operators.skyline import pareto_front_2d

    docs = t(spark, sf_dir, "documents").select(
        "doc_id",
        token_count(F.col("text")).cast("double").alias("n_tokens"),
        quality_score(F.col("text")).alias("quality"),
    )
    front = pareto_front_2d(docs, "n_tokens", "quality")
    return front.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        (F.floor(F.col("quality") * 1000000.0 + 0.5) / 1000000.0).alias(
            "quality"
        ),
    )


# ---------------------------------------------------------------------------
# A/B experiment analysis — the two-proportion z-test every
# experimentation pipeline computes: users are deterministically
# hash-assigned to arms (md5 parity — the same stable-bucketing
# primitive the split operators use), conversion = any purchase event,
# z = (pA − pB) / sqrt(p̂(1−p̂)(1/nA + 1/nB)). Every input to the float
# expression is an exact integer (user counts, conversion counts), the
# expression is structurally identical on both engines, and sqrt is
# IEEE-exact — so the z-score is bit-deterministic with no
# summation-order exposure. One shuffle (the per-user groupBy); the arm
# assignment and the final 1-row reduction ride it.
# ---------------------------------------------------------------------------
@query(
    "ab_test_zscores",
    """
    WITH per_user AS (
        SELECT user_id,
               MAX(CASE WHEN event_type = 'purchase' AND value > 250
                        THEN 1 ELSE 0 END) AS converted
        FROM events GROUP BY user_id
    ),
    armed AS (
        SELECT CASE WHEN CAST(('0x' || substr(md5('ab1' ||
                        CAST(user_id AS VARCHAR)), 1, 7)) AS BIGINT) % 2 = 0
                    THEN 'A' ELSE 'B' END AS arm,
               converted
        FROM per_user
    ),
    s AS (
        SELECT
            CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
            CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
            CAST(SUM(CASE WHEN arm = 'A' THEN converted ELSE 0 END)
                 AS BIGINT) AS c_a,
            CAST(SUM(CASE WHEN arm = 'B' THEN converted ELSE 0 END)
                 AS BIGINT) AS c_b
        FROM armed
    )
    SELECT n_a, n_b, c_a, c_b,
           round(CAST(c_a AS DOUBLE) / n_a, 6) AS p_a,
           round(CAST(c_b AS DOUBLE) / n_b, 6) AS p_b,
           CASE WHEN n_a = 0 OR n_b = 0 OR c_a + c_b = 0
                     OR c_a + c_b = n_a + n_b THEN 0.0
                ELSE round((CAST(c_a AS DOUBLE) / n_a
                            - CAST(c_b AS DOUBLE) / n_b)
                 / sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                        * (1 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                        * (1.0 / n_a + 1.0 / n_b)), 6) END AS z
    FROM s
    """,
)
def ab_test_zscores(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 250),
                1,
            ).otherwise(0)
        ).alias("converted")
    )
    arm = F.when(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("ab1"), F.col("user_id").cast("string"))),
                1,
                7,
            ),
            16,
            10,
        ).cast("long")
        % 2
        == 0,
        "A",
    ).otherwise("B")
    armed = per_user.select(arm.alias("arm"), "converted")
    s = armed.agg(
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
        F.sum(F.when(F.col("arm") == "A", F.col("converted")).otherwise(0))
        .cast("long")
        .alias("c_a"),
        F.sum(F.when(F.col("arm") == "B", F.col("converted")).otherwise(0))
        .cast("long")
        .alias("c_b"),
    )
    p_a = F.col("c_a").cast("double") / F.col("n_a")
    p_b = F.col("c_b").cast("double") / F.col("n_b")
    pool = (F.col("c_a") + F.col("c_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    z = (p_a - p_b) / F.sqrt(
        pool * (1 - pool) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    )
    degenerate = (
        (F.col("n_a") == 0)
        | (F.col("n_b") == 0)
        | (F.col("c_a") + F.col("c_b") == 0)
        | (F.col("c_a") + F.col("c_b") == F.col("n_a") + F.col("n_b"))
    )
    return s.select(
        "n_a", "n_b", "c_a", "c_b",
        F.round(p_a, 6).alias("p_a"),
        F.round(p_b, 6).alias("p_b"),
        F.when(degenerate, F.lit(0.0)).otherwise(F.round(z, 6)).alias("z"),
    )


# ---------------------------------------------------------------------------
# Join-key skew report — the diagnostic you run BEFORE sizing a 100 TB
# shuffle: per-key count distribution (max, exact p50/p99, top-1 share,
# max/avg ratio) for the three join keys that matter in this schema.
# Each column costs one partial-agg groupBy over its table plus a
# one-row summary; the three one-row summaries union. Percentiles use
# the same linear-interpolation semantics on both engines
# (F.percentile == quantile_cont, proven by exact_percentiles).
# ---------------------------------------------------------------------------
def _skew_sql(table: str, col: str) -> str:
    return f"""
        SELECT '{table}.{col}' AS key,
               CAST(SUM(c) AS BIGINT) AS n_rows,
               CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(MAX(c) AS BIGINT) AS max_cnt,
               ROUND(MAX(c) * 1.0 / SUM(c), 6) AS top1_share,
               ROUND(quantile_cont(c, 0.5), 2) AS p50_cnt,
               ROUND(quantile_cont(c, 0.99), 2) AS p99_cnt,
               ROUND(MAX(c) * COUNT(*) * 1.0 / SUM(c), 4) AS skew_ratio
        FROM (SELECT {col}, COUNT(*) AS c FROM {table} GROUP BY {col})
    """


def _skew_report(df, table: str, col: str):
    counts = df.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
    return counts.agg(
        F.lit(f"{table}.{col}").alias("key"),
        F.sum("c").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("c").cast("long").alias("max_cnt"),
        F.round(F.max("c") * 1.0 / F.sum("c"), 6).alias("top1_share"),
        F.round(F.percentile("c", F.lit(0.5)), 2).alias("p50_cnt"),
        F.round(F.percentile("c", F.lit(0.99)), 2).alias("p99_cnt"),
        F.round(
            F.max("c") * F.count(F.lit(1)) * 1.0 / F.sum("c"), 4
        ).alias("skew_ratio"),
    )


@query(
    "skew_report_keys",
    f"""
    {_skew_sql('orders', 'o_custkey')}
    UNION ALL
    {_skew_sql('lineitem', 'l_partkey')}
    UNION ALL
    {_skew_sql('lineitem', 'l_suppkey')}
    """,
)
def skew_report_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    return (
        _skew_report(orders, "orders", "o_custkey")
        .unionAll(_skew_report(li, "lineitem", "l_partkey"))
        .unionAll(_skew_report(li, "lineitem", "l_suppkey"))
    )


# ---------------------------------------------------------------------------
# Distributed bootstrap CI — Poisson(1) bootstrap of the mean order
# value: each of B=32 resamples draws every row's multiplicity from a
# DETERMINISTIC uniform pushed through the Poisson inverse CDF
# (literal thresholds), so both engines materialize identical
# resamples — no RNG state, retry-safe, and the resample means are
# ratios of exact integer cents. Uniforms: ONE md5 per row (48-bit h)
# fanned into B lattice draws u_b = (h·(2b+1) + 7919b) mod 2^24 — an
# odd multiplier is a bijection mod 2^24, so every per-b marginal is
# exactly uniform over the hash values; draws for the same row are
# correlated across b (multiplicative lattice), a documented tradeoff
# that makes the fan-out ~9x cheaper than one md5 per (row, b). The fan-out is explode(1..B) with
# map-side partial aggregation into B groups; the CI is an exact
# percentile over the B-row mean table. This is the bootstrap shape
# that works at 100 TB: B scans' worth of partials in one pass, never
# B shuffles of the data.
# ---------------------------------------------------------------------------
_BOOT_B = 32
# Poisson(1) CDF thresholds for multiplicities 0..7
_POIS_CDF = [
    0.3678794412, 0.7357588823, 0.9196986029, 0.9810118431,
    0.9963401532, 0.9994058152, 0.9999167589, 0.9999897508,
]


def _pois_case_sql(u: str) -> str:
    branches = " ".join(
        f"WHEN {u} < {thr!r} THEN {k}"
        for k, thr in enumerate(_POIS_CDF)
    )
    return f"(CASE {branches} ELSE 8 END)"


@query(
    "bootstrap_ci_mean",
    f"""
    WITH base AS (
        SELECT o_orderkey,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders
    ),
    hashed AS (
        SELECT o_orderkey, cents,
               ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 12))
                   ::BIGINT AS h
        FROM base
    ),
    fanned AS (
        SELECT b.b, hashed.cents,
               ((hashed.h * (2 * b.b + 1) + 7919 * b.b) % 16777216)
                   / 16777216.0 AS u
        FROM hashed
        CROSS JOIN (SELECT unnest(generate_series(1, {_BOOT_B})) AS b) b
    ),
    resamples AS (
        SELECT b, SUM({_pois_case_sql('u')} * cents) AS w_cents,
               SUM({_pois_case_sql('u')}) AS w_n
        FROM fanned GROUP BY b
    ),
    means AS (
        SELECT b, w_cents / (w_n * 100.0) AS mean_value FROM resamples
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_resamples,
           ROUND(AVG(mean_value), 4) AS boot_mean,
           ROUND(quantile_cont(mean_value, 0.05), 4) AS ci_lo,
           ROUND(quantile_cont(mean_value, 0.95), 4) AS ci_hi
    FROM means
    """,
)
def bootstrap_ci_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + 0.5)
        .cast("long")
        .alias("cents"),
    )
    hashed = base.select(
        "cents",
        F.conv(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 12),
            16,
            10,
        )
        .cast("long")
        .alias("h"),
    )
    fanned = hashed.select(
        F.explode(F.sequence(F.lit(1), F.lit(_BOOT_B))).alias("b"),
        "cents",
        "h",
    ).withColumn(
        "u",
        F.pmod(
            F.col("h") * (2 * F.col("b") + 1) + 7919 * F.col("b"),
            F.lit(16777216),
        )
        / 16777216.0,
    )
    mult = F.lit(8)
    for k in range(len(_POIS_CDF) - 1, -1, -1):
        mult = F.when(F.col("u") < _POIS_CDF[k], F.lit(k)).otherwise(mult)
    resamples = fanned.select("b", "cents", mult.alias("m")).groupBy(
        "b"
    ).agg(
        F.sum(F.col("m") * F.col("cents")).alias("w_cents"),
        F.sum("m").alias("w_n"),
    )
    means = resamples.select(
        (F.col("w_cents") / (F.col("w_n") * 100.0)).alias("mean_value")
    )
    return means.agg(
        F.count(F.lit(1)).cast("long").alias("n_resamples"),
        F.round(F.avg("mean_value"), 4).alias("boot_mean"),
        F.round(F.percentile("mean_value", F.lit(0.05)), 4).alias("ci_lo"),
        F.round(F.percentile("mean_value", F.lit(0.95)), 4).alias("ci_hi"),
    )


# ---------------------------------------------------------------------------
# Equi-depth histogram — the ANALYZE-stats primitive: 10 bins of
# (approximately) equal row count over o_totalprice, bounded by exact
# decile edges (F.percentile == quantile_cont on both engines, proven
# by exact_percentiles). Edges come from ONE percentile aggregate
# broadcast back; bin assignment is a codegen comparison chain. The
# per-bin count + exact-cents sum value-check that assignment and
# boundary tie-handling (right-closed except the last bin) agree.
# ---------------------------------------------------------------------------
_HIST_BINS = 10


@query(
    "histogram_equi_depth",
    f"""
    WITH edges AS (
        SELECT {', '.join(f"quantile_cont(o_totalprice, {i / _HIST_BINS}) AS e{i}" for i in range(1, _HIST_BINS))}
        FROM orders
    ),
    binned AS (
        SELECT CASE
               {' '.join(f"WHEN o_totalprice <= e{i} THEN {i - 1}" for i in range(1, _HIST_BINS))}
               ELSE {_HIST_BINS - 1} END AS bin,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders CROSS JOIN edges
    )
    SELECT bin, COUNT(*) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM binned GROUP BY bin
    """,
)
def histogram_equi_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    # ONE percentile aggregate with an array of percentages: nine
    # separate F.percentile aggs each buffer the full column (9 object
    # buffers, 4.4s at sf0.1); the array form buffers once (1.1s).
    edges = orders.agg(
        F.percentile(
            "o_totalprice",
            F.array(*[F.lit(i / _HIST_BINS) for i in range(1, _HIST_BINS)]),
        ).alias("es")
    ).select(
        *[
            F.col("es")[i - 1].alias(f"e{i}")
            for i in range(1, _HIST_BINS)
        ]
    )
    bin_col = F.lit(_HIST_BINS - 1)
    for i in range(_HIST_BINS - 1, 0, -1):
        bin_col = F.when(
            F.col("o_totalprice") <= F.col(f"e{i}"), F.lit(i - 1)
        ).otherwise(bin_col)
    binned = orders.join(F.broadcast(edges)).select(
        bin_col.alias("bin"),
        F.floor(F.col("o_totalprice") * 100 + 0.5)
        .cast("long")
        .alias("cents"),
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("cents").cast("long").alias("sum_cents"),
    )


# ---------------------------------------------------------------------------
# Population-stability-index drift report — the standard "did the
# distribution move" monitor between a reference and a current sample
# (here the deterministic even/odd o_orderkey halves): numeric PSI over
# o_totalprice binned by REFERENCE deciles, categorical PSI over
# o_orderpriority's literal classes. Per-bin proportions are ratios of
# exact integer counts (+0.5 smoothing per bin so empty bins stay
# finite); each PSI is a FIXED-ORDER sum of per-bin (p−q)·ln(p/q)
# terms built from pivoted one-row aggregates, so no float summation
# order exists anywhere. One scan per feature; edges broadcast.
# ---------------------------------------------------------------------------
_PSI_BINS = 10
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def _psi_term_sql(p: str, q: str) -> str:
    return f"(({p}) - ({q})) * ln(({p}) / ({q}))"


def _psi_numeric_sql() -> str:
    edges = ", ".join(
        f"quantile_cont(CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice END,"
        f" {i / _PSI_BINS}) AS e{i}"
        for i in range(1, _PSI_BINS)
    )
    bin_case = " ".join(
        f"WHEN o_totalprice <= e{i} THEN {i - 1}"
        for i in range(1, _PSI_BINS)
    )
    counts = ", ".join(
        f"SUM(CASE WHEN bin = {b} AND ref THEN 1 ELSE 0 END) AS r{b}, "
        f"SUM(CASE WHEN bin = {b} AND NOT ref THEN 1 ELSE 0 END) AS c{b}"
        for b in range(_PSI_BINS)
    )
    terms = " + ".join(
        _psi_term_sql(
            f"(r{b} + 0.5) / (nr + {_PSI_BINS * 0.5})",
            f"(c{b} + 0.5) / (nc + {_PSI_BINS * 0.5})",
        )
        for b in range(_PSI_BINS)
    )
    return f"""
        SELECT 'o_totalprice' AS feature,
               ROUND({terms}, 6) AS psi,
               CAST(nr AS BIGINT) AS n_ref, CAST(nc AS BIGINT) AS n_cur
        FROM (
            SELECT {counts},
                   SUM(CASE WHEN ref THEN 1 ELSE 0 END) AS nr,
                   SUM(CASE WHEN NOT ref THEN 1 ELSE 0 END) AS nc
            FROM (
                SELECT o_orderkey % 2 = 0 AS ref,
                       CASE {bin_case} ELSE {_PSI_BINS - 1} END AS bin
                FROM orders CROSS JOIN (SELECT {edges} FROM orders)
            )
        )
    """


def _psi_cat_sql() -> str:
    k = len(_PRIORITIES)
    counts = ", ".join(
        f"SUM(CASE WHEN o_orderpriority = '{p}' AND o_orderkey % 2 = 0"
        f" THEN 1 ELSE 0 END) AS r{b}, "
        f"SUM(CASE WHEN o_orderpriority = '{p}' AND o_orderkey % 2 <> 0"
        f" THEN 1 ELSE 0 END) AS c{b}"
        for b, p in enumerate(_PRIORITIES)
    )
    terms = " + ".join(
        _psi_term_sql(
            f"(r{b} + 0.5) / (nr + {k * 0.5})",
            f"(c{b} + 0.5) / (nc + {k * 0.5})",
        )
        for b in range(k)
    )
    return f"""
        SELECT 'o_orderpriority' AS feature,
               ROUND({terms}, 6) AS psi,
               CAST(nr AS BIGINT) AS n_ref, CAST(nc AS BIGINT) AS n_cur
        FROM (
            SELECT {counts},
                   SUM(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS nr,
                   SUM(CASE WHEN o_orderkey % 2 <> 0 THEN 1 ELSE 0 END) AS nc
            FROM orders
        )
    """


@query(
    "psi_drift_orders",
    _psi_numeric_sql() + " UNION ALL " + _psi_cat_sql(),
)
def psi_drift_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    ref = F.col("o_orderkey") % 2 == 0
    # numeric feature: reference-decile bins
    edges = orders.agg(
        F.percentile(
            F.when(ref, F.col("o_totalprice")),
            F.array(
                *[F.lit(i / _PSI_BINS) for i in range(1, _PSI_BINS)]
            ),
        ).alias("es")
    ).select(
        *[F.col("es")[i - 1].alias(f"e{i}") for i in range(1, _PSI_BINS)]
    )
    bin_col = F.lit(_PSI_BINS - 1)
    for i in range(_PSI_BINS - 1, 0, -1):
        bin_col = F.when(
            F.col("o_totalprice") <= F.col(f"e{i}"), F.lit(i - 1)
        ).otherwise(bin_col)
    # ONE pass computes both features' bin counts: the broadcast of the
    # 1-row edges frame attaches the decile cuts to the same scan the
    # categorical sums read (previously the numeric and categorical
    # aggregates were two full scans of orders). The 1-row result is
    # materialized so the two output rows below don't each re-run it.
    binned = orders.join(F.broadcast(edges)).select(
        ref.alias("ref"), bin_col.alias("bin"), "o_orderpriority"
    )
    aggs = []
    for b in range(_PSI_BINS):
        aggs.append(
            F.sum(
                F.when((F.col("bin") == b) & F.col("ref"), 1).otherwise(0)
            ).alias(f"r{b}")
        )
        aggs.append(
            F.sum(
                F.when((F.col("bin") == b) & ~F.col("ref"), 1).otherwise(0)
            ).alias(f"c{b}")
        )
    for b, pri in enumerate(_PRIORITIES):
        m = F.col("o_orderpriority") == pri
        aggs.append(
            F.sum(F.when(m & F.col("ref"), 1).otherwise(0)).alias(f"kr{b}")
        )
        aggs.append(
            F.sum(F.when(m & ~F.col("ref"), 1).otherwise(0)).alias(f"kc{b}")
        )
    aggs.append(F.sum(F.when(F.col("ref"), 1).otherwise(0)).alias("nr"))
    aggs.append(F.sum(F.when(~F.col("ref"), 1).otherwise(0)).alias("nc"))
    one_row = binned.agg(*aggs)

    def psi_expr(n_bins: int, prefix_r: str, prefix_c: str) -> F.Column:
        total = None
        for b in range(n_bins):
            p = (F.col(f"{prefix_r}{b}") + 0.5) / (F.col("nr") + n_bins * 0.5)
            q = (F.col(f"{prefix_c}{b}") + 0.5) / (F.col("nc") + n_bins * 0.5)
            term = (p - q) * F.log(p / q)
            total = term if total is None else total + term
        return total

    def _row(feature: str, psi: F.Column) -> F.Column:
        return F.struct(
            F.lit(feature).alias("feature"),
            F.round(psi, 6).alias("psi"),
            F.col("nr").cast("long").alias("n_ref"),
            F.col("nc").cast("long").alias("n_cur"),
        )

    # Both feature rows fan out of the single 1-row aggregate with one
    # explode — a union of two selects would re-run the aggregate per row.
    rows = [
        _row("o_totalprice", psi_expr(_PSI_BINS, "r", "c")),
        _row("o_orderpriority", psi_expr(len(_PRIORITIES), "kr", "kc")),
    ]
    return one_row.select(F.explode(F.array(*rows)).alias("__r")).select(
        "__r.*"
    )


# ---------------------------------------------------------------------------
# k-anonymity / l-diversity audit — the privacy-readiness check a
# training-data release pipeline runs before shipping user-derived
# rows. Equivalence classes are the quasi-identifier tuple (nation,
# market segment, coarse balance bucket); a class re-identifies when
# fewer than K individuals share it, and leaks its sensitive attribute
# when all of them share one value (l-diversity = 1). Plan shape: ONE
# customer⋈orders join shuffled on custkey (the sensitive attribute
# ride-along), then one groupBy onto the QI tuple with a distinct-count
# — class stats are QI-cardinality-sized, never row-sized, and the
# audit parallelizes like any aggregation at 100 TB. The balance bucket
# floors an identical double on both engines; every other statistic is
# an exact integer.
# ---------------------------------------------------------------------------
@query(
    "k_anonymity_audit",
    """
    WITH joined AS (
        SELECT c.c_nationkey, c.c_mktsegment,
               CAST(floor(c.c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
               c.c_custkey,
               coalesce(o.o_orderstatus, 'NONE') AS sensitive
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    )
    SELECT c_nationkey, c_mktsegment, bal_bucket,
           COUNT(DISTINCT c_custkey) AS n_individuals,
           COUNT(DISTINCT sensitive) AS l_diversity,
           COUNT(DISTINCT c_custkey) >= 5 AS is_k_anonymous
    FROM joined
    GROUP BY c_nationkey, c_mktsegment, bal_bucket
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("bal_bucket"),
    )
    orders = t(spark, sf_dir, "orders").select("o_custkey", "o_orderstatus")
    joined = cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left"
    ).select(
        "c_nationkey",
        "c_mktsegment",
        "bal_bucket",
        "c_custkey",
        F.coalesce(F.col("o_orderstatus"), F.lit("NONE")).alias("sensitive"),
    )
    return joined.groupBy("c_nationkey", "c_mktsegment", "bal_bucket").agg(
        F.countDistinct("c_custkey").alias("n_individuals"),
        F.countDistinct("sensitive").alias("l_diversity"),
        (F.countDistinct("c_custkey") >= 5).alias("is_k_anonymous"),
    )


# ---------------------------------------------------------------------------
# Differentially-private release counts — the Laplace mechanism over
# the per-language document counts (sensitivity 1 for a count query;
# epsilon = 0.5 -> scale b = 2). The noise is drawn by INVERSE CDF from
# a seeded md5 uniform (the bootstrap lattice trick), so the whole
# mechanism is one closed-form expression both engines evaluate
# identically; the ln term is quantized to micro-units per the repo's
# exact-moments convention. DETERMINISM CAVEAT (documented, not
# hidden): a production DP release must use a fresh secret RNG — the
# seeded draw here exists so the MECHANISM (inverse-CDF Laplace,
# sensitivity accounting, post-processing rounding) is value-checkable
# cross-engine; swapping the uniform source changes one line.
# ---------------------------------------------------------------------------
_DP_EPS = 0.5
_DP_B = 1.0 / _DP_EPS  # Laplace scale = sensitivity / epsilon


@query(
    "dp_noisy_lang_counts",
    f"""
    WITH counts AS (
        SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
    ),
    unif AS (
        SELECT lang, n,
               ((('0x' || substr(md5(lang), 1, 12))::BIGINT % 16777216)
                + 0.5) / 16777216.0 AS u
        FROM counts
    ),
    noise AS (
        SELECT lang, n,
               CAST(floor(
                   (CASE WHEN u < 0.5
                         THEN {_DP_B} * ln(2.0 * u)
                         ELSE -{_DP_B} * ln(2.0 * (1.0 - u)) END)
                   * 1000000.0 + 0.5) AS BIGINT) AS noise_micro
        FROM unif
    )
    SELECT lang,
           ROUND(n + noise_micro / 1000000.0, 6) AS noisy_count,
           {_DP_EPS} AS epsilon
    FROM noise
    """,
)
def dp_noisy_lang_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = (
        t(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    u = (
        (
            F.conv(F.substring(F.md5(F.col("lang")), 1, 12), 16, 10).cast(
                "long"
            )
            % 16777216
        )
        + 0.5
    ) / 16777216.0
    lap = F.when(u < 0.5, _DP_B * F.log(2.0 * u)).otherwise(
        -_DP_B * F.log(2.0 * (1.0 - u))
    )
    noise_micro = F.floor(lap * 1000000.0 + 0.5).cast("long")
    return counts.select(
        "lang",
        F.round(F.col("n") + noise_micro / 1000000.0, 6).alias(
            "noisy_count"
        ),
        F.lit(_DP_EPS).alias("epsilon"),
    )
