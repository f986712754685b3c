"""Statistical auditing family — concentration, digit-law conformance,
survival analysis, autocorrelation.

Four classic analyst operators the reference's relational surface cannot
express directly, each built scale-first:

- ``gini_revenue_concentration``: per-nation Gini coefficient of
  customer revenue. One fact shuffle (orders → per-customer cents), a
  key-co-partitioned dimension join, then rank/sum windows per nation.
  The Gini is computed from the closed form over sorted values
  G = (2·Σ i·x_i − (n+1)·Σ x_i) / (n·Σ x_i) with every term an exact
  BIGINT (integer cents × integer ranks) — only the final division is
  float, so the cross-engine hash is exact. At much larger n·x̄, requote
  cents to dollars to keep Σ i·x_i inside int64 (documented bound).
- ``benford_first_digit``: first-significant-digit audit of order
  totals vs Benford's law. The digit comes from the DECIMAL RENDERING
  of the exact integer cents (integer→string is portable; float→string
  is not), counts aggregate in one pass, and the expected shares are
  pinned repr() literals so both engines parse the identical double.
  The chi-square contribution is quantized to integer micro-units per
  digit before any cross-row arithmetic.
- ``kaplan_meier_churn``: Kaplan-Meier survival over user lifetimes in
  the event stream. "Churn" = the first silence longer than 48 hours
  (including the tail silence to the global horizon); users with no
  such gap are right-censored at their last event. The heavy phase is
  per-user lag windows on the fact shuffle; the KM product itself folds
  over the ≤31-row duration-day dimension, with per-step ln terms
  quantized to integer micro-nats (the zipf_slope convention) so the
  cumulative log-survival is an exact BIGINT.
- ``acf_daily_revenue``: autocorrelation of the daily purchase-revenue
  series at lags 1..7. The only fact-sized work is the groupBy onto
  epoch-days; deviations are scaled by n (d_t = n·x_t − S) so numerator
  and denominator are exact BIGINT sums — the textbook trick for exact
  cross-engine moments without float-order risk. Lag pairing joins the
  day DIMENSION to itself on day = day+k (gap-days pair only with real
  days, so the statistic is well-defined on sparse series).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .registry import query
from .relational import t

# ---------------------------------------------------------------------------
# Gini coefficient of revenue concentration per nation.
# ---------------------------------------------------------------------------


@query(
    "gini_revenue_concentration",
    """
    WITH per_cust AS (
        SELECT o_custkey,
               CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                    AS BIGINT) AS x
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT n.n_name AS nation, x,
               CAST(ROW_NUMBER() OVER (PARTITION BY n.n_name
                                       ORDER BY x, p.o_custkey) AS BIGINT) AS i
        FROM per_cust p
        JOIN customer c ON c.c_custkey = p.o_custkey
        JOIN nation n   ON n.n_nationkey = c.c_nationkey
    )
    SELECT nation,
           COUNT(*) AS n_customers,
           CAST(SUM(x) AS BIGINT) / 100.0 AS total_revenue,
           CAST(2 * SUM(i * x) - (COUNT(*) + 1) * SUM(x) AS BIGINT)
               / CAST(COUNT(*) * SUM(x) AS BIGINT) AS gini
    FROM ranked
    GROUP BY nation
    ORDER BY nation
    """,
)
def gini_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation Gini of customer revenue (revenue-active customers).

    Plan: orders aggregate to customer grain (the ONLY fact shuffle),
    customer/nation attach as dimension joins, and the within-nation
    rank rides edf.grouped_ordered_rank — per-(nation, range-bucket)
    window partitions with driver-cumulated bucket offsets, because a
    nation is a 25-value skewed key and customers scale with the data:
    a bare per-nation window is |customers|/25 through one task at
    100 TB (the r12 skew-partition-window lint class). All Gini terms
    are exact BIGINTs; int64 holds while n·Σx stays under ~9e18
    (requote to dollars past that).
    """
    from ..operators.edf import grouped_ordered_rank

    cents = F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")
    per_cust = (
        t(spark, sf_dir, "orders")
        .select("o_custkey", cents.alias("c"))
        .groupBy("o_custkey")
        .agg(F.sum("c").cast("long").alias("x"))
    )
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = (
        per_cust.join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .select(F.col("n_name").alias("nation"), "x", "o_custkey")
    )
    # gate_from: the size-gate probe needs only an UPPER BOUND on the
    # largest nation's row count; customers-per-nationkey bounds
    # revenue-active-customers-per-nation (the join is 1:1 on customer,
    # the aggregate only drops customers), and the one-column customer
    # scan is far cheaper than re-executing the orders aggregate + two
    # joins just to decide the gate.
    ranked = grouped_ordered_rank(
        joined, ["nation"], ["x", "o_custkey"], "i",
        gate_from=cust, gate_group_cols=["c_nationkey"],
    ).select("nation", "x", F.col("i").cast("long").alias("i"))
    n = F.count(F.lit(1)).cast("long")
    sx = F.sum("x").cast("long")
    six = F.sum(F.col("i") * F.col("x")).cast("long")
    return (
        ranked.groupBy("nation")
        .agg(
            n.alias("n_customers"),
            (sx / 100.0).alias("total_revenue"),
            (
                (2 * six - (n + 1) * sx).cast("long")
                / (n * sx).cast("long")
            ).alias("gini"),
        )
        .orderBy("nation")
    )


# ---------------------------------------------------------------------------
# Benford first-digit audit.
# ---------------------------------------------------------------------------

_BENFORD = {d: math.log10(1 + 1 / d) for d in range(1, 10)}
# CAST AS DOUBLE: DuckDB types a bare decimal literal as DECIMAL and
# propagates fixed-point arithmetic (which overflows when squared);
# Spark types it DOUBLE. The cast pins both engines to the same IEEE
# double parsed from the same repr() digits.
_BENFORD_SQL_CASE = "CASE digit " + " ".join(
    f"WHEN {d} THEN CAST({p!r} AS DOUBLE)" for d, p in _BENFORD.items()
) + " END"


@query(
    "benford_first_digit",
    f"""
    WITH cents AS (
        SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS c
        FROM orders
    ),
    digits AS (
        SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INT) AS digit
        FROM cents
    ),
    counts AS (
        SELECT digit, COUNT(*) AS n_obs FROM digits GROUP BY digit
    ),
    with_tot AS (
        SELECT digit, n_obs, SUM(n_obs) OVER () AS n_total FROM counts
    )
    SELECT digit,
           n_obs,
           CAST(n_obs AS BIGINT) / CAST(n_total AS BIGINT) AS obs_share,
           {_BENFORD_SQL_CASE} AS exp_share,
           CAST(floor((n_obs - n_total * ({_BENFORD_SQL_CASE}))
                      * (n_obs - n_total * ({_BENFORD_SQL_CASE}))
                      / (n_total * ({_BENFORD_SQL_CASE}))
                      * 1000000.0 + 0.5) AS BIGINT) AS chi_term_micro
    FROM with_tot
    ORDER BY digit
    """,
)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-digit distribution of order totals vs Benford expectation.

    The first digit is taken from the string rendering of the EXACT
    integer cents — BIGINT→string is identical across engines, while
    float→string formatting is not. One groupBy onto nine digit rows;
    shares and chi-square terms are computed on that nine-row dimension
    (window total, no second scan). The expected shares are repr()
    literals, so both engines parse bit-identical doubles, and each
    chi-square contribution quantizes to integer micro-units before it
    leaves the row.
    """
    cents = F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")
    digit = F.substring(cents.cast("string"), 1, 1).cast("int").alias("digit")
    counts = (
        t(spark, sf_dir, "orders")
        .select(digit)
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    n_total = F.sum("n_obs").over(Window.partitionBy())
    exp_share = F.when(F.lit(False), F.lit(None).cast("double"))
    for d, p in _BENFORD.items():
        exp_share = exp_share.when(F.col("digit") == d, F.lit(p))
    dev = F.col("n_obs") - F.col("n_total") * F.col("exp_share")
    return (
        counts.withColumn("n_total", n_total)
        .withColumn("exp_share", exp_share)
        .select(
            "digit",
            "n_obs",
            (F.col("n_obs").cast("long") / F.col("n_total").cast("long")).alias(
                "obs_share"
            ),
            "exp_share",
            F.floor(
                dev * dev / (F.col("n_total") * F.col("exp_share")) * 1000000.0
                + 0.5
            )
            .cast("long")
            .alias("chi_term_micro"),
            "n_total",
        )
        .drop("n_total")
        .orderBy("digit")
    )


# ---------------------------------------------------------------------------
# Kaplan-Meier survival over user lifetimes.
# ---------------------------------------------------------------------------

_GAP_US = 48 * 3600 * 1_000_000  # churn = first silence > 48h
_DAY_US = 86_400_000_000.0
_LN_FLOOR_MICRO = -20_000_000  # pinned log-term when survival hits zero


@query(
    "kaplan_meier_churn",
    f"""
    WITH ev AS (SELECT user_id, epoch_us(ts) AS us FROM events),
    h AS (SELECT MAX(us) AS h_us FROM ev),
    gaps AS (
        SELECT user_id, us,
               COALESCE(LEAD(us) OVER (PARTITION BY user_id ORDER BY us),
                        (SELECT h_us FROM h)) - us AS gap_us
        FROM ev
    ),
    per_user AS (
        SELECT user_id,
               MIN(us) AS first_us,
               MIN(CASE WHEN gap_us > {_GAP_US} THEN us END) AS churn_us,
               MAX(us) AS last_us
        FROM gaps GROUP BY user_id
    ),
    durations AS (
        SELECT CAST(floor((COALESCE(churn_us, last_us) - first_us)
                          / {_DAY_US}) AS BIGINT) AS duration_days,
               CASE WHEN churn_us IS NOT NULL THEN 1 ELSE 0 END AS ev
        FROM per_user
    ),
    km AS (
        SELECT duration_days,
               CAST(SUM(ev) AS BIGINT) AS n_churned,
               CAST(SUM(1 - ev) AS BIGINT) AS n_censored_at
        FROM durations GROUP BY duration_days
    ),
    risk AS (
        SELECT duration_days, n_churned, n_censored_at,
               CAST(SUM(n_churned + n_censored_at) OVER () -
                    COALESCE(SUM(n_churned + n_censored_at)
                             OVER (ORDER BY duration_days
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
        FROM km
    ),
    terms AS (
        SELECT *,
               CASE WHEN n_churned = 0 THEN 0
                    WHEN n_risk > n_churned THEN
                        CAST(floor(ln((CAST(n_risk - n_churned AS BIGINT)
                                       / CAST(n_risk AS BIGINT)))
                                   * 1000000.0) AS BIGINT)
                    ELSE {_LN_FLOOR_MICRO} END AS ln_term_micro
        FROM risk
    )
    SELECT duration_days, n_risk, n_churned, n_censored_at,
           CAST(SUM(ln_term_micro) OVER (ORDER BY duration_days
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS BIGINT)
               AS log_surv_micro
    FROM terms
    WHERE n_churned > 0
    ORDER BY duration_days
    """,
)
def kaplan_meier_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival of user lifetimes (48h-silence churn).

    Phase 1 (fact-sized): per-user lead window over the event stream —
    one shuffle keyed on user_id; the global horizon is a 1-row
    broadcast. Phase 2 (dimension-sized): the KM table folds over the
    ≤31 duration-day rows with ordered windows; per-step ln terms
    quantize to integer micro-nats so the cumulative log-survival is an
    exact BIGINT (survival = exp(log_surv_micro/1e6), left to the
    caller — exp() is not bit-portable across libms, the integer is).
    Users whose every silence is ≤48h (incl. the tail to the horizon)
    are right-censored at their last event and thin the risk set
    without a survival step — the standard KM treatment.
    """
    ev = t(spark, sf_dir, "events").select(
        "user_id", F.expr("unix_micros(ts)").alias("us")
    )
    h = ev.agg(F.max("us").alias("h_us"))
    w = Window.partitionBy("user_id").orderBy("us")
    gaps = ev.join(F.broadcast(h)).select(
        "user_id",
        "us",
        (
            F.coalesce(F.lead("us").over(w), F.col("h_us")) - F.col("us")
        ).alias("gap_us"),
    )
    per_user = gaps.groupBy("user_id").agg(
        F.min("us").alias("first_us"),
        F.min(F.when(F.col("gap_us") > _GAP_US, F.col("us"))).alias("churn_us"),
        F.max("us").alias("last_us"),
    )
    durations = per_user.select(
        F.floor(
            (F.coalesce("churn_us", "last_us") - F.col("first_us")) / _DAY_US
        )
        .cast("long")
        .alias("duration_days"),
        F.when(F.col("churn_us").isNotNull(), 1).otherwise(0).alias("ev"),
    )
    km = durations.groupBy("duration_days").agg(
        F.sum("ev").cast("long").alias("n_churned"),
        F.sum(1 - F.col("ev")).cast("long").alias("n_censored_at"),
    )
    at = F.col("n_churned") + F.col("n_censored_at")
    prior = Window.orderBy("duration_days").rowsBetween(
        Window.unboundedPreceding, -1
    )
    risk = km.withColumn(
        "n_risk",
        (
            F.sum(at).over(Window.partitionBy())
            - F.coalesce(F.sum(at).over(prior), F.lit(0))
        ).cast("long"),
    )
    surv_ratio = (F.col("n_risk") - F.col("n_churned")).cast("long") / F.col(
        "n_risk"
    ).cast("long")
    terms = risk.withColumn(
        "ln_term_micro",
        F.when(F.col("n_churned") == 0, F.lit(0))
        .when(
            F.col("n_risk") > F.col("n_churned"),
            F.floor(F.log(surv_ratio) * 1000000.0).cast("long"),
        )
        .otherwise(F.lit(_LN_FLOOR_MICRO)),
    )
    run = Window.orderBy("duration_days").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        terms.withColumn(
            "log_surv_micro", F.sum("ln_term_micro").over(run).cast("long")
        )
        .filter(F.col("n_churned") > 0)
        .select(
            "duration_days",
            "n_risk",
            "n_churned",
            "n_censored_at",
            "log_surv_micro",
        )
        .orderBy("duration_days")
    )


# ---------------------------------------------------------------------------
# Autocorrelation of the daily revenue series.
# ---------------------------------------------------------------------------

_MAX_LAG = 7


@query(
    "acf_daily_revenue",
    f"""
    WITH daily AS (
        SELECT CAST(floor(epoch_us(ts) / {_DAY_US}) AS BIGINT) AS day,
               CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
                    AS BIGINT) AS x
        FROM events WHERE event_type = 'purchase' GROUP BY day
    ),
    mom AS (
        SELECT day, x,
               CAST(COUNT(*) OVER () AS BIGINT) AS n,
               CAST(SUM(x) OVER () AS BIGINT) AS s
        FROM daily
    ),
    dev AS (
        SELECT day, CAST(n * x - s AS BIGINT) AS d,
               CAST(SUM((n * x - s) * (n * x - s)) OVER () AS BIGINT)
                   AS denom
        FROM mom
    ),
    lags AS (SELECT UNNEST(range(1, {_MAX_LAG} + 1)) AS lag),
    pairs AS (
        SELECT l.lag AS lag, a.d AS da, b.d AS db, a.denom AS denom
        FROM dev a CROSS JOIN lags l
        JOIN dev b ON b.day = a.day - l.lag
    )
    SELECT CAST(lag AS INT) AS lag,
           COUNT(*) AS n_pairs,
           CAST(SUM(da * db) AS BIGINT) / CAST(MAX(denom) AS BIGINT) AS acf
    FROM pairs
    GROUP BY lag
    ORDER BY lag
    """,
)
def acf_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample ACF of daily purchase revenue at lags 1..7.

    The fact-sized phase is one groupBy onto epoch-days; everything
    after runs on the ≤31-row day dimension (global windows there are
    dimension-sized by construction). Deviations are scaled by n
    (d_t = n·x_t − S) so the ACF numerator and denominator are exact
    BIGINT sums — the n² factors cancel in the ratio, and the single
    final division is the only float op. Lag pairs join day = day+k,
    so missing days pair with nothing rather than shifting the series.
    int64 bound: n·x̄ ≈ 3e7 at sf0.1 → Σd² ≈ 3e16; requote to dollars
    if daily cents ever approach 3e14.
    """
    cents = F.floor(F.col("value") * 100.0 + 0.5).cast("long")
    daily = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.floor(F.expr("unix_micros(ts)") / _DAY_US)
            .cast("long")
            .alias("day"),
            cents.alias("c"),
        )
        .groupBy("day")
        .agg(F.sum("c").cast("long").alias("x"))
    )
    w_all = Window.partitionBy()
    mom = daily.select(
        "day",
        "x",
        F.count(F.lit(1)).over(w_all).cast("long").alias("n"),
        F.sum("x").over(w_all).cast("long").alias("s"),
    )
    d = (F.col("n") * F.col("x") - F.col("s")).cast("long")
    # Materialization boundary: both sides of the lag self-join read the
    # ≤31-row day dimension — without it the b-side REPLAYS the full
    # events scan + groupBy (a 2× fact scan at 100 TB, visible as a
    # second `Scan parquet .*events` in the plan; plan-shape-tested).
    from .registry import swap_cache

    dev = swap_cache(
        "stats.acf_dev",
        sf_dir,
        mom.select(
            "day",
            d.alias("d"),
            F.sum(d * d).over(w_all).cast("long").alias("denom"),
        ),
    )
    lags = F.explode(
        F.array([F.lit(k) for k in range(1, _MAX_LAG + 1)])
    ).alias("lag")
    a = dev.select("day", "d", "denom").withColumn("lag", lags)
    b = dev.select(F.col("day").alias("bday"), F.col("d").alias("db"))
    pairs = a.join(b, F.col("bday") == F.col("day") - F.col("lag"))
    return (
        pairs.groupBy(F.col("lag").cast("int").alias("lag"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            (
                F.sum(F.col("d") * F.col("db")).cast("long")
                / F.max("denom").cast("long")
            ).alias("acf"),
        )
        .orderBy("lag")
    )


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov — EXACT, with no global window: the EDF
# prefix sums come from operators.edf.ordered_cumsum (range-bucketed
# two-phase cumsum, the dense_ids machinery), and the max compares the
# exact integer numerator |cumA·nB − cumB·nA|, dividing by nA·nB only
# on the final single row. The oracle uses DuckDB's serial window —
# feasible at oracle scale — so the driver check proves the distributed
# prefix-sum plumbing against the straightforward definition.
# ---------------------------------------------------------------------------
@query(
    "ks_test_segments",
    """
    WITH j AS (
        SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS v,
               CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS f
        FROM orders
        JOIN customer ON c_custkey = o_custkey
        WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
    ),
    pv AS (
        SELECT v, CAST(SUM(f) AS BIGINT) AS c_a,
               CAST(SUM(1 - f) AS BIGINT) AS c_b
        FROM j GROUP BY v
    ),
    cum AS (
        SELECT v,
               CAST(SUM(c_a) OVER (ORDER BY v) AS BIGINT) AS ca,
               CAST(SUM(c_b) OVER (ORDER BY v) AS BIGINT) AS cb
        FROM pv
    ),
    n AS (SELECT CAST(SUM(c_a) AS BIGINT) AS n_a,
                 CAST(SUM(c_b) AS BIGINT) AS n_b
          FROM pv)
    SELECT n.n_a, n.n_b,
           CAST(MAX(abs(ca * n.n_b - cb * n.n_a)) AS BIGINT) AS d_num,
           ROUND(CAST(MAX(abs(ca * n.n_b - cb * n.n_a)) AS BIGINT)
                 / (n.n_a * n.n_b), 6) AS d_stat
    FROM cum CROSS JOIN n
    GROUP BY n.n_a, n.n_b
    """,
)
def ks_test_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does order value distribute differently across the BUILDING and
    MACHINERY segments? Plan: customer is a broadcast dimension filter,
    the single fact shuffle is the groupBy onto value grain, and all
    EDF work runs on the value-grain relation."""
    from ..operators.edf import ks_two_sample

    cust = t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    )
    j = (
        t(spark, sf_dir, "orders")
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .select(
            F.floor(F.col("o_totalprice") * 100.0 + 0.5)
            .cast("long")
            .alias("v"),
            F.when(F.col("c_mktsegment") == "BUILDING", 1)
            .otherwise(0)
            .alias("f"),
        )
    )
    return ks_two_sample(j, "v", "f")


# ---------------------------------------------------------------------------
# Mann-Whitney U (Wilcoxon rank-sum) with midrank tie handling — the
# nonparametric A/B companion to ks_test_segments, and the second
# consumer of operators/edf.ordered_cumsum (no global window). All rank
# arithmetic stays in exact BIGINTs by carrying DOUBLED quantities:
# 2·R1 = Σ c_a·(2·cum_before + c_t + 1), 2·U1 = 2·R1 − n1(n1+1), and
# the tie-corrected variance uses T = Σ(c_t³−c_t) — the only floats are
# the final z division and sqrt, identical single IEEE expressions on
# both engines.
# ---------------------------------------------------------------------------
@query(
    "mannwhitney_segments",
    """
    WITH j AS (
        SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS v,
               CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END AS f
        FROM orders
        JOIN customer ON c_custkey = o_custkey
        WHERE c_mktsegment IN ('AUTOMOBILE', 'HOUSEHOLD')
    ),
    pv AS (
        SELECT v, CAST(SUM(f) AS BIGINT) AS c_a,
               CAST(SUM(1 - f) AS BIGINT) AS c_b
        FROM j GROUP BY v
    ),
    cum AS (
        SELECT v, c_a, c_b,
               CAST(SUM(c_a + c_b) OVER (ORDER BY v) AS BIGINT)
                   - (c_a + c_b) AS before_t
        FROM pv
    ),
    n AS (SELECT CAST(SUM(c_a) AS BIGINT) AS n_a,
                 CAST(SUM(c_b) AS BIGINT) AS n_b
          FROM pv),
    s AS (
        SELECT CAST(SUM(c_a * (2 * before_t + (c_a + c_b) + 1)) AS BIGINT)
                   AS two_r1,
               CAST(SUM((c_a + c_b) * (c_a + c_b) * (c_a + c_b)
                        - (c_a + c_b)) AS BIGINT) AS tie_t
        FROM cum
    )
    SELECT n.n_a, n.n_b,
           CAST(s.two_r1 - n.n_a * (n.n_a + 1) AS BIGINT) AS two_u1,
           ROUND(((s.two_r1 - n.n_a * (n.n_a + 1)) / 2.0
                  - n.n_a * n.n_b / 2.0)
                 / sqrt((n.n_a * n.n_b / 12.0)
                        * ((n.n_a + n.n_b + 1)
                           - CAST(s.tie_t AS DOUBLE)
                             / ((n.n_a + n.n_b)
                                * (n.n_a + n.n_b - 1)))), 6) AS z_score
    FROM s CROSS JOIN n
    """,
)
def mannwhitney_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.edf import ordered_cumsum

    cust = t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("AUTOMOBILE", "HOUSEHOLD")
    )
    j = (
        t(spark, sf_dir, "orders")
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .select(
            F.floor(F.col("o_totalprice") * 100.0 + 0.5)
            .cast("long")
            .alias("v"),
            F.when(F.col("c_mktsegment") == "AUTOMOBILE", 1)
            .otherwise(0)
            .alias("f"),
        )
    )
    pv = j.groupBy("v").agg(
        F.sum("f").cast("long").alias("c_a"),
        F.sum(1 - F.col("f")).cast("long").alias("c_b"),
    ).withColumn("c_t", F.col("c_a") + F.col("c_b"))
    cum = ordered_cumsum(pv, "v", ["c_t"]).withColumn(
        "before_t", F.col("cum_c_t") - F.col("c_t")
    )
    n = pv.agg(
        F.sum("c_a").cast("long").alias("n_a"),
        F.sum("c_b").cast("long").alias("n_b"),
    )
    s = cum.agg(
        F.sum(
            F.col("c_a") * (2 * F.col("before_t") + F.col("c_t") + 1)
        )
        .cast("long")
        .alias("two_r1"),
        F.sum(F.col("c_t") * F.col("c_t") * F.col("c_t") - F.col("c_t"))
        .cast("long")
        .alias("tie_t"),
    )
    two_u1 = (F.col("two_r1") - F.col("n_a") * (F.col("n_a") + 1)).cast(
        "long"
    )
    n_tot = F.col("n_a") + F.col("n_b")
    z = (
        (two_u1 / 2.0 - F.col("n_a") * F.col("n_b") / 2.0)
        / F.sqrt(
            (F.col("n_a") * F.col("n_b") / 12.0)
            * (
                (n_tot + 1)
                - F.col("tie_t").cast("double") / (n_tot * (n_tot - 1))
            )
        )
    )
    return (
        s.join(F.broadcast(n))
        .select(
            "n_a",
            "n_b",
            two_u1.alias("two_u1"),
            F.round(z, 6).alias("z_score"),
        )
    )


# ---------------------------------------------------------------------------
# Theil-Sen robust trend of daily revenue — median-of-pairwise-slopes,
# immune to the outlier days that bend ols_value_trend. The pairwise
# self-join runs on the DAY DIMENSION (the fact table collapses to
# ≤366 day rows first), so the quadratic is bounded by days², never by
# rows² — stated, not hidden. The lower median at index ⌈n/2⌉ is picked
# by a row_number over the pair relation (days²-bounded, one task is
# fine at any corpus size) with a fully deterministic tie order
# (slope, day_i, day_j); slopes are single IEEE divisions of exact
# integer deltas.
# ---------------------------------------------------------------------------
@query(
    "theil_sen_daily_trend",
    """
    WITH daily AS (
        SELECT CAST(floor(epoch(o_orderdate) / 86400.0) AS BIGINT) AS d,
               CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                    AS BIGINT) AS y
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY d
    ),
    pairs AS (
        SELECT a.d AS d1, b.d AS d2,
               (b.y - a.y) / CAST(b.d - a.d AS DOUBLE) AS slope
        FROM daily a JOIN daily b ON b.d > a.d
    ),
    ranked AS (
        SELECT slope,
               ROW_NUMBER() OVER (ORDER BY slope, d1, d2) AS rn,
               COUNT(*) OVER () AS n_pairs
        FROM pairs
    )
    SELECT CAST(n_pairs AS BIGINT) AS n_pairs,
           ROUND(slope / 100.0, 6) AS slope_dollars_per_day
    FROM ranked
    WHERE rn = CAST(ceil(n_pairs / 2.0) AS BIGINT)
    """,
)
def theil_sen_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .select(
            F.floor(F.unix_timestamp("o_orderdate") / 86400.0)
            .cast("long")
            .alias("d"),
            F.floor(F.col("o_totalprice") * 100.0 + 0.5)
            .cast("long")
            .alias("cents"),
        )
        .groupBy("d")
        .agg(F.sum("cents").cast("long").alias("y"))
    )
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(b, F.col("b.d") > F.col("a.d")).select(
        F.col("a.d").alias("d1"),
        F.col("b.d").alias("d2"),
        (
            (F.col("b.y") - F.col("a.y"))
            / (F.col("b.d") - F.col("a.d")).cast("double")
        ).alias("slope"),
    )
    w = Window.orderBy("slope", "d1", "d2")
    ranked = pairs.select(
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n_pairs"),
    )
    return ranked.filter(
        F.col("rn") == F.ceil(F.col("n_pairs") / 2.0).cast("long")
    ).select(
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.round(F.col("slope") / 100.0, 6).alias("slope_dollars_per_day"),
    )


# ---------------------------------------------------------------------------
# Difference-in-differences — the experimentation-platform estimator
# for a rollout with a before/after boundary: treatment = a
# deterministic user-id split, post = the month's midpoint, effect =
# (treat_post − treat_pre) − (ctrl_post − ctrl_pre). All four cell
# means come from ONE conditional aggregation pass over the fact scan
# (exact cents sums / exact counts); the estimate is a fixed IEEE
# expression over eight exact integers. The same pass emits the four
# cell means so the estimate is auditable from its own output row.
# ---------------------------------------------------------------------------
@query(
    "diff_in_diff_value",
    """
    WITH cells AS (
        SELECT (user_id % 2 = 0) AS treat,
               (ts >= TIMESTAMP '2024-01-16 00:00:00') AS post,
               CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents,
               COUNT(*) AS n
        FROM events
        GROUP BY treat, post
    ),
    wide AS (
        SELECT
            MAX(CASE WHEN treat AND post THEN cents END) AS tp_c,
            MAX(CASE WHEN treat AND post THEN n END) AS tp_n,
            MAX(CASE WHEN treat AND NOT post THEN cents END) AS tq_c,
            MAX(CASE WHEN treat AND NOT post THEN n END) AS tq_n,
            MAX(CASE WHEN NOT treat AND post THEN cents END) AS cp_c,
            MAX(CASE WHEN NOT treat AND post THEN n END) AS cp_n,
            MAX(CASE WHEN NOT treat AND NOT post THEN cents END) AS cq_c,
            MAX(CASE WHEN NOT treat AND NOT post THEN n END) AS cq_n
        FROM cells
    )
    SELECT ROUND(tp_c / (tp_n * 100.0), 6) AS treat_post_mean,
           ROUND(tq_c / (tq_n * 100.0), 6) AS treat_pre_mean,
           ROUND(cp_c / (cp_n * 100.0), 6) AS ctrl_post_mean,
           ROUND(cq_c / (cq_n * 100.0), 6) AS ctrl_pre_mean,
           ROUND((tp_c / (tp_n * 100.0) - tq_c / (tq_n * 100.0))
                 - (cp_c / (cp_n * 100.0) - cq_c / (cq_n * 100.0)), 6)
               AS did_estimate
    FROM wide
    """,
)
def diff_in_diff_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        (F.col("user_id") % 2 == 0).alias("treat"),
        (
            F.col("ts") >= F.lit("2024-01-16 00:00:00").cast("timestamp")
        ).alias("post"),
        F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("cents"),
    )

    def cell(tr: bool, po: bool, col: str):
        cond = (F.col("treat") == tr) & (F.col("post") == po)
        if col == "c":
            return F.sum(F.when(cond, F.col("cents"))).cast("long")
        return F.count(F.when(cond, F.lit(1)))

    wide = ev.agg(
        cell(True, True, "c").alias("tp_c"),
        cell(True, True, "n").alias("tp_n"),
        cell(True, False, "c").alias("tq_c"),
        cell(True, False, "n").alias("tq_n"),
        cell(False, True, "c").alias("cp_c"),
        cell(False, True, "n").alias("cp_n"),
        cell(False, False, "c").alias("cq_c"),
        cell(False, False, "n").alias("cq_n"),
    )
    m = lambda c, n: F.col(c) / (F.col(n) * 100.0)  # noqa: E731
    return wide.select(
        F.round(m("tp_c", "tp_n"), 6).alias("treat_post_mean"),
        F.round(m("tq_c", "tq_n"), 6).alias("treat_pre_mean"),
        F.round(m("cp_c", "cp_n"), 6).alias("ctrl_post_mean"),
        F.round(m("cq_c", "cq_n"), 6).alias("ctrl_pre_mean"),
        F.round(
            (m("tp_c", "tp_n") - m("tq_c", "tq_n"))
            - (m("cp_c", "cp_n") - m("cq_c", "cq_n")),
            6,
        ).alias("did_estimate"),
    )


# ---------------------------------------------------------------------------
# CUPED variance reduction — the other workhorse of modern A/B
# analysis: adjust each user's experiment-period metric by their
# PRE-period metric, theta = cov(pre, post)/var(pre) over exposed
# users. Plan shape: one groupBy to user grain (pre/post sums as exact
# cents), one 1-row moment aggregate (products of cents quantized to
# exact integers — n-scaled so no float-order risk), broadcast back for
# the adjusted per-arm means. Reported: raw lift, CUPED lift, and the
# variance-reduction ratio (1 - rho^2) that justifies the machinery.
# ---------------------------------------------------------------------------
@query(
    "cuped_adjusted_lift",
    """
    WITH per_user AS (
        SELECT user_id, (user_id % 2 = 0) AS treat,
               CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                             THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS pre_c,
               CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
                             THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS post_c
        FROM events GROUP BY user_id
    ),
    mom AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(pre_c) AS BIGINT) AS sx,
               CAST(SUM(post_c) AS BIGINT) AS sy,
               CAST(SUM(pre_c * pre_c) AS BIGINT) AS sxx,
               CAST(SUM(pre_c * post_c) AS BIGINT) AS sxy
        FROM per_user
    ),
    th AS (
        SELECT n, sx,
               (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
               / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                   AS theta
        FROM mom
    ),
    adj AS (
        SELECT p.treat,
               AVG(p.post_c / 100.0) AS raw_mean,
               AVG(p.post_c / 100.0
                   - th.theta * (p.pre_c - CAST(th.sx AS DOUBLE) / th.n)
                     / 100.0) AS cuped_mean
        FROM per_user p CROSS JOIN th
        GROUP BY p.treat
    )
    SELECT ROUND(MAX(CASE WHEN treat THEN raw_mean END)
                 - MAX(CASE WHEN NOT treat THEN raw_mean END), 6)
               AS raw_lift,
           ROUND(MAX(CASE WHEN treat THEN cuped_mean END)
                 - MAX(CASE WHEN NOT treat THEN cuped_mean END), 6)
               AS cuped_lift,
           (SELECT ROUND(theta, 6) FROM th) AS theta
    FROM adj
    """,
)
def cuped_adjusted_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    cents = F.floor(F.col("value") * 100.0 + 0.5).cast("long")
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    per_user = (
        t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.when(F.col("ts") < cut, cents).otherwise(0).alias("pre"),
            F.when(F.col("ts") >= cut, cents).otherwise(0).alias("post"),
        )
        .groupBy("user_id")
        .agg(
            F.sum("pre").cast("long").alias("pre_c"),
            F.sum("post").cast("long").alias("post_c"),
        )
        .withColumn("treat", F.col("user_id") % 2 == 0)
    )
    mom = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("pre_c").cast("long").alias("sx"),
        F.sum("post_c").cast("long").alias("sy"),
        F.sum(F.col("pre_c") * F.col("pre_c")).cast("long").alias("sxx"),
        F.sum(F.col("pre_c") * F.col("post_c")).cast("long").alias("sxy"),
    )
    th = mom.select(
        "n",
        "sx",
        (
            (F.col("n").cast("double") * F.col("sxy") - F.col("sx").cast("double") * F.col("sy"))
            / (F.col("n").cast("double") * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
        ).alias("theta"),
    )
    adj = (
        per_user.join(F.broadcast(th))
        .groupBy("treat")
        .agg(
            F.avg(F.col("post_c") / 100.0).alias("raw_mean"),
            F.avg(
                F.col("post_c") / 100.0
                - F.col("theta")
                * (F.col("pre_c") - F.col("sx").cast("double") / F.col("n"))
                / 100.0
            ).alias("cuped_mean"),
        )
    )
    out = adj.agg(
        F.round(
            F.max(F.when(F.col("treat"), F.col("raw_mean")))
            - F.max(F.when(~F.col("treat"), F.col("raw_mean"))),
            6,
        ).alias("raw_lift"),
        F.round(
            F.max(F.when(F.col("treat"), F.col("cuped_mean")))
            - F.max(F.when(~F.col("treat"), F.col("cuped_mean"))),
            6,
        ).alias("cuped_lift"),
    )
    return out.join(F.broadcast(th.select(F.round("theta", 6).alias("theta"))))


# ---------------------------------------------------------------------------
# Quantile treatment effects — the distributional companion to the mean
# lift: at each decile, the EXACT order statistic of the treatment
# arm's per-user value minus the control arm's. Exact selection (rank =
# ceil(q*n), no interpolation) keeps every reported value an actual
# observed data point and makes cross-engine agreement exact; the rank
# window is keyed per arm over the user-grain aggregate.
# ---------------------------------------------------------------------------
@query(
    "quantile_treatment_effects",
    """
    WITH per_user AS (
        SELECT user_id, (user_id % 2 = 0) AS treat,
               CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM events GROUP BY user_id
    ),
    ranked AS (
        SELECT treat, cents,
               ROW_NUMBER() OVER (PARTITION BY treat
                                  ORDER BY cents, user_id) AS rn,
               COUNT(*) OVER (PARTITION BY treat) AS n
        FROM per_user
    ),
    qs AS (
        SELECT d.q, r.treat, MAX(r.cents) AS v
        FROM ranked r
        JOIN (SELECT unnest([1, 2, 3, 4, 5, 6, 7, 8, 9]) AS q) d
          ON r.rn = CAST(ceil(d.q * r.n / 10.0) AS BIGINT)
        GROUP BY d.q, r.treat
    )
    SELECT q AS decile,
           MAX(CASE WHEN treat THEN v END) / 100.0 AS treat_value,
           MAX(CASE WHEN NOT treat THEN v END) / 100.0 AS ctrl_value,
           (MAX(CASE WHEN treat THEN v END)
            - MAX(CASE WHEN NOT treat THEN v END)) / 100.0 AS qte
    FROM qs GROUP BY q
    """,
)
def quantile_treatment_effects(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    per_user = (
        t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("c"),
        )
        .groupBy("user_id")
        .agg(F.sum("c").cast("long").alias("cents"))
        .withColumn("treat", F.col("user_id") % 2 == 0)
    )
    w = Window.partitionBy("treat").orderBy("cents", "user_id")
    ranked = per_user.select(
        "treat",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("treat")).alias("n"),
    )
    deciles = t(spark, sf_dir, "events").sparkSession.range(1, 10).select(
        F.col("id").alias("q")
    )
    qs = (
        ranked.join(
            F.broadcast(deciles),
            F.col("rn")
            == F.ceil(F.col("q") * F.col("n") / 10.0).cast("long"),
        )
        .groupBy("q", "treat")
        .agg(F.max("cents").alias("v"))
    )
    return qs.groupBy(F.col("q").alias("decile")).agg(
        (F.max(F.when(F.col("treat"), F.col("v"))) / 100.0).alias(
            "treat_value"
        ),
        (F.max(F.when(~F.col("treat"), F.col("v"))) / 100.0).alias(
            "ctrl_value"
        ),
        (
            (
                F.max(F.when(F.col("treat"), F.col("v")))
                - F.max(F.when(~F.col("treat"), F.col("v")))
            )
            / 100.0
        ).alias("qte"),
    )


# ---------------------------------------------------------------------------
# Exact higher moments per segment — skewness and excess kurtosis from
# EXACT raw power sums: x is requoted to whole dollars (documented
# quantization), SUM(x), SUM(x^2), SUM(x^3), SUM(x^4) are exact wide
# integers on both engines (decimal(38,0) / HUGEINT — x^4*n stays
# ~2e26, far under both caps; int64 would overflow, which is the whole
# point of the wide-integer lane), and the central-moment closed form
# evaluates ONCE per group as a fixed double expression over those
# exact inputs — deterministic cancellation, identical on both engines.
# ---------------------------------------------------------------------------
@query(
    "moments_by_segment",
    """
    WITH j AS (
        SELECT c_mktsegment AS segment,
               CAST(floor(o_totalprice + 0.5) AS BIGINT) AS x
        FROM orders JOIN customer ON c_custkey = o_custkey
    ),
    m AS (
        SELECT segment, COUNT(*) AS n,
               CAST(SUM(x) AS DOUBLE) AS s1,
               CAST(SUM(x * x) AS DOUBLE) AS s2,
               CAST(SUM(CAST(x AS HUGEINT) * x * x) AS DOUBLE) AS s3,
               CAST(SUM(CAST(x AS HUGEINT) * x * x * x) AS DOUBLE) AS s4
        FROM j GROUP BY segment
    )
    SELECT segment, n,
           ROUND((s3 / n - 3.0 * (s1 / n) * (s2 / n)
                  + 2.0 * (s1 / n) * (s1 / n) * (s1 / n))
                 / pow(s2 / n - (s1 / n) * (s1 / n), 1.5), 6) AS skewness,
           ROUND((s4 / n - 4.0 * (s1 / n) * (s3 / n)
                  + 6.0 * (s1 / n) * (s1 / n) * (s2 / n)
                  - 3.0 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
                 / ((s2 / n - (s1 / n) * (s1 / n))
                    * (s2 / n - (s1 / n) * (s1 / n))) - 3.0, 6)
               AS excess_kurtosis
    FROM m
    """,
)
def moments_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = (
        t(spark, sf_dir, "orders")
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.floor(F.col("o_totalprice") + 0.5).cast("long").alias("x"),
        )
    )
    xd = F.col("x").cast("decimal(38,0)")
    m = j.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("s1"),
        F.sum(xd * xd).cast("double").alias("s2"),
        F.sum(xd * xd * xd).cast("double").alias("s3"),
        F.sum(xd * xd * xd * xd).cast("double").alias("s4"),
    )
    n = F.col("n")
    mu = F.col("s1") / n
    m2 = F.col("s2") / n - mu * mu
    m3 = F.col("s3") / n - 3.0 * mu * (F.col("s2") / n) + 2.0 * mu * mu * mu
    m4 = (
        F.col("s4") / n
        - 4.0 * mu * (F.col("s3") / n)
        + 6.0 * mu * mu * (F.col("s2") / n)
        - 3.0 * mu * mu * mu * mu
    )
    return m.select(
        "segment",
        "n",
        F.round(m3 / F.pow(m2, 1.5), 6).alias("skewness"),
        F.round(m4 / (m2 * m2) - 3.0, 6).alias("excess_kurtosis"),
    )


# ---------------------------------------------------------------------------
# Approximate query processing with calibrated error bars: per-priority
# revenue estimated from a 20% DETERMINISTIC hash sample (md5 bucket <
# '3333' = 13107/65536), scaled by 1/f, with a 95% CLT half-width from
# the exact wide-integer sample moments (decimal38/HUGEINT — the
# moments_by_segment trick, so V = n·s2 − s1² is exact on both
# engines). The exact total rides along with a within-CI flag, making
# the query a CALIBRATION CHECK of the estimator, not just an estimate
# — at 100 TB the sampled scan is the 5x-cheaper dashboard path, and
# this row-set is the evidence its error bars can be trusted. All
# arithmetic is fixed-form float64 over exact integer aggregates;
# deterministic sampling makes the whole thing a cross-engine value.
# ---------------------------------------------------------------------------
_AQP_F = 13107.0 / 65536.0


@query(
    "aqp_revenue_estimate",
    f"""
    WITH base AS (
        SELECT o_orderpriority,
               CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents,
               substr(md5('aqp' || CAST(o_orderkey AS VARCHAR)), 1, 4)
                   < '3333' AS in_sample
        FROM orders
    ),
    agg AS (
        SELECT o_orderpriority,
               CAST(SUM(CASE WHEN in_sample THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_s,
               CAST(SUM(CASE WHEN in_sample THEN cents ELSE 0 END)
                    AS BIGINT) AS s1,
               SUM(CASE WHEN in_sample
                        THEN CAST(cents AS HUGEINT) * cents
                        ELSE 0 END) AS s2,
               CAST(SUM(cents) AS BIGINT) AS exact_cents
        FROM base GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, n_s AS n_sampled,
           ROUND(s1 / {_AQP_F} / 100.0, 2) AS est_revenue,
           ROUND(1.96 * sqrt(CAST(s2 AS DOUBLE) * {1.0 - _AQP_F})
                 / {_AQP_F} / 100.0, 2) AS ci_half_width,
           CAST(exact_cents AS BIGINT) / 100.0 AS exact_revenue,
           abs(s1 / {_AQP_F} - exact_cents)
               <= 1.96 * sqrt(CAST(s2 AS DOUBLE) * {1.0 - _AQP_F})
                  / {_AQP_F} AS within_ci
    FROM agg
    """,
)
def aqp_revenue_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.splits import hash_bucket_expr

    orders = t(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")
    base = orders.select(
        "o_orderpriority",
        cents.alias("cents"),
        (hash_bucket_expr(F.col("o_orderkey"), salt="aqp") < "3333").alias(
            "in_sample"
        ),
    )
    cd = F.col("cents").cast("decimal(38,0)")
    agg = base.groupBy("o_orderpriority").agg(
        F.sum(F.when(F.col("in_sample"), 1).otherwise(0))
        .cast("long")
        .alias("n_s"),
        F.sum(F.when(F.col("in_sample"), F.col("cents")).otherwise(0))
        .cast("long")
        .alias("s1"),
        F.sum(F.when(F.col("in_sample"), cd * cd).otherwise(0)).alias(
            "s2"
        ),
        F.sum("cents").cast("long").alias("exact_cents"),
    )
    f = F.lit(_AQP_F)
    # Horvitz-Thompson total variance under Bernoulli(f) inclusion:
    # Var(s1/f) = (1-f)/f^2 * sum(x_i^2), estimated by the sample's own
    # s2 — the spread around the sample MEAN is the wrong quantity for
    # a scaled-total error bar (it never covered the truth)
    hw = (
        F.lit(1.96)
        * F.sqrt(F.col("s2").cast("double") * F.lit(1.0 - _AQP_F))
        / f
    )
    return agg.select(
        "o_orderpriority",
        F.col("n_s").alias("n_sampled"),
        F.round(F.col("s1") / f / 100.0, 2).alias("est_revenue"),
        F.round(hw / 100.0, 2).alias("ci_half_width"),
        (F.col("exact_cents") / 100.0).alias("exact_revenue"),
        (
            F.abs(F.col("s1") / f - F.col("exact_cents")) <= hw
        ).alias("within_ci"),
    )


# ---------------------------------------------------------------------------
# Population Stability Index (round 10, second session): the standard
# feature-drift monitor for ML pipelines (PSI < 0.1 stable, > 0.25
# action) — here between the even- and odd-epoch-day halves of the
# event stream, per event type. PSI = sum (p-q)*ln(p/q) over the
# categorical buckets; everything is exact integer counts until the
# final share division, rounded identically on both sides. The
# per-type shares, per-type PSI terms AND the windowed total all ride
# the value hash. One groupBy (5-row dictionary output), one
# unpartitioned window over that dictionary — the 100 TB-safe shape
# (state is O(types), never O(events)).
#
# Epsilon smoothing (ADVICE r10): a category present in only one half
# would otherwise yield ln(0)/div-by-zero — NULL silently excluded
# from total_psi in Spark while DuckDB errors, under-reporting exactly
# the appearing/disappearing-category drift PSI exists to catch. The
# standard fix: clamp both shares to eps=1e-6 inside the term (the
# reported p_share/q_share stay raw), identically on both engines.
# ---------------------------------------------------------------------------
@query(
    "drift_psi_events",
    """
    WITH tagged AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) % 2 AS half
        FROM events
    ), c AS (
        SELECT event_type,
               CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS pc,
               CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS qc
        FROM tagged GROUP BY event_type
    ), tot AS (
        SELECT CAST(SUM(pc) AS BIGINT) AS tp,
               CAST(SUM(qc) AS BIGINT) AS tq
        FROM c
    ), terms AS (
        SELECT event_type,
               pc * 1.0 / tp AS p,
               qc * 1.0 / tq AS q,
               (greatest(pc * 1.0 / tp, 1e-6)
                    - greatest(qc * 1.0 / tq, 1e-6))
                   * ln(greatest(pc * 1.0 / tp, 1e-6)
                        / greatest(qc * 1.0 / tq, 1e-6)) AS term
        FROM c, tot
    )
    SELECT event_type,
           round(p, 6) AS p_share,
           round(q, 6) AS q_share,
           round(term, 6) AS psi_term,
           round(SUM(term) OVER (), 6) AS total_psi
    FROM terms
    ORDER BY event_type
    """,
)
def drift_psi_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    half = (
        F.floor(F.unix_timestamp(F.col("ts")) / 86400).cast("long") % 2
    )
    c = (
        t(spark, sf_dir, "events")
        .select("event_type", half.alias("half"))
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
            .cast("long")
            .alias("pc"),
            F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
            .cast("long")
            .alias("qc"),
        )
    )
    tot = c.agg(
        F.sum("pc").cast("long").alias("tp"),
        F.sum("qc").cast("long").alias("tq"),
    )
    p = F.col("pc") * 1.0 / F.col("tp")
    q = F.col("qc") * 1.0 / F.col("tq")
    pe = F.greatest(p, F.lit(1e-6))
    qe = F.greatest(q, F.lit(1e-6))
    terms = c.join(F.broadcast(tot)).select(
        "event_type",
        p.alias("p"),
        q.alias("q"),
        ((pe - qe) * F.log(pe / qe)).alias("term"),
    )
    # unpartitioned window over the TYPE dictionary (5 rows) — bounded
    w = Window.partitionBy()
    return terms.select(
        "event_type",
        F.round("p", 6).alias("p_share"),
        F.round("q", 6).alias("q_share"),
        F.round("term", 6).alias("psi_term"),
        F.round(F.sum("term").over(w), 6).alias("total_psi"),
    ).orderBy("event_type")
