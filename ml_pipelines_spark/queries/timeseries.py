"""Time-series queries over the events table — interval sweep-line
concurrency and seasonal-naive forecast backtesting.

Both are exact-integer pipelines end to end (counts, deltas, epoch
days), so the cross-engine oracles compare real values with no float
tolerance anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .registry import query
from .relational import t

_SESSION_MIN = 30  # interval length per event, minutes


# ---------------------------------------------------------------------------
# Peak concurrency — the classic interval sweep line, distributed.
# Each event opens a 30-minute interval; the sweep emits (+1 at start,
# -1 at end), orders by (time, delta, event_id) — ends strictly before
# starts at the same instant, so back-to-back intervals never double
# count — and the per-day peak is the max running sum.
#
# The running sum is NOT one global single-partition window (the
# scale-killer): it is the textbook two-phase scan — a within-day
# running sum partitioned by day, plus each day's carried-in offset
# (exclusive prefix over the per-day delta totals, a dimension of a few
# hundred rows that broadcasts back). At 100 TB the big shuffle keys on
# day; the cross-day carry costs one tiny window over the day dimension.
# ---------------------------------------------------------------------------
@query(
    "peak_concurrency",
    f"""
    WITH deltas AS (
        SELECT ts AS t, 1 AS delta, event_id FROM events
        UNION ALL
        SELECT ts + INTERVAL {_SESSION_MIN} MINUTE AS t, -1 AS delta,
               event_id
        FROM events
    ),
    running AS (
        SELECT CAST(date_trunc('day', t) AS DATE) AS day,
               SUM(delta) OVER (ORDER BY t, delta, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS conc,
               delta
        FROM deltas
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(MAX(conc) AS BIGINT) AS peak_concurrency,
           CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_starts
    FROM running GROUP BY day
    """,
)
def peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select("event_id", "ts")
    deltas = ev.select(
        F.col("ts").alias("t"), F.lit(1).alias("delta"), "event_id"
    ).unionAll(
        ev.select(
            (F.col("ts") + F.expr(f"INTERVAL {_SESSION_MIN} MINUTES"))
            .alias("t"),
            F.lit(-1).alias("delta"),
            "event_id",
        )
    )
    deltas = deltas.withColumn(
        "day", F.to_date(F.date_trunc("day", "t"))
    )
    # Phase 1: running sum WITHIN each day (shuffle keys on day only).
    win_day = (
        Window.partitionBy("day")
        .orderBy("t", "delta", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = deltas.withColumn("run_in_day", F.sum("delta").over(win_day))
    # Phase 2: exclusive prefix of per-day totals — a dimension-sized
    # window (one row per calendar day) broadcast back onto phase 1.
    day_tot = deltas.groupBy("day").agg(F.sum("delta").alias("day_delta"))
    offsets = day_tot.select(
        "day",
        (F.sum("day_delta").over(Window.orderBy("day")) - F.col("day_delta"))
        .alias("carry_in"),
    )
    return (
        within.join(F.broadcast(offsets), "day")
        .groupBy("day")
        .agg(
            F.max(F.col("run_in_day") + F.col("carry_in"))
            .cast("long")
            .alias("peak_concurrency"),
            F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_starts"),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "peak_concurrency",
            "n_starts",
        )
    )


# ---------------------------------------------------------------------------
# Seasonal-naive forecast backtest — forecast(day) = count(day − 7),
# benchmarked against naive-1 (count(day − 1)) over the final 28
# observed days. Joins on (type, day−k) rather than LAG so missing
# calendar days don't silently shift the season; an absent prior day
# forecasts 0 (count data). Everything after the one heavy groupBy
# (events → daily counts) runs on a type×day dimension of a few
# thousand rows; MAEs are ratios of exact BIGINT sums.
# ---------------------------------------------------------------------------
@query(
    "seasonal_naive_forecast",
    """
    WITH daily AS (
        SELECT event_type,
               date_diff('day', DATE '1970-01-01',
                         CAST(date_trunc('day', ts) AS DATE)) AS d,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ),
    mx AS (SELECT MAX(d) AS max_d FROM daily),
    eval_days AS (
        SELECT a.event_type, a.d, a.n,
               COALESCE(s.n, 0) AS f_seasonal,
               COALESCE(p.n, 0) AS f_naive
        FROM daily a
        LEFT JOIN daily s ON s.event_type = a.event_type AND s.d = a.d - 7
        LEFT JOIN daily p ON p.event_type = a.event_type AND p.d = a.d - 1
        CROSS JOIN mx
        WHERE a.d > mx.max_d - 28
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(ABS(n - f_seasonal)) AS BIGINT) AS abs_err_seasonal,
           CAST(SUM(ABS(n - f_naive)) AS BIGINT) AS abs_err_naive,
           ROUND(SUM(ABS(n - f_seasonal)) / COUNT(*), 5) AS mae_seasonal,
           ROUND(SUM(ABS(n - f_naive)) / COUNT(*), 5) AS mae_naive
    FROM eval_days GROUP BY event_type
    """,
)
def seasonal_naive_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.unix_date(F.to_date(F.date_trunc("day", "ts"))).alias("d"),
    ).agg(F.count(F.lit(1)).alias("n"))
    max_d = daily.agg(F.max("d").alias("max_d"))
    season = daily.select(
        F.col("event_type").alias("s_type"),
        (F.col("d") + 7).alias("s_d"),
        F.col("n").alias("f_seasonal"),
    )
    prev = daily.select(
        F.col("event_type").alias("p_type"),
        (F.col("d") + 1).alias("p_d"),
        F.col("n").alias("f_naive"),
    )
    joined = (
        daily.join(F.broadcast(max_d))
        .filter(F.col("d") > F.col("max_d") - 28)
        .join(
            season,
            (F.col("event_type") == F.col("s_type"))
            & (F.col("d") == F.col("s_d")),
            "left",
        )
        .join(
            prev,
            (F.col("event_type") == F.col("p_type"))
            & (F.col("d") == F.col("p_d")),
            "left",
        )
        .select(
            "event_type",
            "n",
            F.coalesce("f_seasonal", F.lit(0)).alias("fs"),
            F.coalesce("f_naive", F.lit(0)).alias("fn"),
        )
    )
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(F.abs(F.col("n") - F.col("fs")))
        .cast("long")
        .alias("abs_err_seasonal"),
        F.sum(F.abs(F.col("n") - F.col("fn")))
        .cast("long")
        .alias("abs_err_naive"),
        F.round(
            F.sum(F.abs(F.col("n") - F.col("fs"))) / F.count(F.lit(1)), 5
        ).alias("mae_seasonal"),
        F.round(
            F.sum(F.abs(F.col("n") - F.col("fn"))) / F.count(F.lit(1)), 5
        ).alias("mae_naive"),
    )


# ---------------------------------------------------------------------------
# CUSUM change-point flags — cumulative sum of (daily count − global
# daily mean) per event type; a day is flagged when |cusum| crosses
# k·sigma. Everything is derived from exact integer daily counts: the
# mean and sigma are ratios/roots of exact sums computed ONCE (one-row
# broadcast), and the running sum lives on the tiny type×day dimension
# (the heavy pass is the events→daily groupBy). The cusum recursion is
# a prefix sum — a per-type window over epoch days, not state.
# ---------------------------------------------------------------------------
_CUSUM_K = 3.0


@query(
    "cusum_change_points",
    f"""
    WITH daily AS (
        SELECT event_type,
               date_diff('day', DATE '1970-01-01',
                         CAST(date_trunc('day', ts) AS DATE)) AS d,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ),
    stats AS (
        SELECT event_type, AVG(n) AS mu,
               sqrt(AVG(n * n) - AVG(n) * AVG(n)) AS sigma
        FROM daily GROUP BY event_type
    ),
    cusum AS (
        SELECT daily.event_type, d, n,
               SUM(n - mu) OVER (PARTITION BY daily.event_type ORDER BY d
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS c,
               sigma
        FROM daily JOIN stats USING (event_type)
    )
    SELECT event_type,
           strftime(DATE '1970-01-01' + CAST(d AS INTEGER), '%Y-%m-%d')
               AS day,
           CAST(n AS BIGINT) AS n,
           ROUND(c, 6) + 0.0 AS cusum,
           abs(c) > {_CUSUM_K} * sigma AS flagged
    FROM cusum
    """,
)
def cusum_change_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.unix_date(F.to_date(F.date_trunc("day", "ts"))).alias("d"),
    ).agg(F.count(F.lit(1)).alias("n"))
    stats = daily.groupBy("event_type").agg(
        F.avg("n").alias("mu"),
        F.sqrt(
            F.avg(F.col("n") * F.col("n"))
            - F.avg("n") * F.avg("n")
        ).alias("sigma"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cusum = daily.join(F.broadcast(stats), "event_type").withColumn(
        "c", F.sum(F.col("n") - F.col("mu")).over(w)
    )
    return cusum.select(
        "event_type",
        F.date_format(
            F.date_add(F.lit("1970-01-01").cast("date"), F.col("d").cast("int")),
            "yyyy-MM-dd",
        ).alias("day"),
        F.col("n").cast("long").alias("n"),
        (F.round("c", 6) + 0.0).alias("cusum"),
        (F.abs("c") > _CUSUM_K * F.col("sigma")).alias("flagged"),
    )


# ---------------------------------------------------------------------------
# Split-conformal prediction band on the seasonal-naive forecaster —
# the distribution-free uncertainty layer a production forecast needs:
# calibrate |y − ŷ| on a held-out window, take the ⌈(n+1)(1−α)⌉-th
# smallest absolute residual as the band half-width q̂, then audit
# empirical coverage on the final week. With α = 0.2 the band should
# cover ≳80% of test days regardless of the residual distribution —
# that guarantee is the whole point of conformal calibration.
#
# Everything is exact: daily counts are integers, residuals are
# integers, q̂ is an ORDER STATISTIC (row_number over the ≤14-row
# per-type calibration dimension, deterministic (resid, day)
# tie-break), and the target rank uses the integer form
# (4·(n+1)+4) div 5 = ⌈0.8·(n+1)⌉ so no float boundary can shift the
# chosen rank. The only fact-sized work is the events→daily groupBy.
# ---------------------------------------------------------------------------
@query(
    "conformal_forecast_band",
    """
    WITH daily AS (
        SELECT event_type,
               date_diff('day', DATE '1970-01-01',
                         CAST(date_trunc('day', ts) AS DATE)) AS d,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ),
    mx AS (SELECT MAX(d) AS max_d FROM daily),
    paired AS (
        SELECT a.event_type, a.d, a.n,
               s.n AS yhat,
               CAST(abs(a.n - s.n) AS BIGINT) AS resid,
               mx.max_d
        FROM daily a
        JOIN daily s ON s.event_type = a.event_type AND s.d = a.d - 7
        CROSS JOIN mx
    ),
    calib AS (
        SELECT event_type, resid,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY resid, d) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n_calib
        FROM paired
        WHERE d > max_d - 21 AND d <= max_d - 7
    ),
    qhat AS (
        SELECT event_type,
               CAST(MAX(n_calib) AS BIGINT) AS n_calib,
               CAST(MAX(CASE WHEN rn = CAST(floor((4 * (n_calib + 1) + 4)
                                                  / 5) AS INT)
                             THEN resid END) AS BIGINT) AS q_abs_err
        FROM calib GROUP BY event_type
    ),
    test AS (
        SELECT p.event_type, p.resid, q.q_abs_err, q.n_calib
        FROM paired p JOIN qhat q ON q.event_type = p.event_type
        WHERE p.d > p.max_d - 7
    )
    SELECT event_type, n_calib, q_abs_err,
           COUNT(*) AS n_test,
           CAST(SUM(CASE WHEN resid <= q_abs_err THEN 1 ELSE 0 END)
                AS BIGINT) AS n_covered,
           ROUND(SUM(CASE WHEN resid <= q_abs_err THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 5) AS coverage
    FROM test
    GROUP BY event_type, n_calib, q_abs_err
    ORDER BY event_type
    """,
)
def conformal_forecast_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.unix_date(F.to_date(F.date_trunc("day", "ts"))).alias("d"),
    ).agg(F.count(F.lit(1)).alias("n"))
    max_d = daily.agg(F.max("d").alias("max_d"))
    season = daily.select(
        F.col("event_type").alias("s_type"),
        (F.col("d") + 7).alias("s_d"),
        F.col("n").alias("yhat"),
    )
    paired = (
        daily.join(
            season,
            (F.col("event_type") == F.col("s_type"))
            & (F.col("d") == F.col("s_d")),
        )
        .join(F.broadcast(max_d))
        .select(
            "event_type",
            "d",
            "max_d",
            F.abs(F.col("n") - F.col("yhat")).cast("long").alias("resid"),
        )
    )
    wt = Window.partitionBy("event_type")
    calib = (
        paired.filter(
            (F.col("d") > F.col("max_d") - 21)
            & (F.col("d") <= F.col("max_d") - 7)
        )
        .withColumn(
            "rn", F.row_number().over(wt.orderBy("resid", "d"))
        )
        .withColumn("n_calib", F.count(F.lit(1)).over(wt))
    )
    target = F.floor(
        (4 * (F.col("n_calib") + 1) + 4) / F.lit(5)
    ).cast("int")
    qhat = calib.groupBy("event_type").agg(
        F.max("n_calib").cast("long").alias("n_calib"),
        F.max(F.when(F.col("rn") == target, F.col("resid")))
        .cast("long")
        .alias("q_abs_err"),
    )
    test = paired.filter(F.col("d") > F.col("max_d") - 7).join(
        F.broadcast(qhat), "event_type"
    )
    covered = F.when(F.col("resid") <= F.col("q_abs_err"), 1).otherwise(0)
    return (
        test.groupBy("event_type", "n_calib", "q_abs_err")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum(covered).cast("long").alias("n_covered"),
            F.round(
                F.sum(covered) / F.count(F.lit(1)).cast("double"), 5
            ).alias("coverage"),
        )
        .orderBy("event_type")
    )
