"""Recommender-analytics queries — item-item co-occurrence similarity
over order baskets (the collaborative-filtering neighborhood build).

Counts are exact integers; cosine = c_ij / sqrt(c_i·c_j) and lift =
c_ij·N / (c_i·c_j) are single float expressions of those integers, so
both engines agree bit-for-bit before the final rounding.

Scale shape: the pair generator is a within-basket self-join keyed on
the basket id — fan-out is bounded by the basket size (single-digit
here; a `max_basket` gate is the production guard for pathological
carts), never a cross join. Item counts and the basket total are
dimension-sized broadcasts onto the pair aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .registry import query
from .relational import t

_MIN_CO = 2
_TOP = 30


@query(
    "item_item_cosine",
    f"""
    WITH baskets AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    item_counts AS (
        SELECT l_partkey, COUNT(*) AS c FROM baskets GROUP BY l_partkey
    ),
    n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_baskets FROM baskets),
    co AS (
        SELECT a.l_partkey AS item_a, b.l_partkey AS item_b,
               COUNT(*) AS c_ab
        FROM baskets a JOIN baskets b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING COUNT(*) >= {_MIN_CO}
    ),
    scored AS (
        SELECT item_a, item_b, c_ab,
               c_ab / sqrt(ca.c * CAST(cb.c AS DOUBLE)) AS cosine,
               c_ab * CAST(n.n_baskets AS DOUBLE) / (ca.c * cb.c) AS lift
        FROM co
        JOIN item_counts ca ON ca.l_partkey = item_a
        JOIN item_counts cb ON cb.l_partkey = item_b
        CROSS JOIN n
    )
    SELECT item_a, item_b, CAST(c_ab AS BIGINT) AS c_ab,
           ROUND(cosine, 6) AS cosine, ROUND(lift, 6) AS lift,
           CAST(ROW_NUMBER() OVER (ORDER BY ROUND(cosine, 6) DESC,
                                   item_a, item_b) AS INT) AS rank
    FROM scored
    QUALIFY rank <= {_TOP}
    """,
)
def item_item_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    baskets = (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    item_counts = baskets.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("c")
    )
    n = baskets.agg(
        F.countDistinct("l_orderkey").alias("n_baskets")
    )
    b = baskets.select(
        "l_orderkey", F.col("l_partkey").alias("item_b")
    )
    co = (
        baskets.select("l_orderkey", F.col("l_partkey").alias("item_a"))
        .join(b, "l_orderkey")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= _MIN_CO)
    )
    ca = item_counts.select(
        F.col("l_partkey").alias("item_a"), F.col("c").alias("c_a")
    )
    cb = item_counts.select(
        F.col("l_partkey").alias("item_b"), F.col("c").alias("c_b")
    )
    scored = (
        co.join(F.broadcast(ca), "item_a")
        .join(F.broadcast(cb), "item_b")
        .join(F.broadcast(n))
        .select(
            "item_a",
            "item_b",
            "c_ab",
            (
                F.col("c_ab")
                / F.sqrt(F.col("c_a") * F.col("c_b").cast("double"))
            ).alias("cosine"),
            (
                F.col("c_ab")
                * F.col("n_baskets").cast("double")
                / (F.col("c_a") * F.col("c_b"))
            ).alias("lift"),
        )
    )
    w = Window.orderBy(
        F.round("cosine", 6).desc(), "item_a", "item_b"
    )
    local = Window.partitionBy(F.spark_partition_id()).orderBy(
        F.round("cosine", 6).desc(), "item_a", "item_b"
    )
    return (
        scored.withColumn("__lr", F.row_number().over(local))
        .filter(F.col("__lr") <= _TOP)
        .drop("__lr")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP)
        .select(
            "item_a",
            "item_b",
            F.col("c_ab").cast("long").alias("c_ab"),
            F.round("cosine", 6).alias("cosine"),
            F.round("lift", 6).alias("lift"),
            "rank",
        )
    )


# ---------------------------------------------------------------------------
# Link prediction over the co-purchase graph — rank item pairs that
# were NEVER co-bought (no qualifying edge) by the Jaccard of their
# co-purchase neighborhoods: the "customers who bought these also
# bought..." candidate generator. Co-occurrence graphs are wedge-rich
# (hub items), which is exactly why the candidate set comes from a
# WEDGE join (two edges sharing a midpoint, Σ deg² bounded) and never
# an all-pairs scan; degree counts broadcast back, known edges drop
# via an anti join, scores are exact integer ratios.
# (The near-dup document graph was tried first and is clique-shaped at
# every threshold on this corpus — zero open wedges — so the predictor
# lives here, where the structure actually exists.)
# ---------------------------------------------------------------------------
@query(
    "link_prediction_copurchase",
    f"""
    WITH baskets AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    co AS (
        SELECT a.l_partkey AS x, b.l_partkey AS y, COUNT(*) AS c_ab
        FROM baskets a JOIN baskets b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING COUNT(*) >= {_MIN_CO}
    ),
    edges AS (
        SELECT x AS s, y AS d FROM co
        UNION ALL
        SELECT y AS s, x AS d FROM co
    ),
    deg AS (SELECT s, COUNT(*) AS deg FROM edges GROUP BY s),
    wedges AS (
        SELECT e1.d AS a, e2.d AS b, COUNT(*) AS cn
        FROM edges e1 JOIN edges e2
          ON e1.s = e2.s AND e1.d < e2.d
        GROUP BY e1.d, e2.d
    ),
    cand AS (
        SELECT w.a, w.b, w.cn, da.deg AS deg_a, db.deg AS deg_b
        FROM wedges w
        JOIN deg da ON da.s = w.a
        JOIN deg db ON db.s = w.b
        WHERE NOT EXISTS (
            SELECT 1 FROM co WHERE co.x = w.a AND co.y = w.b
        )
    )
    SELECT a AS item_a, b AS item_b, CAST(cn AS BIGINT) AS common_nbrs,
           ROUND(cn * 1.0 / (deg_a + deg_b - cn), 6) AS jaccard_nbr,
           CAST(ROW_NUMBER() OVER (
               ORDER BY ROUND(cn * 1.0 / (deg_a + deg_b - cn), 6) DESC,
                        a, b) AS INT) AS rank
    FROM cand
    QUALIFY rank <= 20
    """,
)
def link_prediction_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    baskets = (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    b2 = baskets.select("l_orderkey", F.col("l_partkey").alias("y"))
    co = (
        baskets.select("l_orderkey", F.col("l_partkey").alias("x"))
        .join(b2, "l_orderkey")
        .filter(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= _MIN_CO)
    )
    edges = co.select(F.col("x").alias("s"), F.col("y").alias("d")).unionAll(
        co.select(F.col("y").alias("s"), F.col("x").alias("d"))
    )
    deg = edges.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
    e1 = edges.select("s", F.col("d").alias("a"))
    e2 = edges.select("s", F.col("d").alias("b"))
    wedges = (
        e1.join(e2, "s")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    non_edges = wedges.join(
        co,
        (F.col("a") == F.col("x")) & (F.col("b") == F.col("y")),
        "left_anti",
    )
    cand = (
        non_edges.join(
            F.broadcast(
                deg.select(F.col("s").alias("a"), F.col("deg").alias("deg_a"))
            ),
            "a",
        )
        .join(
            F.broadcast(
                deg.select(F.col("s").alias("b"), F.col("deg").alias("deg_b"))
            ),
            "b",
        )
        .select(
            "a",
            "b",
            "cn",
            F.round(
                F.col("cn") * 1.0
                / (F.col("deg_a") + F.col("deg_b") - F.col("cn")),
                6,
            ).alias("jaccard_nbr"),
        )
    )
    w = Window.orderBy(F.col("jaccard_nbr").desc(), "a", "b")
    local = Window.partitionBy(F.spark_partition_id()).orderBy(
        F.col("jaccard_nbr").desc(), "a", "b"
    )
    return (
        cand.withColumn("__lr", F.row_number().over(local))
        .filter(F.col("__lr") <= 20)
        .drop("__lr")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 20)
        .select(
            F.col("a").alias("item_a"),
            F.col("b").alias("item_b"),
            F.col("cn").cast("long").alias("common_nbrs"),
            "jaccard_nbr",
            "rank",
        )
    )


# ---------------------------------------------------------------------------
# Time-decayed popularity — exponential half-life ranking ("trending
# parts"): each lineitem contributes exp(−ln2·age_days/30), so a sale
# 30 days before the corpus horizon counts half. Each per-row weight is
# QUANTIZED to integer nano-units before the sum (the established
# idiom), so per-part scores are exact BIGINT sums — no float
# summation-order risk — and the horizon is a one-row broadcast
# aggregate, never a driver scalar. Two-phase top-20.
# ---------------------------------------------------------------------------
_HALF_LIFE_DAYS = 30.0


@query(
    "decayed_popularity",
    f"""
    WITH mx AS (
        SELECT MAX(date_diff('day', DATE '1970-01-01',
                             CAST(date_trunc('day', l_shipdate) AS DATE)))
                   AS horizon
        FROM lineitem
    ),
    w AS (
        SELECT l_partkey,
               CAST(floor(exp(-0.6931471805599453
                              * (mx.horizon
                                 - date_diff('day', DATE '1970-01-01',
                                     CAST(date_trunc('day', l_shipdate)
                                          AS DATE)))
                              / {_HALF_LIFE_DAYS}) * 1000000000.0 + 0.5)
                    AS BIGINT) AS qw
        FROM lineitem CROSS JOIN mx
    ),
    scored AS (
        SELECT l_partkey, SUM(qw) AS qscore, COUNT(*) AS n_sales
        FROM w GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(qscore AS BIGINT) AS decayed_nano,
           CAST(n_sales AS BIGINT) AS n_sales,
           CAST(ROW_NUMBER() OVER (ORDER BY qscore DESC, l_partkey)
                AS INT) AS rank
    FROM scored
    QUALIFY rank <= 20
    """,
)
def decayed_popularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.unix_date(F.to_date(F.date_trunc("day", "l_shipdate"))).alias(
            "d"
        ),
    )
    mx = li.agg(F.max("d").alias("horizon"))
    qw = (
        F.floor(
            F.exp(
                -0.6931471805599453
                * (F.col("horizon") - F.col("d"))
                / _HALF_LIFE_DAYS
            )
            * 1000000000.0
            + 0.5
        )
    ).cast("long")
    scored = (
        li.join(F.broadcast(mx))
        .select("l_partkey", qw.alias("qw"))
        .groupBy("l_partkey")
        .agg(
            F.sum("qw").alias("qscore"),
            F.count(F.lit(1)).alias("n_sales"),
        )
    )
    local = Window.partitionBy(F.spark_partition_id()).orderBy(
        F.col("qscore").desc(), "l_partkey"
    )
    w = Window.orderBy(F.col("qscore").desc(), "l_partkey")
    return (
        scored.withColumn("__lr", F.row_number().over(local))
        .filter(F.col("__lr") <= 20)
        .drop("__lr")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 20)
        .select(
            "l_partkey",
            F.col("qscore").cast("long").alias("decayed_nano"),
            F.col("n_sales").cast("long").alias("n_sales"),
            "rank",
        )
    )
