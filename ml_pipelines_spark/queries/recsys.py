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
