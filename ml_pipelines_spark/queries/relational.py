"""Relational core queries — scans, projections, filters, joins, aggregates.

Covers SURVEY.md §2.2 (P1-P9), §2.3 (J1-J6), §2.4 (A1-A9), §2.7 (F1-F12)
and set-ops, each re-expressed as a declarative Spark plan with a DuckDB
oracle twin. Citations in each docstring point at the reference behavior
(file:line under /root/reference/MLPipelines/) being re-expressed.

Scale notes inline: every query here is a single Catalyst plan — filters
and projections push into the parquet scan, dimension joins broadcast,
aggregations do map-side partial aggregation. No driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import read_table, read_timestamp_table
from ..schemas import TESTDATA_SCHEMAS
from .registry import bench_only_query, query


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table with its declared schema.

    Pins the session confs the oracle comparison depends on (UTC
    timestamp rendering, nanos-as-long parquet reads) so queries behave
    identically under any caller-provided SparkSession, not just ours.

    Timestamp unit is detected from the parquet footer, never assumed:
    the driver regenerated events.parquet from nanos to micros between
    rounds and a hard-coded nanos conversion made every timestamp 1000×
    small (VERDICT round 2). ``read_timestamp_table`` probes the footer
    and only applies the nanos path when the unit really is ns.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/{name}.parquet"
    schema = TESTDATA_SCHEMAS[name]
    ts_cols = [f.name for f in schema.fields if f.dataType.typeName() == "timestamp"]
    if ts_cols:
        return read_timestamp_table(spark, path, schema, ts_cols)
    return read_table(spark, path, schema)


# ---------------------------------------------------------------------------
# Flagship: pricing summary (TPC-H Q1 shape).
# Exercises scan → pushed range predicate → group-by with partial aggs —
# the same scan/filter/aggregate loop as the reference's E1 lifecycle
# (TrainDatasets.py:235-287) but with numeric aggregates Spark gives free.
# ---------------------------------------------------------------------------
@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                    AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                               AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 4)                                    AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)                               AS avg_price,
           ROUND(AVG(l_discount), 4)                                    AS avg_disc,
           COUNT(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# P1: projection with cast — the reference's view dicts
# (TrainDatasets.py:25-68) apply named outputs + int64/timestamp casts in
# the scan; Catalyst collapses select+cast into the parquet reader.
# ---------------------------------------------------------------------------
@query(
    "proj_cast",
    """
    SELECT o_orderkey                         AS order_id,
           CAST(o_custkey AS INTEGER)         AS cust_id,
           strftime(o_orderdate, '%Y-%m-%d')  AS order_date,
           CAST(FLOOR(o_totalprice) AS BIGINT) AS total_price_floor
    FROM orders
    """,
)
def proj_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Date-typed outputs are formatted as strings: Spark/DuckDB/pandas
    # disagree about date materialization (date32 vs datetime64), which
    # breaks value-hash comparison even when values are equal.
    return t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_custkey").cast("int").alias("cust_id"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        # Explicit floor: CAST(double AS BIGINT) truncates in Spark but
        # rounds in DuckDB — never rely on implicit double→int semantics.
        F.floor("o_totalprice").cast("bigint").alias("total_price_floor"),
    )


# ---------------------------------------------------------------------------
# P3: IN-list predicate on a partition-style key
# (reference: ds.field("project_id").isin(project_ids),
# TrainDatasets.py:200,249,335). On a hive-partitioned lake this prunes
# directories before any I/O.
# ---------------------------------------------------------------------------
@query(
    "filter_isin",
    """
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
)
def filter_isin(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# P4: equality predicate on a partition-style key
# (reference: ds.field("item_id") == iid, TrainDatasets.py:403,443,526).
# ---------------------------------------------------------------------------
@query(
    "filter_eq",
    """
    SELECT n_nationkey, n_name
    FROM nation
    WHERE n_regionkey = 2
    """,
)
def filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "nation")
        .filter(F.col("n_regionkey") == 2)
        .select("n_nationkey", "n_name")
    )


# ---------------------------------------------------------------------------
# P6: array-overlap anti-filter — the reference's skip_tags filter drops
# rows whose tag array intersects a skip list (TrainDatasets.py:201,
# 204-211, implemented there as a pandas .apply). Pure built-ins here.
# ---------------------------------------------------------------------------
@query(
    "filter_array_overlap",
    """
    SELECT doc_id, lang
    FROM documents
    WHERE NOT list_has_any(string_split(text, ' '), ['stream', 'window'])
    """,
)
def filter_array_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    tags = F.split(F.col("text"), " ")
    skip = F.array(F.lit("stream"), F.lit("window"))
    return docs.filter(~F.arrays_overlap(tags, skip)).select("doc_id", "lang")


# ---------------------------------------------------------------------------
# P5/J2: left-semi join — the reference restricts annotations to the
# image_names of selected projects by collecting a key list and pushing
# .isin (TrainDatasets.py:289-294). At scale the key list never fits on
# the driver; a semi-join keeps it distributed.
# ---------------------------------------------------------------------------
@query(
    "semi_join",
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
    """,
)
def semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    keys = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return li.join(keys, li.l_orderkey == keys.o_orderkey, "left_semi").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )


# ---------------------------------------------------------------------------
# J3: left-anti join — the reference's badimage/skip-tag exclusion drops
# images (and transitively their annotations) from a deny set
# (TrainDatasets.py:201, 342-344).
# ---------------------------------------------------------------------------
@query(
    "anti_join",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL)
    """,
)
def anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# J1 + J6: fact-to-fact equi-join plus broadcast dimension-dictionary
# joins. The reference does J1 as a dict probe per row
# (create_coco_from_feather.py:74-106) and J6 as label_id->name dict
# lookups (CvatApi.py:371); here the dims (nation, region, customer at
# this scale) broadcast so the only shuffle is lineitem⋈orders.
# ---------------------------------------------------------------------------
@query(
    "star_join_revenue",
    """
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           COUNT(*) AS n_lineitems
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = F.broadcast(t(spark, sf_dir, "customer"))
    nation = F.broadcast(t(spark, sf_dir, "nation"))
    region = F.broadcast(t(spark, sf_dir, "region"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy(
            region.r_name.alias("region_name"), nation.n_name.alias("nation_name")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


# ---------------------------------------------------------------------------
# A1: distinct keys (reference: .unique() calls, TrainDatasets.py:202,329).
# ---------------------------------------------------------------------------
@query(
    "distinct_keys",
    """
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
)
def distinct_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


# ---------------------------------------------------------------------------
# A2 + A7: deterministic keep-first dedup. The reference's
# drop_duplicates (TrainDatasets.py:233,517) keeps pandas iteration
# order; distributed engines have no such order, so "first" is defined by
# an explicit sort key — row_number over (key ORDER BY tiebreak).
# ---------------------------------------------------------------------------
@query(
    "dedup_keep_first",
    """
    SELECT o_custkey, o_orderkey AS first_orderkey, o_totalprice AS first_totalprice
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders
    ) WHERE rn = 1
    """,
)
def dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        t(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("first_orderkey"),
            F.col("o_totalprice").alias("first_totalprice"),
        )
    )


# ---------------------------------------------------------------------------
# A3: grouped counts (reference: len()/shape logging, TrainDatasets.py:254).
# ---------------------------------------------------------------------------
@query(
    "count_per_group",
    """
    SELECT event_type, COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type
    """,
)
def count_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


# ---------------------------------------------------------------------------
# A4: group + collect (annotations-per-image, create_yolo_from_feather.py:
# 41-55). Collected order is nondeterministic in any parallel engine, so
# the collected list is sorted — same policy on both sides.
# ---------------------------------------------------------------------------
@query(
    "group_collect_sorted",
    """
    SELECT l_orderkey,
           string_agg(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber) AS linenumbers,
           COUNT(*) AS n_lines
    FROM lineitem
    GROUP BY l_orderkey
    """,
)
def group_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("l_linenumber")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("linenumbers"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# A5: flatten-collect — the reference flattens all tag arrays of an image
# with a nested comprehension (TrainDatasets.py:341); here: all token
# arrays of a source, flattened, counted.
# ---------------------------------------------------------------------------
@query(
    "flatten_collect",
    """
    SELECT source,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           COUNT(*) AS n_docs
    FROM documents
    GROUP BY source
    """,
)
def flatten_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            F.sum(F.size(F.split(F.col("text"), " "))).cast("bigint").alias("total_tokens"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


# ---------------------------------------------------------------------------
# A6: sorted-distinct dictionary encode — category -> dense id starting at
# 1 (background=0 reserved), reference create_coco_from_feather.py:59-70.
# row_number over an explicit ordering replaces iteration-order ids.
# ---------------------------------------------------------------------------
@query(
    "dict_encode",
    """
    SELECT p_brand AS category,
           CAST(ROW_NUMBER() OVER (ORDER BY p_brand) AS BIGINT) AS category_id
    FROM (SELECT DISTINCT p_brand FROM part)
    """,
)
def dict_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Unpartitioned window is safe here: input is DISTINCT p_brand — a
    # dictionary-sized dimension (25 values at any SF), not fact data.
    # Fact-sized dense ids go through operators.ids.dense_ids instead.
    w = Window.orderBy("p_brand")
    return (
        t(spark, sf_dir, "part")
        .select("p_brand")
        .distinct()
        .withColumn("category_id", F.row_number().over(w).cast("bigint"))
        .select(F.col("p_brand").alias("category"), "category_id")
    )


# ---------------------------------------------------------------------------
# A8/A9: array min/max envelope + centroid (segmentation2bbox,
# COCOUtils.py:82-89; np.mean(corners) COCOUtils.py:41) — expressed with
# array HOFs over the embeddings vectors (same array<float> type as the
# reference's segmentation/dims columns).
# ---------------------------------------------------------------------------
@query(
    "array_envelope",
    """
    SELECT vec_id,
           ROUND(CAST(list_aggregate(embedding, 'min') AS DOUBLE), 5) AS vmin,
           ROUND(CAST(list_aggregate(embedding, 'max') AS DOUBLE), 5) AS vmax,
           ROUND(CAST(list_aggregate(embedding, 'sum') AS DOUBLE) / len(embedding), 5) AS vmean,
           len(embedding) AS dim
    FROM embeddings
    """,
)
def array_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    total = F.aggregate(e, F.lit(0.0), lambda acc, x: acc + x.cast("double"))
    return emb.select(
        "vec_id",
        F.round(F.array_min(e).cast("double"), 5).alias("vmin"),
        F.round(F.array_max(e).cast("double"), 5).alias("vmax"),
        F.round(total / F.size(e), 5).alias("vmean"),
        F.size(e).alias("dim"),
    )


# ---------------------------------------------------------------------------
# F1: regex extract — partition-path parsing (TrainDatasets.py:216,506).
# Same regex semantics both sides (no lookarounds — RE2-safe).
# ---------------------------------------------------------------------------
@query(
    "regex_extract",
    """
    SELECT doc_id,
           regexp_extract('project_id=' || CAST(doc_id AS VARCHAR) || '/job_id=7/image_name=img_' ||
                          CAST(doc_id AS VARCHAR) || '.jpeg/part-0.parquet',
                          'project_id=(\\d+)/job_id=(\\d+)/image_name=(.+)/', 1) AS project_id,
           regexp_extract('project_id=' || CAST(doc_id AS VARCHAR) || '/job_id=7/image_name=img_' ||
                          CAST(doc_id AS VARCHAR) || '.jpeg/part-0.parquet',
                          'project_id=(\\d+)/job_id=(\\d+)/image_name=(.+)/', 3) AS image_name
    FROM documents
    """,
)
def regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    path = F.concat(
        F.lit("project_id="),
        F.col("doc_id").cast("string"),
        F.lit("/job_id=7/image_name=img_"),
        F.col("doc_id").cast("string"),
        F.lit(".jpeg/part-0.parquet"),
    )
    pat = r"project_id=(\d+)/job_id=(\d+)/image_name=(.+)/"
    return docs.select(
        "doc_id",
        F.regexp_extract(path, pat, 1).alias("project_id"),
        F.regexp_extract(path, pat, 3).alias("image_name"),
    )


# ---------------------------------------------------------------------------
# F2/F3/F4: filename normalization — redundant .jpeg/.jpg suffix strip
# (JPEG_PAT, CvatApi.py:24) + numeric task-id prefix drop
# (CvatApi.py:269-280).
# ---------------------------------------------------------------------------
@query(
    "filename_normalize",
    """
    SELECT doc_id,
           regexp_replace(
               regexp_replace('42_img_' || CAST(doc_id AS VARCHAR) || '.JPeG.jpg',
                              '\\.[Jj][Pp][Ee]?[Gg](\\.[Jj][Pp][Ee]?[Gg])?$', ''),
               '^[0-9]+_', '') || '.jpeg' AS image_name
    FROM documents
    """,
)
def filename_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    raw = F.concat(F.lit("42_img_"), F.col("doc_id").cast("string"), F.lit(".JPeG.jpg"))
    # Reference JPEG_PAT (CvatApi.py:24) anchored at end; then numeric
    # prefix drop (CvatApi.py:269-280); then forced .jpeg extension
    # (CvatApi.py:296).
    stripped = F.regexp_replace(raw, r"\.[Jj][Pp][Ee]?[Gg](\.[Jj][Pp][Ee]?[Gg])?$", "")
    deprefixed = F.regexp_replace(stripped, r"^[0-9]+_", "")
    return docs.select(
        "doc_id", F.concat(deprefixed, F.lit(".jpeg")).alias("image_name")
    )


# ---------------------------------------------------------------------------
# F5-adjacent: JSON field extraction from stringified-JSON columns — the
# reference models semi-structured data as JSON strings (gt_attr,
# TrainDatasets.py:98); events.props has the same shape.
# ---------------------------------------------------------------------------
@query(
    "json_extract",
    """
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY k
    """,
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("bigint"))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


# ---------------------------------------------------------------------------
# F6-adjacent: timestamp bucketing + grouped aggregates (monthly rollup).
# ---------------------------------------------------------------------------
@query(
    "monthly_rollup",
    """
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS order_month,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_price
    FROM orders
    GROUP BY order_month
    """,
)
def monthly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("order_month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


# ---------------------------------------------------------------------------
# F7 + F12: scalar string/arithmetic functions in one projection —
# lower() (CvatApi.py:72) and element-wise area rcoco[2]*rcoco[3]
# (create_coco_from_feather.py:21,40) over an array column.
# ---------------------------------------------------------------------------
@query(
    "scalar_funcs",
    """
    SELECT vec_id,
           lower('Label_' || CAST(label AS VARCHAR)) AS category,
           ROUND(CAST(embedding[3] AS DOUBLE) * CAST(embedding[4] AS DOUBLE), 6) AS area
    FROM embeddings
    """,
)
def scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.lower(F.concat(F.lit("Label_"), F.col("label").cast("string"))).alias("category"),
        F.round(
            F.element_at("embedding", 3).cast("double")
            * F.element_at("embedding", 4).cast("double"),
            6,
        ).alias("area"),
    )


# ---------------------------------------------------------------------------
# F8: flat coordinate list -> (x,y) pair restructure
# (np.array(seg).reshape(-1,2), COCOUtils.py:14) — expressed with array
# HOFs: x coords are even indices, y coords odd.
# ---------------------------------------------------------------------------
@query(
    "array_restructure",
    """
    SELECT vec_id,
           ROUND(CAST(embedding[1] AS DOUBLE), 5) AS x0,
           ROUND(CAST(embedding[2] AS DOUBLE), 5) AS y0,
           ROUND(CAST(embedding[3] AS DOUBLE), 5) AS x1,
           ROUND(CAST(embedding[4] AS DOUBLE), 5) AS y1,
           CAST(len(embedding) / 2 AS BIGINT) AS n_points
    FROM embeddings
    """,
)
def array_restructure(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")

    def coord(i: int, name: str):
        return F.round(F.element_at("embedding", i).cast("double"), 5).alias(name)

    return emb.select(
        "vec_id",
        coord(1, "x0"),
        coord(2, "y0"),
        coord(3, "x1"),
        coord(4, "y1"),
        (F.size("embedding") / 2).cast("bigint").alias("n_points"),
    )


# ---------------------------------------------------------------------------
# Set op: union-all of per-source frames (pd.concat,
# TrainDatasets.py:196,245,331) — multi-path read / unionByName.
# ---------------------------------------------------------------------------
@query(
    "union_all",
    """
    SELECT o_orderkey AS key, 'urgent' AS bucket FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION ALL
    SELECT o_orderkey AS key, 'low' AS bucket FROM orders WHERE o_orderpriority = '5-LOW'
    """,
)
def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderkey").alias("key"), F.lit("urgent").alias("bucket")
    )
    low = orders.filter(F.col("o_orderpriority") == "5-LOW").select(
        F.col("o_orderkey").alias("key"), F.lit("low").alias("bucket")
    )
    return urgent.unionByName(low)


# ---------------------------------------------------------------------------
# Top-k per group (engine completeness; no reference surface — SURVEY.md
# §2.9 notes the reference has no sorts/limits). Deterministic tiebreak.
# ---------------------------------------------------------------------------
@query(
    "topk_per_group",
    """
    SELECT o_orderpriority, o_orderkey, o_totalprice
    FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Two-phase top-k: o_orderpriority is a 5-value skewed dictionary
    # key, so the fact-sized phase windows on (input partition, group)
    # and only the <= k*P survivors ride the bare per-group window
    # (r12 skew-partition-window lint; waived as bounded-input).
    order = [F.col("o_totalprice").desc(), F.col("o_orderkey")]
    local = Window.partitionBy(
        F.spark_partition_id(), "o_orderpriority"
    ).orderBy(*order)
    pruned = (
        t(spark, sf_dir, "orders")
        .withColumn("__lr", F.row_number().over(local))
        .filter(F.col("__lr") <= 3)
    )
    w = Window.partitionBy("o_orderpriority").orderBy(*order)
    return (
        pruned.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# Rollup grouping sets (engine completeness; SURVEY.md §2.4 notes grouped
# hierarchies are absent in the reference and free in Spark). NULL
# subtotal markers are coalesced to 'ALL' for stable cross-engine hashing.
# ---------------------------------------------------------------------------
@query(
    "rollup_pricing",
    """
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           COUNT(*) AS n,
           ROUND(SUM(l_extendedprice), 2) AS total_price
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "total_price",
        )
    )


# ---------------------------------------------------------------------------
# Approximate distinct (HyperLogLog++): the scale substitute for exact
# COUNT(DISTINCT) — mergeable sketch, no distinct-shuffle of the key
# space. Sketch values are hash-implementation-specific, so there is no
# cross-engine oracle (rows-only driver check); tests/test_splits.py
# asserts <= 5% relative error against the exact count per group.
# ---------------------------------------------------------------------------
@query(
    "approx_distinct_users",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           TRUE    AS approx_within_5pct
    FROM events
    GROUP BY event_type
    """,
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL approximate distinct with a SQL-encodable tolerance oracle.

    Engine HLL sketches never hash-match across engines, so the oracle
    contract is the TOLERANCE, not the estimate: the Spark side computes
    both the HLL estimate (rsd=0.02) and the exact distinct and emits
    ``approx_within_5pct``; the oracle emits literal TRUE. A sketch
    drifting past ±5% flips the boolean and fails the hash compare.
    The exact countDistinct exists ONLY to power this verification-gate
    self-check — the production/user-facing shape is
    ``approx_distinct_users_sketch`` below (sketch-only cost, estimate
    in the output), which is what the bench headline times.
    """
    ev = t(spark, sf_dir, "events")
    exact = F.countDistinct("user_id")
    approx = F.approx_count_distinct("user_id", rsd=0.02)
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.abs(approx - exact) <= exact * F.lit(0.05)).alias("approx_within_5pct"),
    )


@bench_only_query("approx_distinct_users_sketch")
def approx_distinct_users_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production approximate-distinct rollup: ONE aggregation pass, the
    O(1)-memory HLL++ sketch only, estimate in the output schema — at
    100 TB this is the default shape (exact countDistinct is a full
    shuffle of the distinct pairs; the sketch is a fixed-size buffer per
    group merged map-side). BENCH-ONLY (VERDICT r10 item 3): the
    estimate is engine-specific by construction, so no cross-engine
    value oracle can exist and even a rows-only driver row is a
    permanently-unverifiable registry entry — ``approx_distinct_users``
    (the invariant twin above) pins this same sketch within ±5% of
    exact under the driver gate, tests/test_sketches.py pins rows +
    schema + tolerance, and the bench times THIS query so the recorded
    cost is the sketch-only cost (VERDICT r4 item 5)."""
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
    )


# ---------------------------------------------------------------------------
# Pivot (long -> wide): per-user event-type counts as columns. Spark's
# groupBy().pivot() with an EXPLICIT value list — never the
# values-discovery pre-query, which is an extra full scan at scale.
# Oracle uses portable conditional aggregation (identical semantics).
# ---------------------------------------------------------------------------
_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


@query(
    "pivot_event_counts",
    """
    SELECT user_id,
           COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
           COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
           COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
           COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error
    FROM events
    GROUP BY user_id
    """,
)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "user_id",
        *[F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c) for c in _EVENT_TYPES],
    )


# ---------------------------------------------------------------------------
# Set operations: INTERSECT / EXCEPT as first-class queries (SURVEY §2.9
# notes the reference only has membership filters). Customers that
# ordered in both halves of the date range vs only the first half.
# ---------------------------------------------------------------------------
@query(
    "intersect_except_custkeys",
    """
    WITH early AS (
        SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '2021-01-01'
    ),
    late AS (
        SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '2021-01-01'
    )
    SELECT 'both' AS cohort, o_custkey FROM (SELECT o_custkey FROM early INTERSECT SELECT o_custkey FROM late)
    UNION ALL
    SELECT 'early_only' AS cohort, o_custkey FROM (SELECT o_custkey FROM early EXCEPT SELECT o_custkey FROM late)
    """,
)
def intersect_except_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    cut = F.lit("2021-01-01").cast("timestamp")
    early = orders.filter(F.col("o_orderdate") < cut).select("o_custkey").distinct()
    late = orders.filter(F.col("o_orderdate") >= cut).select("o_custkey").distinct()
    both = early.intersect(late).select(F.lit("both").alias("cohort"), "o_custkey")
    only = early.exceptAll(late).select(
        F.lit("early_only").alias("cohort"), "o_custkey"
    )
    return both.unionByName(only)


# ---------------------------------------------------------------------------
# Exact percentiles (built-in percentile/median, Spark 3.4+): the exact
# twin of the UDAF quantile query — linear-interpolated like DuckDB's
# quantile_cont, so values hash-match exactly.
# ---------------------------------------------------------------------------
@query(
    "exact_percentiles",
    """
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
           ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("l_extendedprice", F.lit(0.99)), 4).alias("p99"),
    )


# ---------------------------------------------------------------------------
# Bloom-pruned semi-join (scale extension of J2/P5): restrict the fact
# table to keys of a selective dimension predicate, with the big side
# filtered by a Bloom filter of the keys BEFORE the shuffle
# (operators.bloom). Result is exactly the plain semi-join — the oracle
# is the plain semi-join — only the exchange volume differs.
# ---------------------------------------------------------------------------
@query(
    "bloom_semi_join_revenue",
    """
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    WHERE l_orderkey IN (
        SELECT o_orderkey FROM orders
        WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 200000
    )
    GROUP BY l_returnflag
    """,
)
def bloom_semi_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bloom import bloom_semi_join

    keys = (
        t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_totalprice") > 200000)
        )
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    li = t(spark, sf_dir, "lineitem")
    return (
        bloom_semi_join(li, keys, ["l_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Bucketed co-located join (scale extension of J1): both fact tables
# are persisted hash-bucketed AND per-bucket sorted on the join key
# (operators.bucketing — Spark's native bucketBy/saveAsTable), so the
# sort-merge join plans with NO Exchange on either side: the shuffle is
# paid once at write time and amortized over every subsequent join. At
# 100 TB this is the standing answer for fact⋈fact joins repeated on
# the same key (orders⋈lineitem here). The result is exactly the plain
# join — the oracle is the plain join; only the exchange count differs,
# and THAT is asserted physically in tests/test_bucketing.py (zero
# shuffles before the join, one for the final aggregate).
# ---------------------------------------------------------------------------
_BUCKETED_TABLES: dict[tuple[str, str], tuple[str, str]] = {}
_BUCKETS = 8


def _bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    import atexit
    import hashlib

    from ..operators.bucketing import (
        session_table_name,
        write_bucketed_table,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _BUCKETED_TABLES:
        scope = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        ot = session_table_name(spark, "bkt_orders", scope)
        lt = session_table_name(spark, "bkt_lineitem", scope)
        write_bucketed_table(
            t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority"),
            ot,
            "o_orderkey",
            _BUCKETS,
        )
        write_bucketed_table(
            t(spark, sf_dir, "lineitem").select(
                "l_orderkey", "l_extendedprice", "l_discount"
            ),
            lt,
            "l_orderkey",
            _BUCKETS,
        )

        def _drop(spark=spark, ot=ot, lt=lt):
            try:
                spark.sql(f"DROP TABLE IF EXISTS {ot}")
                spark.sql(f"DROP TABLE IF EXISTS {lt}")
            except Exception:
                pass  # session already gone at interpreter exit

        atexit.register(_drop)
        _BUCKETED_TABLES[key] = (ot, lt)
    return _BUCKETED_TABLES[key]


@query(
    "bucketed_join_revenue",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n_items,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def bucketed_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    ot, lt = _bucketed_tables(spark, sf_dir)
    orders = spark.table(ot)
    li = spark.table(lt)
    # the merge hint keeps the planner on sort-merge (broadcast would
    # hide the co-location evidence at test scale; at 100 TB neither
    # side broadcasts anyway)
    joined = li.hint("merge").join(
        orders, li.l_orderkey == orders.o_orderkey
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# GROUPING SETS with grouping_id: the general multi-granularity rollup
# (ROLLUP/CUBE are special cases). One scan computes three independent
# granularities — (flag, status), (flag), (month) — in a single
# aggregate; at scale this replaces three scans+shuffles with one, and
# grouping_id disambiguates NULL-as-ALL from genuine NULLs, the
# correctness trap COALESCE-rollups hit. Spark plans a single Expand +
# hash aggregate (partial agg still applies per set).
# ---------------------------------------------------------------------------
@query(
    "grouping_sets_pricing",
    """
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           COALESCE(strftime(date_trunc('month', l_shipdate), '%Y-%m'), 'ALL')
               AS ship_month,
           GROUPING(l_returnflag, l_linestatus,
                    date_trunc('month', l_shipdate)) AS gid,
           COUNT(*) AS n,
           ROUND(SUM(l_extendedprice), 2) AS total_price
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                            (l_returnflag),
                            (date_trunc('month', l_shipdate)))
    """,
)
def grouping_sets_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").withColumn(
        "__month", F.date_trunc("month", F.col("l_shipdate"))
    )
    grouped = li.groupingSets(
        [["l_returnflag", "l_linestatus"], ["l_returnflag"], ["__month"]],
        "l_returnflag",
        "l_linestatus",
        "__month",
    ).agg(
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
    )
    return grouped.select(
        F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
        F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
        F.coalesce(F.date_format("__month", "yyyy-MM"), F.lit("ALL")).alias(
            "ship_month"
        ),
        F.col("gid").cast("bigint").alias("gid"),
        "n",
        "total_price",
    )


# ---------------------------------------------------------------------------
# Unpivot (wide -> long melt) — the inverse reshape of
# pivot_event_counts, via the native DataFrame.unpivot (Spark's Expand
# under the hood: one scan, no join, each input row fans out to
# n_value_columns rows map-side). Zero-count cells are kept, so the
# round-trip pivot -> unpivot is lossless and the output size is exactly
# n_users x n_event_types.
# ---------------------------------------------------------------------------
@query(
    "unpivot_event_counts",
    """
    WITH wide AS (
        SELECT user_id,
               COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
               COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view,
               COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
               COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
               COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error
        FROM events
        GROUP BY user_id
    )
    SELECT user_id, event_type, n
    FROM wide
    UNPIVOT INCLUDE NULLS (n FOR event_type IN (click, view, purchase, signup, error))
    """,
)
def unpivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = pivot_event_counts(spark, sf_dir)
    return wide.unpivot(
        ids=["user_id"],
        values=_EVENT_TYPES,
        variableColumnName="event_type",
        valueColumnName="n",
    )


# ---------------------------------------------------------------------------
# TPC-H-shaped multi-join plans (Q3/Q5 analogues on the driver tables) —
# the join-planning showcase rows of the relational family. Catalyst
# picks the physical strategy: customer/supplier/nation/region are
# dimension-sized and broadcast (under the 10 MB default threshold at
# any realistic dimension scale), the orders⋈lineitem equi-join is the
# only real shuffle, and the top-k lands in TakeOrderedAndProject (heap
# per partition + driver merge of k rows), never a full global sort.
# Ordering keys are ROUNDED revenue + id so the cross-engine rank is
# stable under float summation-order differences.
# ---------------------------------------------------------------------------
@query(
    "q3_shipping_priority",
    """
    SELECT l.l_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    joined = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    """
    SELECT n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN customer c ON o.o_custkey = c.c_custkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('ASIA', 'EUROPE')
    GROUP BY n.n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-table local-supplier volume: the classic snowflake probe.
    Plan shape to want at 100 TB: ONE shuffle (lineitem⋈orders on
    orderkey — the two fact tables); supplier, customer, nation, region
    all broadcast; the co-nation condition (c_nationkey = s_nationkey)
    rides the customer broadcast join as a post-probe filter, never a
    shuffle key."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = t(spark, sf_dir, "region").filter(
        F.col("r_name").isin("ASIA", "EUROPE")
    ).select("r_regionkey")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(
            F.broadcast(cust),
            (orders.o_custkey == cust.c_custkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return joined.groupBy("n_name").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q10 analogue — returned-item lost revenue per customer. The
# plan-shape lesson is LATE DIMENSION ATTACH: aggregate the fact join
# down to one row per custkey FIRST, then join the customer/nation
# attributes onto the <= |customers| aggregate — c_name never rides the
# 100 TB fact shuffle. Top-20 lands in TakeOrderedAndProject (heap,
# never a global sort). Ordering key is rounded revenue + custkey so the
# cross-engine rank is stable under float summation order.
# ---------------------------------------------------------------------------
@query(
    "q10_returned_items",
    """
    SELECT c.c_custkey, c.c_name, n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = (
        t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    per_cust = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    cust = t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    nation = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        per_cust.join(
            F.broadcast(cust), per_cust.o_custkey == cust.c_custkey
        )
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("c_custkey", "c_name", "n_name", "revenue")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# TPC-H Q7 analogue — bilateral shipping volume between two nations by
# ship year. Both nation filters are pushed into broadcast-built
# supplier/customer key sets BEFORE the fact shuffle, so lineitem rows
# from the other 23 nations never enter the orders join; the only
# exchange is orders⋈lineitem on orderkey.
# ---------------------------------------------------------------------------
@query(
    "q7_volume_shipping",
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS ship_year,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY supp_nation, cust_nation, ship_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    ).select("n_nationkey", "n_name")
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    # Nation-filtered key dimensions, built broadcast-side.
    s2 = supp.join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    c2 = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    joined = (
        li.join(F.broadcast(s2), li.l_suppkey == s2.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(c2), orders.o_custkey == c2.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        joined.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# Market-basket association rules over order baskets — support /
# confidence / lift for brand pairs co-purchased in one order. The pair
# join is WITHIN-BASKET (self-join on orderkey): fan-out is bounded by
# basket size squared (~4 items/order), never corpus-quadratic, and the
# candidate space is capped by the brand dictionary (25² pairs) — the
# same bounded-key-domain argument as the dict joins. Top-30 by lift via
# TakeOrderedAndProject over the <= |brands|² aggregate.
# ---------------------------------------------------------------------------
@query(
    "basket_brand_rules",
    """
    WITH ob AS (
        SELECT DISTINCT l.l_orderkey, p.p_brand
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM ob),
    supp AS (SELECT p_brand, COUNT(*) AS s FROM ob GROUP BY p_brand),
    pc AS (
        SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
               COUNT(*) AS pair_count
        FROM ob a JOIN ob b
          ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
        GROUP BY a.p_brand, b.p_brand
    )
    SELECT pc.brand_a, pc.brand_b, pc.pair_count,
           ROUND(CAST(pc.pair_count AS DOUBLE) / sa.s, 6) AS confidence,
           ROUND(CAST(pc.pair_count AS DOUBLE) * n.n_orders
                 / (sa.s * sb.s), 6) AS lift
    FROM pc
    JOIN supp sa ON pc.brand_a = sa.p_brand
    JOIN supp sb ON pc.brand_b = sb.p_brand
    CROSS JOIN n
    WHERE pc.pair_count >= 3
    ORDER BY lift DESC, brand_a, brand_b
    LIMIT 30
    """,
)
def basket_brand_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # Materialize the distinct basket set once: it feeds FOUR consumers
    # (both sides of the pair self-join, the per-brand support counts and
    # the n_orders anchor) and each would otherwise re-run the
    # lineitem⋈part join + distinct — the same shared-basket boundary
    # item_item_cosine uses (at 100 TB this is a written basket table).
    ob = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
        .localCheckpoint(eager=True)
    )
    a = ob.alias("a")
    b = ob.alias("b")
    pc = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_brand") < F.col("b.p_brand")),
        )
        .groupBy(
            F.col("a.p_brand").alias("brand_a"),
            F.col("b.p_brand").alias("brand_b"),
        )
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .filter(F.col("pair_count") >= 3)
    )
    supp = ob.groupBy("p_brand").agg(F.count(F.lit(1)).alias("s"))
    n = ob.select(
        F.countDistinct("l_orderkey").alias("n_orders")
    )  # 1-row frame, broadcast below — never a collected scalar
    sa = supp.select(
        F.col("p_brand").alias("brand_a"), F.col("s").alias("sa")
    )
    sb = supp.select(
        F.col("p_brand").alias("brand_b"), F.col("s").alias("sb")
    )
    return (
        pc.join(F.broadcast(sa), "brand_a")
        .join(F.broadcast(sb), "brand_b")
        .join(F.broadcast(n))
        .select(
            "brand_a",
            "brand_b",
            "pair_count",
            F.round(F.col("pair_count").cast("double") / F.col("sa"), 6).alias(
                "confidence"
            ),
            F.round(
                F.col("pair_count").cast("double") * F.col("n_orders")
                / (F.col("sa") * F.col("sb")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "brand_a", "brand_b")
        .limit(30)
    )


# ---------------------------------------------------------------------------
# CUBE — all 2^n grouping combinations in ONE Expand + aggregate
# (completing the multi-granularity family: rollup_pricing = prefixes,
# grouping_sets_pricing = explicit sets, cube_pricing = the power set).
# Same single-pass Expand shape: n rows fan to 4 grouping combinations
# map-side, one shuffle total.
# ---------------------------------------------------------------------------
@query(
    "cube_pricing",
    """
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           GROUPING(l_returnflag, l_linestatus) AS gid,
           COUNT(*) AS n,
           ROUND(SUM(l_extendedprice), 2) AS total_price,
           ROUND(SUM(l_quantity), 2) AS total_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            F.col("gid").cast("bigint").alias("gid"),
            "n",
            "total_price",
            "total_qty",
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q8 analogue — market share of one supplier nation inside a
# region's customer market, by order year. The interesting part is the
# RATIO OF CONDITIONAL SUMS over the same joined stream (numerator =
# volume where supp_nation matches, denominator = all volume): one
# pass, no second join tree. Volumes are quantized to integer cents
# (floor(x*100+0.5)) before summing, so the share is a ratio of exact
# BIGINTs — summation order cannot move it — and the only float op is
# the final division.
# ---------------------------------------------------------------------------
@query(
    "q8_market_share",
    """
    WITH mkt AS (
        SELECT CAST(year(o.o_orderdate) AS INT) AS order_year,
               CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100.0
                          + 0.5) AS BIGINT) AS vol_cents,
               sn.n_name = 'NATION_1' AS is_target
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
        JOIN region r   ON cn.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
    )
    SELECT order_year,
           CAST(SUM(CASE WHEN is_target THEN vol_cents ELSE 0 END)
                AS BIGINT) AS target_cents,
           CAST(SUM(vol_cents) AS BIGINT) AS total_cents,
           floor(CAST(SUM(CASE WHEN is_target THEN vol_cents ELSE 0 END)
                      AS DOUBLE)
                 / SUM(vol_cents) * 1000000.0 + 0.5) / 1000000.0
               AS market_share
    FROM mkt GROUP BY order_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = t(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    ).select("r_regionkey")
    # Supplier side carries the target flag; customer side carries the
    # region gate — both broadcast key sets, built before the fact
    # shuffle (the q7 shape).
    s2 = supp.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        supp.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", (F.col("n_name") == "NATION_1").alias("is_target"))
    c2 = (
        cust.join(
            F.broadcast(nation.select("n_nationkey", "n_regionkey")),
            cust.c_nationkey == F.col("n_nationkey"),
        )
        .join(F.broadcast(region), F.col("n_regionkey") == region.r_regionkey)
        .select("c_custkey")
    )
    vol_cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100.0 + 0.5
    ).cast("long")
    joined = (
        li.join(F.broadcast(s2), li.l_suppkey == s2.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(c2), orders.o_custkey == c2.c_custkey)
        .select(
            F.year("o_orderdate").cast("int").alias("order_year"),
            vol_cents.alias("vol_cents"),
            "is_target",
        )
    )
    target = F.sum(F.when(F.col("is_target"), F.col("vol_cents")).otherwise(0))
    total = F.sum("vol_cents")
    return joined.groupBy("order_year").agg(
        target.cast("long").alias("target_cents"),
        total.cast("long").alias("total_cents"),
        (
            F.floor(
                target.cast("double") / total * 1000000.0 + 0.5
            )
            / 1000000.0
        ).alias("market_share"),
    )


# ---------------------------------------------------------------------------
# VARIANT-typed semi-structured extraction (Spark 4's parse_json /
# variant_get — the open-ended-schema path for event properties where
# from_json's fixed schema can't follow producer drift). The variant
# binary is columnar and the typed extraction happens in codegen, so at
# 100 TB this replaces the parse-per-query cost of string JSON with a
# parse-once ingest. The oracle extracts the same path with DuckDB's
# JSON machinery; the k values are exact integers.
# ---------------------------------------------------------------------------
@query(
    "variant_props_extract",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
               AS sum_k,
           CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
               AS min_k,
           CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
               AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def variant_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        F.variant_get(F.parse_json(F.col("props")), "$.k", "bigint").alias(
            "k"
        ),
    )
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("k").cast("long").alias("sum_k"),
        F.min("k").cast("long").alias("min_k"),
        F.max("k").cast("long").alias("max_k"),
    )
