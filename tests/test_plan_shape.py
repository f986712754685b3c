"""Plan-shape regressions for the round-3 perf fixes.

These pin the STRUCTURE that makes the operators scale, not timings:
timings vary run to run, but a reintroduced extra scan or window pass
shows up deterministically in the physical plan.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _plan_formatted(df) -> str:
    # toString() truncates long field lists (PushedFilters ends in "...");
    # the formatted explain prints every node's attributes in full.
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_validate_fuses_fk_into_one_child_scan(spark, sf_dir):
    # Row checks + FK orphan count must share ONE scan of the child
    # table; uniqueness adds exactly one more. A regression to the
    # anti-join-per-FK shape adds a third lineitem scan (plus a
    # separate total-count scan).
    from ml_pipelines_spark.queries.registry import QUERIES

    plan = _plan(QUERIES["validate_lineitem"](spark, sf_dir))
    lineitem_scans = len(re.findall(r"Scan parquet .*lineitem", plan))
    assert lineitem_scans == 2, f"expected 2 lineitem scans, got {lineitem_scans}"


def test_dense_ids_single_window_pass(spark):
    # Offsets must come from a count aggregation, not from re-executing
    # the ranked subtree: exactly one row_number window over the data.
    from ml_pipelines_spark.operators.ids import dense_ids

    df = spark.range(0, 10000).select(
        (F.col("id") % 97).alias("k"), F.col("id").alias("v")
    )
    out = dense_ids(df, ["k", "v"], id_col="rid")
    plan = _plan(out)
    windows = len(re.findall(r"\bWindow\b", plan))
    # one data window (row_number per bucket) + one bounded cumsum
    # window over <= num-bucket rows
    assert windows <= 2, f"expected <=2 Window nodes, got {windows}:\n{plan}"


def test_coco_records_no_global_data_window(spark, sf_dir):
    # The export must never funnel annotation data through an
    # unpartitioned window; only dictionary-sized inputs (categories,
    # image dimension) may. Guard: the number of window nodes stays at
    # the fused shape's count.
    from ml_pipelines_spark.queries.registry import QUERIES

    plan = _plan(QUERIES["coco_records"](spark, sf_dir))
    windows = len(re.findall(r"\bWindow\b", plan))
    assert windows <= 4, f"expected <=4 Window nodes, got {windows}"


def test_minhash_band_join_reuses_one_exchange(spark, sf_dir):
    """The banded LSH self-join must shuffle the banded rows ONCE and
    feed both sides from the same exchange (ReusedExchange) — two
    independent re-derivations of the shingle → signature → band
    pipeline would double the most expensive pass."""
    from ml_pipelines_spark.queries import QUERIES

    df = QUERIES["minhash_near_dup"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan or "InMemoryTableScan" in plan


def test_minhash_signature_single_md5_per_shingle(spark):
    """The signature aggregation hashes each shingle ONCE (base hash)
    and derives all permutations arithmetically — the optimized plan
    must contain exactly one md5 call, not one per permutation."""
    from pyspark.sql import functions as F

    from ml_pipelines_spark.operators.dedup import (
        base_hash_expr,
        cw_constants,
        perm_value_expr,
    )

    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "shingle"])
    A, B = cw_constants(16)
    hashed = df.select("id", base_hash_expr(F.col("shingle")).alias("h"))
    agg = hashed.groupBy("id").agg(
        *[F.min(perm_value_expr(F.col("h"), A[i], B[i])).alias(f"m{i}") for i in range(16)]
    )
    optimized = agg._jdf.queryExecution().optimizedPlan().toString()
    assert optimized.count("md5") == 1, optimized


def test_coco_anno_join_is_sort_merge_feeding_window(spark, sf_dir):
    # Round-4 shape: image ids reach the fact side via a SORT-MERGE join
    # whose hash(image_name) exchange the per-image rank window reuses —
    # no BroadcastHashJoin on the dimension, and no exchange between the
    # join and the window (only a local Sort). A regression to the
    # broadcast shape re-adds the dim broadcast build AND a second, wider
    # shuffle for the window (~2x end-to-end at sf0.1).
    from ml_pipelines_spark.queries.registry import QUERIES

    plan = _plan(QUERIES["coco_records"](spark, sf_dir))
    assert "SortMergeJoin" in plan
    # the window over the anno fact must sit directly on the join output:
    # between "Window" (anno rank) and SortMergeJoin there is no Exchange
    seg = plan.split("SortMergeJoin")[0]
    anno_window_exchanges = len(re.findall(r"Exchange hashpartitioning", seg))
    assert anno_window_exchanges == 0, (
        "exchange re-appeared between the anno-rank window and the join:\n" + seg
    )


def test_scd2_single_exchange(spark, sf_dir):
    # Segment window and per-run groupBy share the hash(key)
    # partitioning: exactly one hash exchange in the whole plan.
    from ml_pipelines_spark.queries.registry import QUERIES

    plan = _plan(QUERIES["scd2_orders_history"](spark, sf_dir))
    n = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n == 1, f"expected 1 hash exchange, got {n}"


def test_q3_topk_is_heap_not_global_sort(spark, sf_dir):
    # ORDER BY ... LIMIT 10 must land in TakeOrderedAndProject (per-
    # partition heap + driver merge of k rows), never a range-partitioned
    # global Sort — the difference between O(k) and a full extra shuffle
    # at scale.
    from ml_pipelines_spark.queries.registry import QUERIES

    plan = _plan(QUERIES["q3_shipping_priority"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan.lower()


def test_q5_dimensions_broadcast_no_cartesian(spark, sf_dir):
    # The snowflake probe must broadcast every dimension (supplier,
    # customer, nation, region — plus possibly the fact join at test
    # scale, which AQE is free to pick) and must never degrade the
    # co-nation condition (c_nationkey = s_nationkey) into a cartesian
    # or nested-loop join.
    from ml_pipelines_spark.queries.registry import QUERIES

    plan = _plan(QUERIES["q5_local_supplier_volume"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sessionize_single_exchange(spark, sf_dir):
    # The lag window, the running-sum window, AND the per-session rollup
    # must all ride ONE hash exchange on user_id: both windows share the
    # (user_id, ts, event_id) sort, and partitioning by user_id already
    # co-locates every (user_id, session_idx) group.
    from ml_pipelines_spark.queries.registry import QUERIES

    plan = _plan(QUERIES["sessionize_events"](spark, sf_dir))
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_q10_heap_topk_and_late_dimension_attach(spark, sf_dir):
    # Top-20 must be a heap (TakeOrderedAndProject), and the customer /
    # nation attribute joins must be broadcasts sitting ABOVE the
    # aggregate — c_name must never ride the fact shuffle.
    from ml_pipelines_spark.queries.registry import QUERIES

    plan = _plan(QUERIES["q10_returned_items"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan.lower()
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_q7_nation_prune_before_fact_shuffle(spark, sf_dir):
    # Both nation-filtered key sets join the fact as broadcasts; no
    # cartesian from the bilateral OR condition.
    from ml_pipelines_spark.queries.registry import QUERIES

    plan = _plan(QUERIES["q7_volume_shipping"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_basket_rules_no_cartesian(spark, sf_dir):
    # The pair join is an equi-join on l_orderkey (within-basket);
    # support/total joins are broadcasts of dictionary-sized frames.
    from ml_pipelines_spark.queries.registry import QUERIES

    plan = _plan(QUERIES["basket_brand_rules"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    # the 1-row n_orders frame rides a broadcast nested loop (it has no
    # key) — any OTHER nested loop would be a bug, so pin the count.
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_q9_star_all_dims_broadcast(spark, sf_dir):
    # Part, supplier⋈nation, and (at test scale) orders all join the
    # fact as broadcasts; the only hash exchange is the group-by. Never
    # a cartesian.
    from ml_pipelines_spark.queries.registry import QUERIES

    plan = _plan(QUERIES["q9_profit_nation_year"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q13_outer_join_preserved(spark, sf_dir):
    # The right-side-only priority filter must push below the LEFT
    # OUTER join, not convert it to inner: zero-order customers are the
    # point of the distribution.
    from ml_pipelines_spark.queries.registry import QUERIES

    plan = _plan(QUERIES["q13_order_count_distribution"](spark, sf_dir))
    assert "LeftOuter" in plan
    assert "CartesianProduct" not in plan


def test_q16_anti_join_is_broadcast(spark, sf_dir):
    # The negative-balance supplier exclusion is a broadcast LEFT ANTI
    # below the aggregate — the NOT IN subquery must not become a
    # nested-loop or null-aware cartesian.
    from ml_pipelines_spark.queries.registry import QUERIES

    plan = _plan(QUERIES["q16_supplier_variety"](spark, sf_dir))
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_q17_decorrelated_two_scans(spark, sf_dir):
    # The per-part average needs its own lineitem pass; the probe side
    # is the second. A third scan would mean the correlated subquery
    # re-derived the aggregate per consumer.
    from ml_pipelines_spark.queries.registry import QUERIES

    plan = _plan(QUERIES["q17_small_qty_revenue"](spark, sf_dir))
    scans = len(re.findall(r"Scan parquet .*lineitem", plan))
    assert scans == 2, f"expected 2 lineitem scans, got {scans}"
    assert "CartesianProduct" not in plan


def test_q18_topk_is_heap(spark, sf_dir):
    from ml_pipelines_spark.queries.registry import QUERIES

    plan = _plan(QUERIES["q18_large_orders"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan.lower()


def test_q19_disjunction_single_scan(spark, sf_dir):
    # The OR-of-ANDs evaluates in ONE broadcast join over ONE lineitem
    # scan — never a union of three per-branch scans.
    from ml_pipelines_spark.queries.registry import QUERIES

    plan = _plan(QUERIES["q19_disjunctive_revenue"](spark, sf_dir))
    scans = len(re.findall(r"Scan parquet .*lineitem", plan))
    assert scans == 1, f"expected 1 lineitem scan, got {scans}"
    assert "CartesianProduct" not in plan


def test_q21_exists_as_windows_single_fact_scan(spark, sf_dir):
    # The EXISTS / NOT-EXISTS pair collapses into per-order window sets:
    # lineitem is scanned ONCE (the correlated-subquery form would scan
    # it three times) and the sole top-25 is a heap.
    from ml_pipelines_spark.queries.registry import QUERIES

    plan = _plan(QUERIES["q21_late_sole_supplier"](spark, sf_dir))
    scans = len(re.findall(r"Scan parquet .*lineitem", plan))
    assert scans == 1, f"expected 1 lineitem scan, got {scans}"
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_q22_anti_join_after_integer_threshold(spark, sf_dir):
    # The global-average threshold is a 1-row broadcast (nested-loop on
    # one row is fine); the no-recent-orders exclusion is a LEFT ANTI,
    # never a cartesian against orders.
    from ml_pipelines_spark.queries.registry import QUERIES

    plan = _plan(QUERIES["q22_idle_balance"](spark, sf_dir))
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_range_frame_weekly_bounded_exchanges(spark, sf_dir):
    # Daily pre-aggregation + RANGE window: at most two hash exchanges
    # (the (user, day) aggregate and the user window) and no global
    # (unpartitioned) window.
    from ml_pipelines_spark.queries.registry import QUERIES

    plan = _plan(QUERIES["range_frame_weekly"](spark, sf_dir))
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 2
    assert "Exchange SinglePartition, ENSURE_REQUIREMENTS" not in plan


def test_bm25_no_explode_single_scan(spark, sf_dir):
    # Term frequencies for the literal query-term set are codegen array
    # expressions — no token explode, no Generate node, and exactly one
    # pass over documents feeding both the per-doc stats and the
    # one-row corpus aggregate (two scans total in the physical plan:
    # stats side and corpus side of the broadcast).
    from ml_pipelines_spark.queries.registry import QUERIES

    plan = _plan(QUERIES["bm25_top_docs"](spark, sf_dir))
    assert "Generate" not in plan, f"unexpected explode:\n{plan}"
    scans = len(re.findall(r"Scan parquet .*documents", plan))
    assert scans <= 2, f"expected <=2 documents scans, got {scans}"


def test_item_item_counts_are_broadcast(spark, sf_dir):
    # The pair aggregate joins item counts and the basket total by
    # BROADCAST — a regression to shuffled joins doubles the exchanges
    # on a dictionary-sized side.
    from ml_pipelines_spark.queries.registry import QUERIES

    plan = _plan(QUERIES["item_item_cosine"](spark, sf_dir))
    assert len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", plan)) >= 3, plan


def test_bootstrap_single_md5_per_row(spark, sf_dir):
    # The lattice scheme computes ONE md5 per base row; the fan-out
    # carries only integer arithmetic. A regression to per-(row, b)
    # hashing shows as md5 applied after the Generate (explode).
    from ml_pipelines_spark.queries.registry import QUERIES

    plan = _plan(QUERIES["bootstrap_ci_mean"](spark, sf_dir))
    gen_pos = plan.find("Generate")
    md5_pos = plan.rfind("md5")
    assert gen_pos != -1 and md5_pos != -1
    # physical plans print top-down: the md5 projection must sit BELOW
    # (later in the string than) the explode that consumes it
    assert md5_pos > gen_pos, f"md5 above the explode:\n{plan}"


def test_peak_concurrency_windows_partitioned_by_day(spark, sf_dir):
    # Phase 1 must be a day-partitioned window; the only unpartitioned
    # window runs over the per-day totals dimension. Guard: no window
    # whose partition spec is empty consumes the exploded delta stream
    # (heuristic: at most 2 Window nodes, and the plan keeps a
    # broadcast join for the carry-in offsets).
    from ml_pipelines_spark.queries.registry import QUERIES

    plan = _plan(QUERIES["peak_concurrency"](spark, sf_dir))
    windows = len(re.findall(r"\bWindow\b", plan))
    assert windows <= 2, f"expected <=2 Window nodes, got {windows}"
    assert "BroadcastHashJoin" in plan, plan


def test_q6_scan_only_pushdown(spark, sf_dir):
    # Q6 is the pure scan-aggregate: one lineitem scan with ALL THREE
    # predicates pushed to the parquet reader, no join, no extra
    # exchange beyond the single-row partial/final aggregate.
    from ml_pipelines_spark.queries.registry import QUERIES

    df = QUERIES["q6_forecast_revenue"](spark, sf_dir)
    plan = _plan(df)
    scans = len(re.findall(r"Scan parquet .*lineitem", plan))
    assert scans == 1, f"expected 1 lineitem scan, got {scans}"
    assert "Join" not in plan
    full = _plan_formatted(df)
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", full)
    assert pushed, "no PushedFilters in plan"
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed.group(1), f"{col} not pushed: {pushed.group(1)}"


def test_q15_argmax_single_scan_and_broadcast_dim(spark, sf_dir):
    # The window-max form scans lineitem ONCE (the rev.agg(max) twin
    # duplicates the whole aggregate subtree pre-AQE); the supplier
    # dimension joins as a broadcast; the global window runs over the
    # dimension-sized per-supplier aggregate only.
    from ml_pipelines_spark.queries.registry import QUERIES

    plan = _plan(QUERIES["q15_top_supplier"](spark, sf_dir))
    scans = len(re.findall(r"Scan parquet .*lineitem", plan))
    assert scans == 1, f"expected 1 lineitem scan, got {scans}"
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    fact_exchanges = len(re.findall(r"Exchange hashpartitioning\(l_suppkey", plan))
    assert fact_exchanges == 1, f"expected 1 suppkey exchange, got {fact_exchanges}"


def test_gini_single_fact_exchange_and_broadcast_nation(spark, sf_dir):
    # The only fact-sized shuffle is orders → per-customer aggregate;
    # nation attaches as a broadcast; no cartesian anywhere.
    from ml_pipelines_spark.queries.registry import QUERIES

    plan = _plan(QUERIES["gini_revenue_concentration"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    orders_scans = len(re.findall(r"Scan parquet .*orders", plan))
    assert orders_scans == 1, f"expected 1 orders scan, got {orders_scans}"
    assert "BroadcastHashJoin" in plan


def test_kaplan_meier_fact_window_keyed_on_user(spark, sf_dir):
    # The fact-sized window (lead over the event stream) must be keyed
    # on user_id; the KM fold's unkeyed windows run over the ≤31-row
    # duration dimension AFTER the per-user aggregate.
    from ml_pipelines_spark.queries.registry import QUERIES

    plan = _plan(QUERIES["kaplan_meier_churn"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    events_scans = len(re.findall(r"Scan parquet .*events", plan))
    assert events_scans == 2, f"expected 2 events scans (stream + horizon), got {events_scans}"
    assert re.search(r"Window .*partitionBy.*user_id|hashpartitioning\(user_id", plan)


def test_acf_fact_work_is_one_day_groupby(spark, sf_dir):
    # Everything after the groupBy onto epoch-days runs on the day
    # dimension; events is scanned once.
    from ml_pipelines_spark.queries.registry import QUERIES

    plan = _plan(QUERIES["acf_daily_revenue"](spark, sf_dir))
    # The day dimension materializes once (swap_cache boundary); BOTH
    # self-join sides must read the cache (the FileScan text inside an
    # InMemoryRelation is the stored recipe, executed at most once).
    imts = plan.count("InMemoryTableScan")
    assert imts >= 2, f"expected both join sides on the cache, got {imts}"
    assert "CartesianProduct" not in plan


def test_q2_one_fact_shuffle_and_broadcast_dims(spark, sf_dir):
    # The derived-partsupp aggregate is the ONLY fact-sized shuffle;
    # the part filter and the supplier⋈nation⋈region chain broadcast;
    # the per-part argmin window runs over the pair-grained aggregate.
    from ml_pipelines_spark.queries.registry import QUERIES

    plan = _plan(QUERIES["q2_min_cost_supplier"](spark, sf_dir))
    scans = len(re.findall(r"Scan parquet .*lineitem", plan))
    assert scans == 1, f"expected 1 lineitem scan, got {scans}"
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    fact_exchanges = len(
        re.findall(r"Exchange hashpartitioning\(l_partkey.*l_suppkey", plan)
    )
    assert fact_exchanges == 1, f"expected 1 pair-grain exchange, got {fact_exchanges}"


def test_q4_exists_decorrelates_to_broadcast_no_fact_shuffle(spark, sf_dir):
    # The quarter's orders broadcast into the lineitem scan (the
    # correlated 90-day predicate evaluates map-side); the only
    # aggregation input is the surviving late-lines relation. No
    # SortMergeJoin, no fact-sized exchange before the distinct.
    from ml_pipelines_spark.queries.registry import QUERIES

    plan = _plan(QUERIES["q4_order_priority"](spark, sf_dir))
    assert len(re.findall(r"Scan parquet .*lineitem", plan)) == 1
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q12_year_filter_pushed_single_pass_counts(spark, sf_dir):
    # The shipdate year filter reaches the lineitem reader; both
    # priority counts come from ONE aggregation pass (one scan per
    # table, no union of two filtered scans).
    from ml_pipelines_spark.queries.registry import QUERIES

    df = QUERIES["q12_shipmode_priority"](spark, sf_dir)
    plan = _plan(df)
    assert len(re.findall(r"Scan parquet .*lineitem", plan)) == 1
    assert len(re.findall(r"Scan parquet .*orders", plan)) == 1
    assert "CartesianProduct" not in plan
    full = _plan_formatted(df)
    pushed = re.search(r"PushedFilters: \[([^\]]*l_shipdate[^\]]*)\]", full)
    assert pushed, "l_shipdate filter not pushed to the lineitem reader"


def test_q14_conditional_share_single_scan(spark, sf_dir):
    # Promo and total revenue are one conditional aggregate — exactly
    # one lineitem scan with the month filter pushed, part broadcast.
    from ml_pipelines_spark.queries.registry import QUERIES

    df = QUERIES["q14_promo_revenue"](spark, sf_dir)
    plan = _plan(df)
    assert len(re.findall(r"Scan parquet .*lineitem", plan)) == 1
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    full = _plan_formatted(df)
    pushed = re.search(r"PushedFilters: \[([^\]]*l_shipdate[^\]]*)\]", full)
    assert pushed, "l_shipdate filter not pushed to the lineitem reader"


def test_q20_dominance_window_over_pair_grain(spark, sf_dir):
    # One pruned lineitem scan, part broadcast into it, ONE fact
    # shuffle to (supplier, part) grain; the dominance window and the
    # distinct run over that aggregate, never the fact table.
    from ml_pipelines_spark.queries.registry import QUERIES

    plan = _plan(QUERIES["q20_dominant_suppliers"](spark, sf_dir))
    assert len(re.findall(r"Scan parquet .*lineitem", plan)) == 1
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    fact_exchanges = len(
        re.findall(r"Exchange hashpartitioning\(l_suppkey.*l_partkey", plan)
    )
    assert fact_exchanges == 1, f"expected 1 pair-grain exchange, got {fact_exchanges}"


def test_ks_no_unbucketed_fact_window(spark, sf_dir):
    # The EDF prefix sums must run per range-bucket (__b) with the only
    # unpartitioned window over the <=P-row bucket-offset relation; the
    # customer side joins as a broadcast.
    from ml_pipelines_spark.queries.registry import QUERIES

    plan = _plan(QUERIES["ks_test_segments"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "hashpartitioning(__b" in plan, "bucketed cumsum shape missing"


def test_target_encode_broadcast_only_joins(spark, sf_dir):
    # The encoder's stats attach as 5-row / 1-row broadcasts; there is
    # no fact-sized shuffle join anywhere in the plan. (The stats
    # branches re-scan the 3-column projection of orders — deliberate:
    # two extra columnar scans beat shuffling the fact on a 5-value
    # key.)
    from ml_pipelines_spark.queries.registry import QUERIES

    plan = _plan(QUERIES["target_encode_segments"](spark, sf_dir))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_kneser_ney_single_corpus_explode(spark, sf_dir):
    # All four model statistics must read the CACHED bigram-count table
    # (model-sized), not replay the corpus explode: with the warm
    # boundary in place the documents scan appears only inside the
    # InMemoryRelation recipe, and every consumer is an
    # InMemoryTableScan.
    from ml_pipelines_spark.queries.registry import QUERIES

    plan = _plan(QUERIES["kneser_ney_bigrams"](spark, sf_dir))
    assert plan.count("InMemoryTableScan") >= 4, plan[:1500]
    assert "CartesianProduct" not in plan


def test_incremental_join_view_no_view_rescan(spark, sf_dir):
    # The three IVM terms touch only base-table scans (orders/customer
    # projections); union of three joins, no cartesian, customer side
    # broadcast in every term.
    from ml_pipelines_spark.queries.registry import QUERIES

    plan = _plan(QUERIES["incremental_join_view"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 3


def test_rfm_segments_zero_unpartitioned_windows(spark, sf_dir):
    # VERDICT r10 item 2: the global-NTILE rewrite. Every Window node
    # must be partitioned (the range-bucket local ranks); the <=P
    # bucket offsets are driver-cumulated literals, and the recency
    # anchor is a driver literal — so no global window AND no
    # BroadcastNestedLoopJoin, with no lint waiver carried at all.
    from ml_pipelines_spark.plans.audit import lint
    from ml_pipelines_spark.queries.registry import QUERIES

    df = QUERIES["rfm_segments"](spark, sf_dir)
    # lint() == [] covers all four rules, including global-window at
    # the default allowance of zero unpartitioned Window inputs
    assert lint(df) == []
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    # the three score ranks each ride a bucket-partitioned window
    assert plan.count("Window") >= 3


def test_doc_length_quartiles_no_per_lang_window(spark, sf_dir):
    # VERDICT r11 weak item: the per-language NTILE. A language
    # partition is not a dictionary — the dominant language at 100 TB
    # is one task's worth of the whole corpus. The rewrite routes
    # through grouped_ordered_ntiles; since r13 that operator is
    # SIZE-GATED (VERDICT r12 item 2): at this test's scale the gate
    # probe PROVES every language fits one task and the plan is the
    # bare per-lang window (skew-partition-window fires BY DESIGN and
    # is waived with the runtime bound in test_plan_lint_registry).
    # Forcing the gate to zero must restore the bucket-partitioned
    # shape — that is the 100 TB plan this test pins. ntile() itself
    # must appear in neither path (rank arithmetic replaces it).
    from ml_pipelines_spark.operators.edf import _SMALL_GROUP_CONF
    from ml_pipelines_spark.plans.audit import lint
    from ml_pipelines_spark.queries.registry import QUERIES

    small_plan = _plan(QUERIES["doc_length_quartiles"](spark, sf_dir))
    assert "ntile(" not in small_plan
    spark.conf.set(_SMALL_GROUP_CONF, "0")
    try:
        df = QUERIES["doc_length_quartiles"](spark, sf_dir)
    finally:
        spark.conf.unset(_SMALL_GROUP_CONF)
    assert lint(df) == []
    plan = _plan(df)
    assert "ntile(" not in plan
    # every window partition spec that mentions lang also carries the
    # range-bucket helper — no lang-only partition survives above the
    # gate
    for line in plan.splitlines():
        if "Window" in line and "lang" in line:
            assert "__gb" in line, line
