"""Registry-wide plan-lint gate (VERDICT r07 item 3).

Every registered query's plan is linted for 100 TB scale-killers
(plans/audit.lint). Two of the four rules fire on patterns that are
correct when one side is known bounded — those occurrences are WAIVED
individually below, with the justification for each group; the other
two rules (row-at-a-time Python, single-partition funnel) are never
waivable. The gate asserts both directions:

- no query carries an unwaivered finding (a new scale-killer fails CI);
- no waiver is stale (a fixed plan must drop its waiver, so the list
  can only shrink unless a new query justifies a new entry).

Waiver semantics, per group:

- CARTESIAN_SCALAR — BroadcastNestedLoopJoin attaching a GLOBAL
  STATISTIC (a 1-row aggregate: corpus size, total revenue, pooled
  variance, IDF denominator, band edges). The build side is exactly
  one row; plan text carries no cardinality, so the linter cannot
  tell it from a real cross join. The standard Spark shape for
  "divide every row by a global sum".
- CARTESIAN_DIM — crossJoin against a BOUNDED DIMENSION (k-means
  centroids, ANN anchor/probe tables, quantile grids, per-segment
  EDF step lists, candidate-rule brand lists). Cardinality is capped
  by an algorithm constant (k, n_anchors, n_bins), never data-sized;
  the fact side streams through once.
- GLOBAL_WINDOW — an unpartitioned Window whose INPUT is
  dimension-sized: the second phase of two-phase top-k (rank over
  the per-group winners), dense_rank dictionary encoding over a
  sorted-distinct set, EDF/rank steps over an aggregated segment, or
  a deterministic output ordering over a k-row result. The
  data-sized phase is always partitioned; only the reduced frame
  funnels through one task.
- SKEW_WINDOW — a Window partitioned only by a dictionary-class key
  (VERDICT r11 / r12 rule) whose INPUT is bounded: either an
  aggregate at day/hour/vocabulary grain (rows = |dictionary| x
  time-or-vocab grain, not fact-sized), or the survivor phase of a
  two-phase prune (<= k*P rows after a (spark_partition_id, group)
  local window). The fact-sized single-phase shapes this rule exists
  for (doc_length_quartiles' per-lang NTILE, gini's per-nation rank,
  token_budget's per-source cumsum, sample_k/topk/neyman's per-group
  row_number) were all rewritten onto grouped range-bucket forms or
  two-phase prunes in round 12 — the waivers below are only the
  bounded residues.
"""

from __future__ import annotations

import pytest

from ml_pipelines_spark.plans.audit import duplicate_scan_fingerprints, lint
from ml_pipelines_spark.queries import QUERIES

CARTESIAN_SCALAR = {
    "basket_brand_rules",
    "bm25_top_docs",
    "conformal_forecast_band",
    "cuped_adjusted_lift",
    "curate_corpus_v2",
    "decayed_popularity",
    "dedup_recall_eval",
    # 2-row (tp,tq) totals broadcast against the 5-row type dictionary
    "drift_psi_events",
    "dsir_importance_weights",
    "hard_negative_mining",
    "histogram_equi_depth",
    "kaplan_meier_churn",
    "kmv_set_ops_users",
    "kneser_ney_bigrams",
    "ks_test_segments",
    "mannwhitney_segments",
    "naive_bayes_langid",
    "neyman_allocation_sample",
    "pmi_bigrams",
    "profile_orders",
    "psi_drift_orders",
    "q11_important_stock",
    "q22_idle_balance",
    "quantile_treatment_effects",
    "rrf_hybrid_search",
    # the same 1-row corpus-statistics broadcast as bm25_top_docs
    "search_eval_ndcg",
    "seasonal_naive_forecast",
    "seeded_nested_split",
    "source_mix_kl",
    "target_encode_segments",
    "theil_sen_daily_trend",
    "watermark_lateness_audit",
}

CARTESIAN_DIM = {
    "ann_ivf_topk",
    "item_item_cosine",
    "kmeans_inertia",
    "quantile_normalize_lengths",
    "triangle_count_near_dup",
}

GLOBAL_WINDOW = {
    "ann_ivf_topk",
    # second phase of pq_topk's two-phase top-k over k·P survivors,
    # same bounded class as the other ann_* rank windows
    "ann_ivfpq_incremental",
    "ann_ivfpq_topk",
    "ann_lsh_topk",
    "ann_multiprobe_topk",
    "ann_pq_topk",
    "ann_quantized_topk",
    "ann_recall_eval",
    "bm25_top_docs",
    "coco_records",
    "conformal_forecast_band",
    "decayed_popularity",
    "dict_encode",
    "embedding_outliers",
    "event_transitions",
    "item_item_cosine",
    "kaplan_meier_churn",
    "knn_bruteforce",
    "ks_test_segments",
    "lang_source_chisq",
    "length_bucket_batches",
    "link_prediction_copurchase",
    "mannwhitney_segments",
    "peak_concurrency",
    "pmi_bigrams",
    "q20_dominant_suppliers",
    "q21_late_sole_supplier",
    "q2_min_cost_supplier",
    # quantile_normalize_lengths: removed r12 — the grouped
    # range-bucket rank rewrite killed its global window
    "quantile_treatment_effects",
    "rrf_hybrid_search",
    # rank windows over two-phase-pruned k·P survivors + the 10-row
    # IDCG grid, same bounded class as bm25_top_docs/rrf_hybrid_search
    "search_eval_ndcg",
    "theil_sen_daily_trend",
    "top_bigram_share",
    "training_order_docs",
    # piece/seed ranking windows run on the distinct-substring table,
    # bounded by the language's vocabulary like vocab_topk/dict_encode
    "unigram_tokenizer_train",
    "vocab_topk",
    "weighted_sample_docs",
    "yolo_export_lines",
}

SKEW_WINDOW = {
    # edf size gate (round 13, VERDICT r12 item 2): the grouped-*
    # operators take this bare per-group window ONLY after a
    # dictionary-sized probe has PROVED every group holds at most
    # spark.mlps.edf.smallGroupMaxRows rows (default 1,000,000 — a few
    # tens of MB through one task); above that bound the plan is the
    # per-(group, range-bucket) form with no whole-group partition.
    # The bound is runtime-enforced in operators/edf.py
    # (_grouped_prefix_frame), stronger than a static waiver — at the
    # sf0.001 plan-sweep scale the gate always picks the small plan,
    # so these four fire deterministically here.
    "doc_length_quartiles",
    "quantile_normalize_lengths",
    "token_budget_per_source",
    "token_budget_bpe",
    # day-grain aggregate input (|event_type| x days rows)
    "conformal_forecast_band",
    "cusum_change_points",
    "ewma_daily_value",
    # hour-grain aggregate input
    "hourly_anomaly_flags",
    # <= k*P survivors of the two-phase bottom-k hash prune
    "kmv_distinct_users",
    "kmv_set_ops_users",
    # <= budget*P / k*P survivors of a (partition_id, group) local prune
    "neyman_allocation_sample",
    "sample_k_per_source",
    "topk_per_group",
    # (source, token) vocabulary-grain aggregate input
    "zipf_slope_by_source",
}

# ---------------------------------------------------------------------------
# duplicate-scan rule (round 13, VERDICT r12 item 6): plans/audit.
# duplicate_scan_fingerprints flags IDENTICAL parquet-scan node lines
# (same file, filters, read schema) appearing >1 time in one plan —
# the shared-lineage re-execution smell behind round 12's 15 by-hand
# fixes. Scans under an InMemoryRelation (swap_cache) do not count.
# Every firing below is waived with its justification; the sweep test
# asserts both directions (no unwaivered firing, no stale waiver), so
# a new re-execution fails CI and a fixed one must drop its row.
#
# DUP_SCAN_SELF_JOIN — a genuine self-join/self-union of one projected
# frame where the two sides are the SAME pass by construction and the
# frame is either trivially cheap to rescan (a single pruned column of
# a dimension-to-moderate table) or too large to be worth a persisted
# block (the r12 lesson: eager checkpoints on small frames lose to
# re-scan; two column-pruned scans beat one fused scan + exploded
# shuffle).
DUP_SCAN_SELF_JOIN = {
    "ann_ivf_topk",          # centroid build + probe read the same vectors
    "cohort_retention",      # first-event anchor joined back to events
    "dup_rate_by_source",    # fingerprint groups joined back to rows
    "e1_training_assembly",  # filtered customers on both assembly sides
    "embedding_near_dup",    # vector self-join (pair generation)
    "fuzzy_name_pairs",      # supplier-name self-join
    "image_phash_near_dup",  # phash self-join
    "intersect_except_custkeys",  # set-op branches over two date windows
    "interp_gap_fill",       # gap rows joined to neighbor rows
    "kmeans_inertia",        # assign pass + inertia pass over vectors
    "knn_label_agreement",   # query/candidate sides of the kNN join
    "label_centroid_similarity",  # centroid build + similarity probe
    "minhash_near_dup",      # signature band self-join
    "semantic_dedup_pairs",  # normalized-vector self-join
    "simhash_near_dup",      # simhash band self-join
    "track_interpolation",   # track rows joined to next keyframe
    "watermark_lateness_audit",  # event rows vs per-key watermark
}
# DUP_SCAN_TWO_PASS — an algorithm whose two passes are genuinely
# different aggregations of the same input (grain or direction), where
# fusing would trade a pruned columnar re-scan for an exploded shuffle
# or a persisted block of the whole input: two-sample rank tests
# (value grain + segment grain), before/after drift windows, model
# passes over a shared tokenized stream, HLL/sketch build + probe.
DUP_SCAN_TWO_PASS = {
    "conformal_forecast_band",
    "count_min_user_freq",
    "cuped_adjusted_lift",
    "cusum_change_points",
    "drift_psi_events",
    "histogram_equi_depth",
    "incremental_join_view",
    "kmv_set_ops_users",
    "ks_test_segments",
    "mad_outlier_docs",
    "mannwhitney_segments",
    "peak_concurrency",
    "pmi_bigrams",
    "portable_hll_users",
    "profile_orders",
    "q11_important_stock",
    "q7_volume_shipping",
    "remove_dup_passages",
    "rolling_distinct_users_hll",
    "search_eval_ndcg",
    "seasonal_naive_forecast",
    "shallow_clone_divergence",
    "source_mix_kl",
    "target_encode_segments",
    "tfidf_top_terms",
    "theil_sen_daily_trend",
    "training_order_docs",
    "winsorized_stats",
}
# DUP_SCAN_ORACLE_PINNED — seeded_nested_split's three randomSplit
# membership branches re-scan their input by Spark's sampling design;
# the oracle pins Spark's RNG stream per branch, so folding the
# branches into one assignment pass would change declared values
# (examined and left alone in r12 for the same reason).
DUP_SCAN_ORACLE_PINNED = {"seeded_nested_split"}

DUP_SCAN_WAIVERS = (
    DUP_SCAN_SELF_JOIN | DUP_SCAN_TWO_PASS | DUP_SCAN_ORACLE_PINNED
)

WAIVERS: dict[str, set[str]] = {}
for name in CARTESIAN_SCALAR | CARTESIAN_DIM:
    WAIVERS.setdefault(name, set()).add("cartesian")
for name in GLOBAL_WINDOW:
    WAIVERS.setdefault(name, set()).add("global-window")
for name in SKEW_WINDOW:
    WAIVERS.setdefault(name, set()).add("skew-partition-window")

# Never waivable: there is no bounded-input justification for
# row-at-a-time Python or an aggregate-free single-partition funnel.
_UNWAIVABLE = {"python-row-udf", "single-partition-exchange"}
assert not any(r & _UNWAIVABLE for r in WAIVERS.values())


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_registry_plan_is_lint_clean_or_waived(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    findings = lint(df)
    rules = {f.rule for f in findings}
    waived = WAIVERS.get(name, set())
    unwaivered = rules - waived
    assert not unwaivered, (
        f"{name}: unwaivered scale-killer(s) {sorted(unwaivered)} — "
        f"findings: {findings}"
    )
    stale = waived - rules
    assert not stale, (
        f"{name}: stale waiver(s) {sorted(stale)} — the plan no longer "
        "fires this rule; remove the waiver so the list only shrinks"
    )
    # duplicate-scan sweep (same built DataFrame, VERDICT r12 item 6)
    dups = duplicate_scan_fingerprints(df)
    if dups and name not in DUP_SCAN_WAIVERS:
        raise AssertionError(
            f"{name}: identical parquet scan(s) repeated in one plan — "
            f"a shared lineage likely re-executes per consumer: {dups}"
        )
    if not dups and name in DUP_SCAN_WAIVERS:
        raise AssertionError(
            f"{name}: stale duplicate-scan waiver — the plan no longer "
            "repeats a scan; remove it so the list only shrinks"
        )
