"""Benchmark harness — runs the headline queries and prints one JSON line.

Protocol (BASELINE.md): per-query wall-clock min of 3 warm runs at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``. Queries are forced with the noop sink so the
full plan executes without driver materialization.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ml_pipelines_spark.session import get_spark  # noqa: E402

# Headline set: one per operator family (scan/agg, star join, semi join,
# window, collect, JSON, text/dedup/similarity, geometry kernel, exports,
# multimodal mapInPandas, track interpolation, splits, streaming windows).
HEADLINE = [
    "q1_pricing_summary",
    "star_join_revenue",
    "semi_join",
    "group_collect_sorted",
    "monthly_rollup",
    "json_extract",
    "topk_per_group",
    "window_lag",
    "dedup_exact_docs",
    "minhash_near_dup",
    "simhash_docs",
    "embedding_near_dup",
    "knn_bruteforce",
    "text_quality",
    "tfidf_top_terms",
    "curate_corpus",
    "tumbling_window",
    "session_window",
    "seg_bbox",
    "rbb_from_seg",
    "coco_records",
    "yolo_export_lines",
    "image_meta_decode",
    "track_interpolation",
    "hash_split_materialize",
    "pivot_event_counts",
    "asof_join_events",
    "range_join_events",
    "rollup_pricing",
    "bloom_semi_join_revenue",
    "sequence_pack_docs",
    "ann_quantized_topk",
    "ann_multiprobe_topk",
    "video_frame_sample",
    "gopher_quality_flags",
    "decontaminate_train",
    "mixture_temperature_sample",
    "epoch_repeat_docs",
    "token_budget_per_source",
    "training_order_docs",
    "validate_lineitem",
    "snapshot_diff_orders",
    "profile_orders",
    "lm_perplexity_docs",
    "kmeans_embeddings",
    "semantic_dedup_pairs",
    "diverse_curation",
    "dup_ngram_fraction",
    "scd2_orders_history",
    "grouping_sets_pricing",
    "funnel_conversion",
    "cohort_retention",
    "hourly_anomaly_flags",
    "dataset_card",
    "hashed_doc_vectors",
    "length_bucket_batches",
    "annotator_agreement_iou",
    "dup_rate_by_source",
    "unpivot_event_counts",
    "embedding_outliers",
    "kmeans_inertia",
    "source_mix_kl",
    "winsorized_stats",
    "event_transitions",
    "lang_source_chisq",
    "ols_value_trend",
    "lineitem_correlations",
    # sketch-only production shape (the invariant twin approx_distinct_users
    # stays out of the headline: its exact-countDistinct self-check is
    # gate-only cost, not user-facing cost)
    "approx_distinct_users_sketch",
    # J5 tag attachment through the real broadcast-dimension join path
    "cvat_image_tags",
    # tokenizer-seam wiring: budget/packing under the pinned-BPE cost
    "token_budget_bpe",
    "sequence_pack_bpe",
    # perceptual-hash image near-dup (banded collision, popcount verify)
    "image_phash_near_dup",
    # product-quantization ANN (32x lighter codes scan + LUT-only ADC)
    "ann_pq_topk",
    # TPC-H-shaped multi-join plans (broadcast dims + heap top-k)
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    # gap-based session ids (shared-sort double window + rollup)
    "sessionize_events",
    # boilerplate passage drill-down + information-density signal
    "top_dup_passages",
    "unigram_entropy_docs",
    # portable md5-based sketches (mergeable registers / additive counters)
    "portable_hll_users",
    "count_min_user_freq",
    # FastSS deletion-neighborhood fuzzy join
    "fuzzy_name_pairs",
    # deterministic A-Res weighted sampling
    "weighted_sample_docs",
    # CDC apply: latest-wins upsert/delete with touched-partition rewrites
    "cdc_apply_orders",
    # numeric band join via bin bucketing
    "band_join_balances",
    # end-to-end image curation (tags gate + phash dedup + split)
    "curate_images",
    # duplicated-span removal rewrite (Lee et al. exact substring dedup)
    "remove_dup_passages",
    # batch-GD logistic quality classifier (30 cached agg passes)
    "logreg_quality_train",
    # DSIR importance weights (hashed-unigram target/raw log-ratio)
    "dsir_importance_weights",
    # distributed Gram partials + quantized power iteration
    "pca_top_component",
    # PageRank centrality over the near-dup graph (5 Pregel-lite rounds)
    "pagerank_near_dup",
    # stream-static broadcast enrichment under 2-batch replay
    "stream_enrich_replay",
    # stream-stream interval join (24h attribution), both sides streaming
    "stream_interval_join_replay",
    # modern pipeline end-to-end: span rewrite + DSIR select + dedup + split
    "curate_corpus_v2",
    # entity resolution: FastSS blocking + components + canonical mapping
    "entity_resolution_suppliers",
    # train -> apply: classifier scores + keep decisions for every doc
    "quality_classifier_scores",
    # PCA apply: projection + orthogonal residual for every embedding
    "pca_project_embeddings",
    # --- round 6 additions ---
    # KMV bottom-k distinct sketch (order-statistics family)
    "kmv_distinct_users",
    # TPC-H Q10/Q7 shapes: late dimension attach; pre-shuffle nation prune
    "q10_returned_items",
    "q7_volume_shipping",
    # within-basket association rules (support/confidence/lift)
    "basket_brand_rules",
    # closed-form EWMA over a running window sum
    "ewma_daily_value",
    # median/MAD robust outlier flags
    "mad_outlier_docs",
    # degree-ordered triangle census of the near-dup graph
    "triangle_count_near_dup",
    # token-budgeted training-shard write + read-back manifest
    "training_shard_manifest",
    # per-source ranks onto the global percentile grid
    "quantile_normalize_lengths",
    # two-phase mapInPandas Pareto frontier
    "pareto_front_docs",
    # audio energy-fingerprint near-dup (banded collision + popcount)
    "audio_fingerprint_near_dup",
    # kNN label-noise report over LSH candidates
    "knn_label_agreement",
    # directed shingle-containment pairs (excerpt detection)
    "containment_pairs_docs",
    # semi-supervised label propagation over the LSH graph
    "label_prop_communities",
    # CUBE: the full power set of grouping combinations in one Expand
    "cube_pricing",
    # TPC-H Q8 shape: conditional-sum market share over integer cents
    "q8_market_share",
    # native merging session-window state under 2-batch replay
    "stream_session_replay",
    # grid-bucketed nearest-site spatial join (9-cell broadcast)
    "geo_nearest_city",
    # RFM quintile segmentation (integer-cents monetary order)
    "rfm_segments",
    # gaps-and-islands consecutive-day streaks
    "activity_streaks",
    # score-decile calibration table for the quality classifier
    "classifier_calibration",
    # Neyman-allocation stratified sample (variance-weighted budget)
    "neyman_allocation_sample",
    # TPC-H decision-support completion (Q9/Q13/Q16/Q17/Q18/Q19/Q21/Q22)
    "q9_profit_nation_year",
    "q13_order_count_distribution",
    "q16_supplier_variety",
    "q17_small_qty_revenue",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "q21_late_sole_supplier",
    "q22_idle_balance",
    # RANGE-frame (interval) rolling window over sparse daily series
    "range_frame_weekly",
    # Zipf-slope corpus fit per source (quantized-moment OLS)
    "zipf_slope_by_source",
    # keep the BEST doc per near-dup component (shared edge cache)
    "near_dup_keep_best",
    # chunk-level language disagreement flags
    "mixed_lang_docs",
    # two-proportion z-test over hash-assigned experiment arms
    "ab_test_zscores",
    # label-centroid cosine matrix (annotation-confusion diagnostic)
    "label_centroid_similarity",
    # last-touch attribution via running-max window (no self-join)
    "attribution_last_touch",
    # full-frame decode + lag-window scene-cut flags
    "video_scene_cuts",
    # grouped aggregate vs global-scalar threshold (TPC-H Q11 shape)
    "q11_important_stock",
    # --- round 7 additions ---
    # interval sweep line as a two-phase distributed scan
    "peak_concurrency",
    # seasonal-naive vs naive-1 MAE backtest on day-aligned joins
    "seasonal_naive_forecast",
    # BM25 over a literal term set (codegen tf arrays + corpus broadcast)
    "bm25_top_docs",
    # reciprocal-rank fusion of BM25 and embedding-cosine rankings
    "rrf_hybrid_search",
    # PMI collocations (fixed-order ln sums of exact counts)
    "pmi_bigrams",
    # per-key count-distribution diagnostics for the hot join keys
    "skew_report_keys",
    # md5 5-fold assignment summarized per (fold, lang)
    "stratified_kfold_assign",
    # k-core peel of the near-dup graph (shared edge cache)
    "kcore_near_dup",
    # within-basket item-item cosine/lift neighborhood build
    "item_item_cosine",
    # naive-Bayes distillation of the rule-based lang_id annotator
    "naive_bayes_langid",
    # trailing-7-day distinct via HLL register scatter-merge
    "rolling_distinct_users_hll",
    # DBSCAN-lite dense-cell clustering on the grid dimension
    "grid_density_clusters",
    # bounded-radius multi-source BFS over the near-dup graph
    "bfs_hops_near_dup",
    # point-in-time SCD2 dimension join (exact-cents revenue by version)
    "temporal_join_scd2",
    # deterministic Poisson bootstrap CI (B partials in one pass)
    "bootstrap_ci_mean",
    # per-type CUSUM change-point flags on the daily dimension
    "cusum_change_points",
    # ANALYZE-style equi-depth histogram (percentile edges broadcast)
    "histogram_equi_depth",
    # common-neighbor Jaccard link prediction on the co-purchase graph
    "link_prediction_copurchase",
    # candidate-stage recall/precision QA of the banded LSH
    "dedup_recall_eval",
    # recall@k of each ANN variant vs exact top-k (one row per method)
    "ann_recall_eval",
    # PSI distribution-drift monitor (numeric deciles + categorical)
    "psi_drift_orders",
    # exponential half-life popularity ranking (quantized weights)
    "decayed_popularity",
    # what a 2h watermark drops under 24h-bounded arrival disorder
    "watermark_lateness_audit",
    # single-feature ablation importance (5 margins, one agg pass)
    "feature_ablation_importance",
    # TPC-H Q6 scan-only aggregate and Q15 argmax join-back
    "q6_forecast_revenue",
    "q15_top_supplier",
    # statistical auditing / survival family
    "gini_revenue_concentration",
    "benford_first_digit",
    "kaplan_meier_churn",
    "acf_daily_revenue",
    # weighted Bellman-Ford over the shared co-purchase edge cache
    "shortest_path_copurchase",
    # theta-sketch set algebra (union/intersection estimates)
    "kmv_set_ops_users",
    # rank-2 ALS with bit-equal SSE trajectory oracle
    "als_matrix_factorization",
    # split-conformal coverage audit on the seasonal-naive forecaster
    "conformal_forecast_band",
    # contrastive positives + rank-11..15 hard negatives
    "hard_negative_mining",
    # the TPC-H completion wave (derived-partsupp Q2/Q20, EXISTS Q4,
    # derived-shipmode Q12, promo-share Q14)
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q12_shipmode_priority",
    "q14_promo_revenue",
    "q20_dominant_suppliers",
    # PPJoin prefix-filter exact Jaccard (scale-correct exact path)
    "prefix_jaccard_pairs",
    # interpolated Kneser-Ney bigram LM
    "kneser_ney_bigrams",
    # privacy-readiness audit
    "k_anonymity_audit",
    # distributed exact two-sample KS (no global window)
    "ks_test_segments",
    # leakage-free LOO target encoding + embargoed temporal CV
    "target_encode_segments",
    "temporal_cv_folds",
    # manifest zone-map file skipping
    "manifest_pruned_scan",
    # rank-sum + robust-trend statistics, delta-join IVM
    "mannwhitney_segments",
    "theil_sen_daily_trend",
    "incremental_join_view",
    # index-backed point lookup, DP release counts, BPE training
    "indexed_term_lookup",
    "dp_noisy_lang_counts",
    "bpe_train_merges",
    # table-format lifecycle (write -> CoW merge -> MoR delete -> read)
    # and the streaming snapshot-ingest replay
    "table_format_lifecycle",
    "stream_table_ingest_replay",
    # Spark 4 VARIANT semi-structured extraction
    "variant_props_extract",
    # causal / experimentation estimators
    "diff_in_diff_value",
    "cuped_adjusted_lift",
    "quantile_treatment_effects",
    # WebDataset tar shard export (multimodal training container)
    "webdataset_export_manifest",
    # change-data-feed between table versions; exact higher moments
    "table_change_feed",
    "moments_by_segment",
    # round-12 incremental append scan + table-appends streaming source
    "table_incremental_appends",
    "stream_table_appends_replay",
    # round-8 table-lifecycle completion: metadata-only ALTERs, RESTORE,
    # WAP stage/audit/publish + expire GC, secondary-column stats prune,
    # per-file bloom point lookup — each timing includes its one-time
    # table construction (write + maintenance ops), which IS the cost
    # being measured for a lifecycle query
    "schema_evolution_orders",
    "table_restore_orders",
    "table_expire_maintenance",
    "manifest_stats_scan",
    "manifest_bloom_lookup",
    "zorder_rectangle_scan",
    # MATCH_RECOGNIZE-style journey pattern matching over events
    "sequence_match_funnel",
    # partition-spec evolution scan (per-file tuples, per-spec pruning;
    # timing includes the two-spec table construction it measures)
    "partition_spec_evolution_scan",
    # GDPR erasure cascade (three-table MoR tombstone deletes + orphan
    # audit; construction cost IS the measured lifecycle)
    "gdpr_erasure_audit",
    # optimistic-concurrency branch publish (stage x3, validate, rebase)
    "wap_branch_publish_audit",
    # lossless ORC round-trip with portable row checksum
    "orc_roundtrip_docs",
    # unigram-LM (SentencePiece-style) tokenizer: one corpus pass,
    # then 2 hard-EM rounds on the distinct-word table
    "unigram_tokenizer_train",
    # tokenizer apply: distinct words segmented distributed, token
    # totals + fertility per language (train->apply chain)
    "unigram_token_counts",
    # retrieval-quality eval: nDCG@10 / MRR@10 for bm25/cosine/rrf
    # against deterministic graded relevance
    "search_eval_ndcg",
    # curation funnel observability: per-stage drop counts in ONE pass
    "curation_funnel_audit",
    # IVF-PQ stored index probe: partition-pruned cells, ADC over codes
    "ann_ivfpq_topk",
    # incremental index maintenance: append batch under frozen
    # quantizers, probe over both generations
    "ann_ivfpq_incremental",
    # AQP: 20% hash-sample revenue estimate + calibrated 95% CI
    "aqp_revenue_estimate",
    # spec-table band scan: tuple pruning + per-file column stats
    "partition_spec_band_scan",
    "partition_spec_bucket_scan",
    "hilbert_rectangle_scan",
    "dv_position_delete_audit",
    "mor_merge_audit",
    "dv_schema_evolution_scan",
    "shallow_clone_divergence",
    "heavy_hitters_two_pass",
    "table_snapshots_metadata",
    "drift_psi_events",
    "small_file_compaction_audit",
    # streaming ingest into the spec table (2-batch replay, ledger)
    "stream_spec_ingest_replay",
    # round 9: the reference's image_sampler lifecycle composed
    # end-to-end (semi-join -> tag collect -> skip anti-join -> hash
    # split -> per-split counts + in-plan leakage invariant)
    "e1_training_assembly",
    # round 9: Holt double-exponential smoothing per event type
    "holt_linear_forecast",
    # round 9: named snapshot tags — time travel by name + GC
    # protection through expire_snapshots
    "table_tag_travel",
    # round 9: bucketBy co-located fact join (zero-shuffle sort-merge;
    # warm run pays the one-time bucketed write, timed runs measure the
    # exchange-free join)
    "bucketed_join_revenue",
    # NOT in the headline: stream_outer_join_replay and
    # stream_timeout_sessions_replay run REAL multi-batch streams whose
    # wall time is micro-batch/state-store latency (~20 s each at
    # sf0.1), not engine throughput — the correctness gate runs them at
    # sf0.01 where that latency is the point (same exclusion rationale
    # as the approx_distinct_users invariant twin). They ARE still
    # timed each round (once, no warm-up — latency is the quantity)
    # and recorded under BENCH_FULL's "latency_bound" key, outside the
    # headline total, so a micro-batch-latency regression stays
    # visible without polluting throughput ratios.
]

# Timed once per bench run, recorded outside the headline total.
LATENCY_BOUND = [
    "stream_outer_join_replay",
    "stream_timeout_sessions_replay",
    # round 10 second session: 3-batch CDC-apply replay — per-trigger
    # commit latency (each micro-batch runs a full merge_on_read
    # commit: victim scan, DV write, append, manifest), not throughput
    "stream_mor_upsert_replay",
]

RUNS = 3

# The driver records only the tail of bench stdout (~2000 chars) and
# parses the JSON line from it; round 5's 96-query line exceeded that
# and was recorded UNPARSED (BENCH_r05.json: parsed=null, tail cut
# mid-line). The stdout line therefore carries a bounded per-query
# subset — the round-1 baseline-comparable 42 first (the set BASELINE.md
# ratios are computed against), then the most expensive remaining
# queries until the serialized line reaches _LINE_BUDGET. The COMPLETE
# per-query map for every headline query (and the same total) is
# written to BENCH_FULL.json at the repo root.
_LINE_BUDGET = 1800

# Round-1 recorded set from BASELINE.md "Round 1 measured numbers" —
# the stable cross-round comparison basis.
_BASELINE_R1 = [
    "q1_pricing_summary", "star_join_revenue", "semi_join",
    "group_collect_sorted", "monthly_rollup", "json_extract",
    "topk_per_group", "window_lag", "dedup_exact_docs",
    "minhash_near_dup", "simhash_docs", "embedding_near_dup",
    "knn_bruteforce", "text_quality", "tfidf_top_terms",
    "curate_corpus", "tumbling_window", "session_window", "seg_bbox",
    "rbb_from_seg", "coco_records", "yolo_export_lines",
    "image_meta_decode", "track_interpolation",
    "hash_split_materialize", "pivot_event_counts", "asof_join_events",
    "range_join_events", "rollup_pricing", "bloom_semi_join_revenue",
    "sequence_pack_docs", "ann_quantized_topk", "gopher_quality_flags",
    "decontaminate_train", "mixture_temperature_sample",
    "epoch_repeat_docs", "token_budget_per_source",
    "training_order_docs", "validate_lineitem", "snapshot_diff_orders",
    "profile_orders", "lm_perplexity_docs",
]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _stdout_subset(timings: dict[str, float], sf: float) -> dict[str, float]:
    """Largest prefix of (baseline-42, then priciest rest) whose JSON
    line fits the driver's stdout tail budget."""
    order = [n for n in _BASELINE_R1 if n in timings]
    rest = sorted(
        (n for n in timings if n not in set(order)),
        key=lambda n: -timings[n],
    )
    order += rest
    subset: dict[str, float] = {}
    for name in order:
        trial = dict(subset)
        trial[name] = timings[name]
        line = json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": trial,
                "sf": sf,
            }
        )
        if len(line) > _LINE_BUDGET:
            break
        subset = trial
    return subset


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark(app_name="ml_pipelines_spark-bench")
    spark.sparkContext.setLogLevel("WARN")

    from ml_pipelines_spark.queries import QUERIES
    from ml_pipelines_spark.queries.registry import BENCH_ONLY

    # The bench's universe is the driver-checkable registry PLUS the
    # bench-only shapes (engine-specific-value queries whose correctness
    # rides on a registered invariant twin — registry.BENCH_ONLY).
    QUERIES = {**QUERIES, **BENCH_ONLY}

    # Optional subset (comma-separated names): scale-contract runs time
    # a handful of superlinear-risk queries at a generated scale factor
    # without paying for the whole headline suite (BASELINE.md "Scale
    # stress"). Headline records (sf0.1, no env var) are unaffected.
    subset = os.environ.get("SPARK_GRAFT_QUERIES")
    names = [n for n in HEADLINE if n in QUERIES]
    if subset:
        wanted = [s.strip() for s in subset.split(",") if s.strip()]
        unknown = [n for n in wanted if n not in QUERIES]
        if unknown:
            raise SystemExit(f"unknown queries: {unknown}")
        names = wanted
    timings: dict[str, float] = {}
    for name in names:
        fn = QUERIES[name]
        _force(fn(spark, sf_dir))  # warm (JIT, broadcast, file listing)
        samples = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            _force(fn(spark, sf_dir))
            samples.append(time.perf_counter() - t0)
        # min, not median: JVM codegen-cache evictions across 27
        # queries occasionally push a recompile into a timed run;
        # min measures steady-state throughput, robust to that.
        timings[name] = round(min(samples), 3)
        # NOTE: a between-query spark.catalog.clearCache() was tried to
        # stop cross-query cache accumulation and REGRESSED the suite
        # ~20%: the block deletion is asynchronous and churns the block
        # manager during the NEXT query's timed runs. The warm-boundary
        # slots are bounded (one live entry per key, queries/registry
        # swap_cache), so accumulation is capped without it.

    latency: dict[str, float] = {}
    for name in LATENCY_BOUND if not subset else []:
        if name not in QUERIES:
            continue
        t0 = time.perf_counter()
        _force(QUERIES[name](spark, sf_dir))
        latency[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    full = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        # micro-batch replays: wall time is state-store/trigger latency,
        # not throughput — tracked for regressions, excluded from value.
        "latency_bound": latency,
    }
    # BENCH_FULL.json is the committed sf0.1 record; a contract check at
    # another scale factor must not clobber it.
    full_name = (
        "BENCH_FULL.json" if sf == 0.1 else f"BENCH_FULL_sf{sf}.json"
    )
    if subset:
        # a subset run must never clobber a full record
        full_name = f"BENCH_SUBSET_sf{sf}.json"
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), full_name),
        "w",
    ) as fh:
        json.dump(full, fh, indent=1)
        fh.write("\n")
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": _stdout_subset(timings, sf),
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
