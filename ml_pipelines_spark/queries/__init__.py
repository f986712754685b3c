"""Query registry — one entry per operator from SURVEY.md §2.

Each query is a named pair:
  - a PySpark implementation ``(spark, sf_dir) -> DataFrame``
  - (when SQL-expressible) a DuckDB-ANSI oracle SQL string over the same
    parquet tables, producing identical column names and values.

The driver compares the two at sf=0.01 (row count + schema + order-
insensitive value hash). Column names are aliased identically on both
sides; floating aggregates are rounded on both sides so the comparison is
robust to summation order (Spark sums per-partition, DuckDB serially).
"""

from __future__ import annotations

from .registry import ORACLES, QUERIES, query  # noqa: F401

# Import for registration side effects — each module registers its queries.
from . import relational  # noqa: E402,F401
from . import windows  # noqa: E402,F401
from . import splits  # noqa: E402,F401
from . import text  # noqa: E402,F401
from . import dedup  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import geometry  # noqa: E402,F401
from . import export  # noqa: E402,F401
from . import tracks  # noqa: E402,F401
from . import udaf  # noqa: E402,F401
from . import asof  # noqa: E402,F401
from . import streaming  # noqa: E402,F401
from . import multimodal  # noqa: E402,F401
from . import audio  # noqa: E402,F401
from . import packing  # noqa: E402,F401
from . import mixture  # noqa: E402,F401
from . import validation  # noqa: E402,F401
from . import profiling  # noqa: E402,F401
from . import lm  # noqa: E402,F401
from . import evolution  # noqa: E402,F401
from . import sketches  # noqa: E402,F401
from . import classifier  # noqa: E402,F401
from . import linalg  # noqa: E402,F401
from . import geo  # noqa: E402,F401
from . import tpch  # noqa: E402,F401
from . import timeseries  # noqa: E402,F401
from . import search  # noqa: E402,F401
from . import recsys  # noqa: E402,F401
from . import stats  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Registry ordering. The driver's correctness harness hashes the FIRST 50
# registered queries against their oracles each round; registration order is
# therefore the evidence-collection schedule, not an implementation detail.
#
# STANDING ROTATION SCHEDULE (adopted round 5; VERDICT r4 item 9). With
# ~128 registered queries and a 50-slot window, every query must earn a
# driver row at least once per 3 rounds. Each round the window is filled
# in strict priority order:
#   1. queries that have NEVER had a driver row (new registrations and
#      any query whose prior rows all errored),
#   2. queries whose implementation or oracle changed THIS round
#      (re-evidence after code motion),
#   3. the flagship (q1_pricing_summary rides every round — it is the
#      smoke-check query and its driver row should never go stale),
#   4. remaining slots to the queries with the OLDEST driver evidence,
#      oldest first, family-balanced.
# Queries rotated out always keep local parity coverage —
# tests/test_oracle_parity.py runs ALL registered queries against DuckDB
# with the same hash compare every pytest run.
#
# Round-7 window, filled by the standing schedule:
# (a) rule 1 — never driver-checked: q11_important_stock (registered
#     after the round-6 window sealed) plus the TWELVE queries new this
#     round (sweep-line peak concurrency, seasonal-naive backtest, BM25,
#     RRF hybrid search, PMI collocations, join-key skew report,
#     stratified k-fold, k-core, item-item CF cosine, naive-Bayes
#     annotator distillation, rolling HLL merge, grid-density
#     clustering).
# (b) rule 2 — code touched this round: geo_nearest_city (the
#     longitude-cell coverage fix changed operator AND oracle);
#     pagerank_near_dup re-evidences the swap_cache session-scoping
#     change through the shared cached edge list.
# (c) the flagship.
# (d) rule 4 — 34 slots, oldest evidence first: the ten r2-evidenced
#     scalar/relational queries, then the r3 streaming/multimodal/
#     mixture/packing families and the r3 dedup/similarity remainder.
#     Still waiting (round 8 leads): the r3 window/geometry/udaf/asof
#     block (window_lag, last_per_key, interp_gap_fill, forward_fill,
#     rolling_avg_value, seg_bbox, aabb_poly, yolo_norm, rbb_from_seg,
#     track_interpolation, grouped_quantile_udaf, asof_join_events,
#     range_join_events, sequence_pack_docs, pack_bins_ffd,
#     validate_lineitem, profile_orders, top_sources), then the r4
#     relational/splits/kmeans families.
#
# Round-6 window, filled by the standing schedule:
# (a) rule 1 — never driver-checked: the three late-round-5
#     registrations plus the rows-only sketch query, then the SIXTEEN
#     queries new this round (KMV, TPC-H Q7/Q8/Q10 shapes, basket rules,
#     EWMA, MAD outliers, triangle census, shard manifest, quantile
#     normalization, Pareto skyline, audio fingerprint near-dup, kNN
#     label agreement, shingle containment, label propagation, CUBE,
#     native session-window stream replay, grid-bucketed spatial join,
#     RFM segmentation, gaps-and-islands activity streaks, classifier
#     calibration, Neyman-allocation stratified sampling, the TPC-H
#     Q9/Q13/Q16/Q17/Q18/Q19/Q21/Q22 completion, the RANGE-frame
#     rolling window, and the Zipf-slope corpus fit; plus the six
#     registered after the window was first sealed — best-copy dedup,
#     mixed-language flags, A/B z-test, label-centroid similarity,
#     last-touch attribution, video scene cuts). Rule 1 fills 42 of 50
#     slots this round — never-checked outranks stale-but-green
#     evidence, so NO rule-4 slots this round; round 7's rule 4 leads
#     with q11_important_stock (the one remaining never-checked), the
#     ten r1/r2-evidenced scalar queries, the r5 code-shape carryover
#     (text_quality, pack_bins_ffd, sequence_pack_docs, curate_corpus,
#     rbb_from_seg, snapshot_diff_orders), then the r3
#     streaming/multimodal/mixture/packing families.
# (b) rule 2 — re-evidence for code touched this round: the three
#     near-dup-graph oracles + ngram_jaccard_pairs (shared capped-pairs
#     CTE), logreg_quality_train (cache-release rework),
#     pca_top_component (CTE-list assembly), curate_corpus_v2
#     (localCheckpoint boundary).
# (c) the flagship.
# (d) rule 4 — NO slots this round: rule 1 alone fills 42 of the 49
#     non-flagship slots and never-checked evidence outranks
#     stale-but-green r1/r2 rows. Round 7's rule 4 order is pinned in
#     the (a) note above.
# ---------------------------------------------------------------------------
_CHECK_FIRST = [
    # (a) rule 1: never driver-checked (1 carryover + 12 new this round)
    "q11_important_stock",
    "peak_concurrency",
    "seasonal_naive_forecast",
    "bm25_top_docs",
    "rrf_hybrid_search",
    "pmi_bigrams",
    "skew_report_keys",
    "stratified_kfold_assign",
    "kcore_near_dup",
    "item_item_cosine",
    "naive_bayes_langid",
    "rolling_distinct_users_hll",
    "grid_density_clusters",
    # (b) rule 2: implementation or oracle changed this round
    "geo_nearest_city",
    "pagerank_near_dup",
    # (c) flagship
    "q1_pricing_summary",
    # (d) rule 4: oldest driver evidence first — the ten r2-evidenced
    "filter_isin",
    "filter_eq",
    "distinct_keys",
    "count_per_group",
    "regex_extract",
    "filename_normalize",
    "json_extract",
    "scalar_funcs",
    "array_restructure",
    "union_all",
    # (d) rule 4 continued: r3 streaming/multimodal/mixture/packing
    "session_window",
    "tumbling_window",
    "sliding_window",
    "image_meta_decode",
    "image_exif_normalize",
    "audio_frame_features",
    "epoch_repeat_docs",
    "token_budget_per_source",
    "training_order_docs",
    "mixture_temperature_sample",
    "lm_perplexity_docs",
    "chunk_documents",
    "pii_redact_docs",
    "decontaminate_train",
    # (d) rule 4 continued: r3 dedup/similarity remainder
    "dedup_exact_docs",
    "minhash_signature",
    "simhash_docs",
    "simhash_near_dup",
    "knn_bruteforce",
    # rule 2 (late): the minhash candidate stage was factored out as
    # minhash_lsh_candidates for dedup_recall_eval — minhash_near_dup
    # re-evidences the refactored pairs path, displacing ann_lsh_topk
    # (r3-stale, unchanged code) to round 8 rule 4.
    "minhash_near_dup",
    # (a/b-late) registered after the round-7 window was first sealed —
    # rule 1 (bfs_hops_near_dup, temporal_join_scd2, bootstrap_ci_mean)
    # and rule 2 (scd2_orders_history: its oracle was re-composed around
    # the shared _SCD2_CTES block and its body refactored through
    # _scd2_history_df). These displace the four oldest rule-4 tail
    # entries (ann_ivf_topk, embedding_near_dup, embedding_centroids,
    # ann_quantized_topk), which lead round 8's rule 4 together with
    # ann_lsh_topk and the r3 window/geometry/udaf/asof block. Round-8
    # rule 1: cusum_change_points, histogram_equi_depth,
    # link_prediction_copurchase, dedup_recall_eval, ann_recall_eval,
    # psi_drift_orders, decayed_popularity, watermark_lateness_audit,
    # feature_ablation_importance (registered after this window
    # sealed), plus the round-7 second-wave registrations:
    # q6_forecast_revenue, q15_top_supplier, gini_revenue_concentration,
    # benford_first_digit, kaplan_meier_churn, acf_daily_revenue,
    # shortest_path_copurchase, kmv_set_ops_users,
    # als_matrix_factorization, conformal_forecast_band,
    # hard_negative_mining (link_prediction_copurchase also qualifies
    # under rule 2 — it now reads the shared _copurchase_pairs cache),
    # and the round-7 third-wave registrations: q2_min_cost_supplier,
    # q4_order_priority, q12_shipmode_priority, q14_promo_revenue,
    # q20_dominant_suppliers, prefix_jaccard_pairs, kneser_ney_bigrams,
    # k_anonymity_audit, ks_test_segments, target_encode_segments,
    # temporal_cv_folds, manifest_pruned_scan, mannwhitney_segments,
    # theil_sen_daily_trend, incremental_join_view, indexed_term_lookup,
    # dp_noisy_lang_counts, bpe_train_merges, table_format_lifecycle,
    # stream_table_ingest_replay, variant_props_extract,
    # diff_in_diff_value, cuped_adjusted_lift,
    # quantile_treatment_effects, webdataset_export_manifest,
    # stream_outer_join_replay, stream_timeout_sessions_replay,
    # table_change_feed, moments_by_segment.
    "bfs_hops_near_dup",
    "temporal_join_scd2",
    "bootstrap_ci_mean",
    "scd2_orders_history",
]


def _reorder_registry() -> None:
    missing = [n for n in _CHECK_FIRST if n not in QUERIES]
    if missing:
        raise ValueError(f"_CHECK_FIRST names not registered: {missing}")
    ordered = {n: QUERIES[n] for n in _CHECK_FIRST}
    ordered.update({n: f for n, f in QUERIES.items() if n not in ordered})
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder_registry()
