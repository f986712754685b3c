"""Registration-order guard: the driver's correctness harness hashes the
FIRST 50 registered queries, so ordering is part of the product contract
(queries/__init__.py:_CHECK_FIRST). These tests fail loudly if an edit
silently rotates a family out of the checked window.
"""

from __future__ import annotations

from ml_pipelines_spark.queries import ORACLES, QUERIES
from ml_pipelines_spark.queries.__init__ import _CHECK_FIRST


def test_check_first_is_the_window():
    assert list(QUERIES)[: len(_CHECK_FIRST)] == _CHECK_FIRST
    assert len(_CHECK_FIRST) == 50


def test_window_covers_round6_priorities():
    # Round-6 window contract: rule 1 (never driver-checked — the three
    # late-round-5 registrations, the rows-only sketch, and every query
    # new this round), rule 2 (code/oracle touched this round), the
    # flagship, and the oldest-evidence rule-4 block led by the ten
    # r1/r2-evidenced queries whose driver rows are four rounds stale.
    never_checked_entering_r6 = [
        "pca_project_embeddings",
        "quality_classifier_scores",
        "entity_resolution_suppliers",
        "approx_distinct_users_sketch",
    ]
    new_this_round = [
        "kmv_distinct_users",
        "q10_returned_items",
        "q7_volume_shipping",
        "basket_brand_rules",
        "ewma_daily_value",
        "mad_outlier_docs",
        "triangle_count_near_dup",
        "training_shard_manifest",
        "quantile_normalize_lengths",
        "pareto_front_docs",
        "audio_fingerprint_near_dup",
        "knn_label_agreement",
        "containment_pairs_docs",
        "label_prop_communities",
        "cube_pricing",
        "q8_market_share",
        "stream_session_replay",
        "geo_nearest_city",
        "rfm_segments",
        "activity_streaks",
        "classifier_calibration",
        "neyman_allocation_sample",
        "q9_profit_nation_year",
        "q13_order_count_distribution",
        "q16_supplier_variety",
        "q17_small_qty_revenue",
        "q18_large_orders",
        "q19_disjunctive_revenue",
        "q21_late_sole_supplier",
        "q22_idle_balance",
        "range_frame_weekly",
        "zipf_slope_by_source",
    ]
    touched_this_round = [
        "near_dup_components",
        "near_dup_keep_docs",
        "pagerank_near_dup",
        "ngram_jaccard_pairs",
        "logreg_quality_train",
        "pca_top_component",
        "curate_corpus_v2",
    ]
    # Rule 1 fills 42 slots this round (including the six queries
    # registered after the window was first sealed), so rule 4 carries
    # nothing; the stale r1/r2 queries lead round 7's rule 4 together
    # with q11_important_stock.
    late_registrations = [
        "near_dup_keep_best",
        "mixed_lang_docs",
        "ab_test_zscores",
        "label_centroid_similarity",
        "attribution_last_touch",
        "video_scene_cuts",
    ]
    must_be_checked = (
        never_checked_entering_r6
        + new_this_round
        + touched_this_round
        + ["q1_pricing_summary"]
        + late_registrations
    )
    window = set(list(QUERIES)[:50])
    missing = [n for n in must_be_checked if n not in window]
    assert not missing, f"rotated out of the checked window: {missing}"


def test_every_query_registered_and_oracle_subset():
    assert set(ORACLES) <= set(QUERIES)
    # every name in the priority list actually exists
    assert set(_CHECK_FIRST) <= set(QUERIES)
