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


def test_window_covers_round5_priorities():
    # Round-5 window contract (rotation rule 1): every query that had
    # never been driver-checked entering round 5 must be in the window,
    # plus re-evidence for this round's code motion and the flagship.
    never_checked_entering_r5 = [
        "annotator_agreement_iou",
        "approx_median_band",
        "cohort_retention",
        "dataset_card",
        "dup_rate_by_source",
        "event_transitions",
        "funnel_conversion",
        "hashed_doc_vectors",
        "hourly_anomaly_flags",
        "image_redact_checksum",
        "image_resize_checksum",
        "incremental_dedup_batches",
        "kmeans_inertia",
        "lang_source_chisq",
        "length_bucket_batches",
        "lineitem_correlations",
        "ols_value_trend",
        "salted_join_revenue",
        "schema_evolution_read",
        "source_mix_kl",
        "stream_dedup_replay",
        "unpivot_event_counts",
        "video_frame_sample",
        "winsorized_stats",
    ]
    must_be_checked = never_checked_entering_r5 + [
        # rule 1 also covers queries REGISTERED during round 5 — the
        # late-round additions displace rule-2 re-evidence slots
        "remove_dup_passages",
        "logreg_quality_train",
        "dsir_importance_weights",
        "pca_top_component",
        "pagerank_near_dup",
        "stream_enrich_replay",
        "stream_interval_join_replay",
        "curate_corpus_v2",
        # flagship
        "q1_pricing_summary",
    ]
    window = set(list(QUERIES)[:50])
    missing = [n for n in must_be_checked if n not in window]
    assert not missing, f"rotated out of the checked window: {missing}"


def test_every_query_registered_and_oracle_subset():
    assert set(ORACLES) <= set(QUERIES)
    # every name in the priority list actually exists
    assert set(_CHECK_FIRST) <= set(QUERIES)
