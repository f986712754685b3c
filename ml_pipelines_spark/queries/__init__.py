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

# ---------------------------------------------------------------------------
# Registry ordering. The driver's correctness harness hashes the FIRST 50
# registered queries against their oracles each round; registration order is
# therefore the evidence-collection schedule, not an implementation detail.
# Rounds 1-2 checked the relational/windows/splits/text block twice and never
# reached the dedup/similarity/geometry/export/streaming/multimodal/mixture
# families. This explicit list rotates those 43 never-driver-checked queries
# into the window, plus the events-timestamp-dependent windows family (fixed
# this round — fresh evidence wanted) and the flagship. Everything else keeps
# its local-pytest oracle parity (tests/test_oracle_parity.py, same check).
# ---------------------------------------------------------------------------
_CHECK_FIRST = [
    # windows family — re-evidence after the timestamp-unit fix
    "window_lag",
    "last_per_key",
    "interp_gap_fill",
    "forward_fill",
    "rolling_avg_value",
    # never driver-checked: dedup
    "dedup_exact_docs",
    "minhash_signature",
    "minhash_near_dup",
    "ngram_jaccard_pairs",
    "simhash_docs",
    "simhash_near_dup",
    "decontaminate_train",
    "near_dup_components",
    # never driver-checked: similarity / ANN
    "knn_bruteforce",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "embedding_near_dup",
    "embedding_centroids",
    "ann_quantized_topk",
    # never driver-checked: geometry
    "seg_bbox",
    "aabb_poly",
    "yolo_norm",
    "rbb_from_seg",
    # never driver-checked: export sinks
    "coco_records",
    "yolo_export_lines",
    # never driver-checked: tracks / UDAF / as-of
    "track_interpolation",
    "grouped_quantile_udaf",
    "asof_join_events",
    "range_join_events",
    # never driver-checked: streaming windows (timestamp-fix dependent too)
    "tumbling_window",
    "sliding_window",
    "session_window",
    # never driver-checked: multimodal / audio / packing
    "image_meta_decode",
    "image_exif_normalize",
    "audio_frame_features",
    "sequence_pack_docs",
    "pack_bins_ffd",
    # never driver-checked: mixture / validation / profiling / lm
    "mixture_temperature_sample",
    "epoch_repeat_docs",
    "token_budget_per_source",
    "training_order_docs",
    "validate_lineitem",
    "snapshot_diff_orders",
    "profile_orders",
    "top_sources",
    "lm_perplexity_docs",
    # never driver-checked: text tail (registered after slot 50 in r1-r2)
    "pii_redact_docs",
    "chunk_documents",
    # flagship + newly oracle-backed tolerance check
    "q1_pricing_summary",
    "approx_distinct_users",
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
