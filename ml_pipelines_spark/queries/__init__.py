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

# ---------------------------------------------------------------------------
# Registry ordering. The driver's correctness harness hashes the FIRST 50
# registered queries against their oracles each round; registration order is
# therefore the evidence-collection schedule, not an implementation detail.
#
# Round-4 window: (a) the two queries that have never earned a green driver
# row — seeded_nested_split (hash-fail r1+r2, invariant rewrite never
# driver-run) and snapshot_diff_orders (r3 ERR: driver hasher can't
# canonicalize array<string>; now string-encoded) — lead the list; (b) the
# eleven queries NEW this round (multiprobe ANN, the k-means family —
# clusters + SemDeDup + diverse curation + outliers, dup-ngram fraction,
# SCD2, grouping sets, IVM, near-dup resolution, the real
# applyInPandasWithState stream) — first driver rows wanted; (c) the
# relational/splits/text families whose driver evidence dates from r1/r2
# while three rounds of perf work touched their shared code paths (bloom,
# dense-ids, shared scans), plus re-evidence slots for queries whose code
# changed THIS round (minhash regression fix, export fusion,
# approx-distinct rework). The r3-evidenced dedup/similarity/geometry/
# streaming/multimodal families stay out but keep local oracle parity
# (tests/test_oracle_parity.py, same DuckDB hash check), as do the ten
# scalar/filter r1/r2 queries displaced by (b) (regex_extract,
# filename_normalize, json_extract, scalar_funcs, array_restructure,
# union_all, filter_isin, filter_eq, distinct_keys, count_per_group —
# single-expression queries untouched by any perf work, each with two
# prior green driver rows).
# ---------------------------------------------------------------------------
_CHECK_FIRST = [
    # never-green driver rows — round 4 job #1
    "seeded_nested_split",
    "snapshot_diff_orders",
    # new this round — first driver row wanted (true cross-engine oracle)
    "ann_multiprobe_topk",
    "kmeans_embeddings",
    "semantic_dedup_pairs",
    "diverse_curation",
    "dup_ngram_fraction",
    "scd2_orders_history",
    "stream_running_totals",
    "grouping_sets_pricing",
    "incremental_rollup_events",
    "near_dup_keep_docs",
    "embedding_outliers",
    # re-evidence: code touched this round
    "minhash_near_dup",
    "coco_records",
    "yolo_export_lines",
    "approx_distinct_users",
    # flagship
    "q1_pricing_summary",
    # r1/r2-evidenced relational block — fresh rows wanted
    "proj_cast",
    "filter_array_overlap",
    "semi_join",
    "anti_join",
    "star_join_revenue",
    "dedup_keep_first",
    "group_collect_sorted",
    "flatten_collect",
    "dict_encode",
    "array_envelope",
    "monthly_rollup",
    "topk_per_group",
    "rollup_pricing",
    "pivot_event_counts",
    "intersect_except_custkeys",
    "exact_percentiles",
    "bloom_semi_join_revenue",
    "doc_length_quartiles",
    # r1/r2-evidenced splits block
    "hash_split_assign",
    "hash_split_materialize",
    "hash_sample",
    "stratified_sample_docs",
    "sample_k_per_source",
    # r1/r2-evidenced text block
    "text_quality",
    "lang_id",
    "doc_fingerprint",
    "curate_corpus",
    "word_shingles",
    "vocab_topk",
    "tfidf_top_terms",
    "gopher_quality_flags",
    "top_bigram_share",
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
