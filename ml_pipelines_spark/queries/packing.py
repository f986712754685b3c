"""Sequence-packing queries — fixed token-budget training bins over the
documents table (north-star training-pipeline op; operators.packing).

``sequence_pack_docs`` uses the engine-portable md5 group bucket so the
whole assignment — group, order, cumulative token count, bin — is
value-checked against DuckDB. ``pack_bins_ffd`` is the exact first-fit
variant (Python kernel, capacity-guaranteed) with a rows-only driver
check; its hard properties are pytest-asserted in tests/test_packing.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as T
from ..operators.packing import pack_first_fit, segment_pack
from .registry import query
from .relational import t

_BUDGET = 2048
_GROUPS = 8

# Engine-portable group bucket: int of the first 4 md5 hex chars, mod G.
_GRP_SQL = (
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) "
    f"% {_GROUPS}"
)


def _grp_col() -> F.Column:
    return F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long"),
        F.lit(_GROUPS),
    )


@query(
    "sequence_pack_docs",
    f"""
    WITH d AS (
        SELECT doc_id,
               (CASE WHEN len(trim(text)) = 0 THEN 0
                     ELSE len(string_split_regex(trim(text), '\\s+')) END)
                   AS n_tokens,
               {_GRP_SQL} AS grp
        FROM documents
    ),
    packed AS (
        SELECT doc_id, n_tokens, grp,
               COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY grp ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum
        FROM d
    )
    SELECT doc_id, n_tokens,
           grp * {1 << 40} + CAST(FLOOR(cum / {_BUDGET}) AS BIGINT) AS bin_id
    FROM packed
    """,
)
def sequence_pack_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", T.token_count(F.col("text")).alias("n_tokens")
    )
    return segment_pack(
        docs,
        "n_tokens",
        ["doc_id"],
        budget=_BUDGET,
        num_groups=_GROUPS,
        group_expr=_grp_col(),
    ).select("doc_id", "n_tokens", "bin_id")


@query(
    "pack_bins_ffd",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN len(trim(text)) = 0 THEN 0
                         ELSE len(string_split_regex(trim(text), '\\s+')) END)
                AS BIGINT) AS total_tokens,
           TRUE AS no_overflow,
           TRUE AS bins_within_ff_bound
    FROM documents
    """,
)
def pack_bins_ffd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact first-fit-decreasing bins, with the bin assignment itself a
    Python kernel (not SQL-reproducible) — so the oracle contract is the
    INVARIANTS, computed over the kernel's output in the same plan:
    every document packed exactly once (n_docs matches the table count,
    which the SQL twin computes exactly), no bin over budget, and the
    first-fit bound — at most one bin per hash group can be <= half
    full, hence n_bins <= 2*total_tokens/budget + num_groups. A packing
    bug (lost doc, overflow, runaway bin count) flips a pinned value
    and fails the driver's hash compare. Per-bin fills remain available
    via operators.packing.pack_first_fit directly.
    """
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", T.token_count(F.col("text")).alias("n_tokens")
    )
    packed = pack_first_fit(
        docs, "n_tokens", "doc_id", budget=_BUDGET, num_groups=_GROUPS
    )
    bins = packed.groupBy("bin_id").agg(
        F.count(F.lit(1)).alias("__n"), F.sum("n_tokens").alias("__fill")
    )
    # n_docs AND total_tokens are true cross-engine anchors (DuckDB
    # re-derives both from raw text), so the kernel cannot silently drop
    # or mutate token mass; the two booleans remain self-check
    # invariants (the FFD assignment itself is not SQL-reproducible).
    return bins.agg(
        F.sum("__n").cast("long").alias("n_docs"),
        F.sum("__fill").cast("long").alias("total_tokens"),
        (F.max("__fill") <= F.lit(_BUDGET)).alias("no_overflow"),
        (
            F.count(F.lit(1))
            <= (F.sum("__fill") * 2.0 / _BUDGET + _GROUPS)
        ).alias("bins_within_ff_bound"),
    )


# ---------------------------------------------------------------------------
# Length-bucketed batching: batches of equal-count, near-equal-length
# docs (padding-waste minimization). Group bucket is the portable md5
# expression shared with sequence_pack_docs, so the full assignment —
# group, length-sorted rank, batch id, per-batch max and padding waste —
# is value-checked cross-engine.
# ---------------------------------------------------------------------------
_BATCH = 32


@query(
    "length_bucket_batches",
    f"""
    WITH d AS (
        SELECT doc_id,
               (CASE WHEN len(trim(text)) = 0 THEN 0
                     ELSE len(string_split_regex(trim(text), '\\s+')) END)
                   AS n_tokens,
               {_GRP_SQL} AS grp
        FROM documents
    ),
    ranked AS (
        SELECT doc_id, n_tokens, grp,
               ROW_NUMBER() OVER (PARTITION BY grp ORDER BY n_tokens, doc_id) - 1
                   AS rank
        FROM d
    ),
    assigned AS (
        SELECT doc_id, n_tokens,
               grp * {1 << 40} + CAST(FLOOR(rank / {_BATCH}) AS BIGINT) AS batch_id
        FROM ranked
    )
    SELECT doc_id, n_tokens, batch_id,
           MAX(n_tokens) OVER (PARTITION BY batch_id) AS batch_max_len,
           MAX(n_tokens) OVER (PARTITION BY batch_id) - n_tokens AS pad_waste
    FROM assigned
    """,
)
def length_bucket_batches_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ..operators.packing import length_bucket_batches

    docs = t(spark, sf_dir, "documents").select(
        "doc_id", T.token_count(F.col("text")).alias("n_tokens")
    )
    assigned = length_bucket_batches(
        docs,
        "n_tokens",
        "doc_id",
        batch_size=_BATCH,
        num_groups=_GROUPS,
        group_expr=_grp_col(),
    )
    bmax = F.max("n_tokens").over(Window.partitionBy("batch_id"))
    return assigned.select(
        "doc_id",
        "n_tokens",
        "batch_id",
        bmax.alias("batch_max_len"),
        (bmax - F.col("n_tokens")).alias("pad_waste"),
    )


# ---------------------------------------------------------------------------
# Sequence packing under the PINNED-BPE token cost (functions.tokenizer):
# the opt-in wiring of the subword-tokenizer seam into the packing
# pipeline (VERDICT r4 item 4). Identical packing machinery to
# sequence_pack_docs; only the cost column changes — n_tokens comes from
# the pinned-vocab subword model (vocab hit = 1 token, else
# ceil(len/4)), whose DuckDB twin is exact, so the whole assignment
# stays value-checked. With tiktoken/tokenizers installed, swap
# pinned_token_count for bpe_token_count_udf — same plan shape, no
# oracle (engine-specific vocab).
# ---------------------------------------------------------------------------
from ..functions.tokenizer import pinned_token_count, pinned_token_count_sql  # noqa: E402


@query(
    "sequence_pack_bpe",
    f"""
    WITH d AS (
        SELECT doc_id,
               {pinned_token_count_sql('text')} AS n_tokens,
               {_GRP_SQL} AS grp
        FROM documents
    ),
    packed AS (
        SELECT doc_id, n_tokens, grp,
               COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY grp ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum
        FROM d
    )
    SELECT doc_id, n_tokens,
           grp * {1 << 40} + CAST(FLOOR(cum / {_BUDGET}) AS BIGINT) AS bin_id
    FROM packed
    """,
)
def sequence_pack_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", pinned_token_count(F.col("text")).alias("n_tokens")
    )
    return segment_pack(
        docs,
        "n_tokens",
        ["doc_id"],
        budget=_BUDGET,
        num_groups=_GROUPS,
        group_expr=_grp_col(),
    ).select("doc_id", "n_tokens", "bin_id")


# ---------------------------------------------------------------------------
# Training-shard WRITE + manifest — the terminal sink of the curation
# pipeline: documents land in token-budgeted parquet shards
# (partitionBy(shard_id), one directory per shard = one sequential read
# for the training loader), and the manifest is aggregated from the
# FILES JUST WRITTEN, so the oracle check covers the physical round
# trip, not just the assignment arithmetic. Shards use the same
# portable md5 group + running-sum assignment as sequence_pack_docs;
# the oracle recomputes the whole manifest from raw text. The manifest
# is re-materialized via createDataFrame before the temp dir is
# removed — a driver collect bounded by the SHARD count (total_tokens /
# budget + num_groups rows), never by data volume.
# ---------------------------------------------------------------------------
@query(
    "training_shard_manifest",
    f"""
    WITH d AS (
        SELECT doc_id,
               (CASE WHEN len(trim(text)) = 0 THEN 0
                     ELSE len(string_split_regex(trim(text), '\\s+')) END)
                   AS n_tokens,
               {_GRP_SQL} AS grp
        FROM documents
    ),
    packed AS (
        SELECT doc_id, n_tokens, grp,
               COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY grp ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum
        FROM d
    ),
    a AS (
        SELECT doc_id, n_tokens,
               grp * {1 << 40} + CAST(FLOOR(cum / {_BUDGET}) AS BIGINT)
                   AS shard_id
        FROM packed
    )
    SELECT shard_id, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
    FROM a GROUP BY shard_id
    """,
)
def training_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from ..operators.packing import write_training_shards

    docs = t(spark, sf_dir, "documents").select(
        "doc_id", T.token_count(F.col("text")).alias("n_tokens"), "text"
    )
    out = tempfile.mkdtemp(prefix="shards_")
    try:
        manifest = write_training_shards(
            docs,
            "n_tokens",
            ["doc_id"],
            path=f"{out}/shards",
            budget=_BUDGET,
            num_groups=_GROUPS,
            group_expr=_grp_col(),
        )
        rows = manifest.collect()  # bounded by shard count
        return spark.createDataFrame(rows, manifest.schema).select(
            F.col("shard_id").cast("long").alias("shard_id"),
            F.col("n_docs").cast("long").alias("n_docs"),
            "shard_tokens",
            "first_doc",
            "last_doc",
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)
