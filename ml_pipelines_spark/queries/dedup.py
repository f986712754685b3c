"""Deduplication queries — exact, MinHash+LSH, SimHash, n-gram Jaccard.

Every construction is md5-based (operators.dedup), so each has an exact
DuckDB twin: the oracle re-derives signatures, bands, and candidates from
scratch in SQL and must produce the identical pair set — a much stronger
check than row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    prefix_filter_jaccard,
    DEFAULT_MAX_DOC_FREQ,
    contamination_flags,
    fingerprint_dedup_stats,
    jaccard_pairs,
    minhash_lsh_pairs,
    minhash_signature,
    simhash_expr_bits,
    simhash_near_dup_pairs,
)
from .registry import query
from .relational import t

# Shared SQL fragments -------------------------------------------------------

_SHINGLES_CTE = """
    w AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w
        FROM {table}
    ),
    sh AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   generate_series(1, greatest(len(w) - 2, 0)),
                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
        FROM w
    )
"""

NUM_PERM = 16
BANDS = 4
ROWS_PER_BAND = NUM_PERM // BANDS
JACCARD_T = 0.8

# Universal-hash permutation family (operators.dedup.cw_constants /
# base_hash_expr): base hash h = int(md5(shingle)[:7], 16), permutation
# i = (a_i*h + b_i) % (2^31-1) with seeded per-permutation constants —
# embedded below as literal arrays, identical on both engines.
from ..operators.dedup import MERSENNE_P as _P
from ..operators.dedup import cw_constants as _cwc

_A, _B = _cwc(NUM_PERM)
_A_SQL = "[" + ", ".join(str(x) for x in _A) + "]"
_B_SQL = "[" + ", ".join(str(x) for x in _B) + "]"

_SIG_CTE = f"""
    hs AS (
        SELECT doc_id,
               list_transform(s, sg -> CAST(('0x' || substr(md5(sg), 1, 7)) AS BIGINT)) AS h,
               s
        FROM sh WHERE len(s) > 0
    ),
    sig AS (
        SELECT doc_id,
               list_transform(generate_series(1, {NUM_PERM}),
                   i -> list_aggregate(
                            list_transform(h,
                                hh -> (({_A_SQL})[i] * hh + ({_B_SQL})[i]) % {_P}),
                            'min')) AS sig,
               s
        FROM hs
    )
"""


# ---------------------------------------------------------------------------
# Exact dedup by normalized fingerprint. Duplicates are injected
# deterministically (docs with doc_id % 10 == 0 appear twice) so the
# query demonstrably collapses them.
# ---------------------------------------------------------------------------
@query(
    "dedup_exact_docs",
    """
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
    )
    SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp,
           MIN(doc_id) AS keep_id,
           COUNT(*) AS n_copies
    FROM corpus
    GROUP BY fp
    """,
)
def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    dupes = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(dupes)
    return fingerprint_dedup_stats(corpus, "text", "doc_id")


# ---------------------------------------------------------------------------
# MinHash signatures (first 4 permutations shown — full signature is
# array-typed; scalar columns keep the hash comparison simple).
# ---------------------------------------------------------------------------
@query(
    "minhash_signature",
    "WITH "
    + _SHINGLES_CTE.format(table="documents")
    + ", "
    + _SIG_CTE
    + """
    SELECT doc_id, sig[1] AS m0, sig[2] AS m1, sig[3] AS m2, sig[4] AS m3
    FROM sig
    """,
)
def minhash_signature_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    sig = minhash_signature(F.col("text"), num_perm=NUM_PERM, shingle_k=3)
    return (
        docs.select("doc_id", sig.alias("sig"))
        .filter(F.col("sig").isNotNull())
        .select(
            "doc_id",
            F.element_at("sig", 1).alias("m0"),
            F.element_at("sig", 2).alias("m1"),
            F.element_at("sig", 3).alias("m2"),
            F.element_at("sig", 4).alias("m3"),
        )
    )


# ---------------------------------------------------------------------------
# MinHash + banded LSH near-dup pairs, exact-Jaccard verified. The oracle
# rebuilds the identical banding in SQL: same md5 permutations, same
# band slices, same candidate semantics — pair sets must match exactly.
# ---------------------------------------------------------------------------
_BAND_KEYS = ", ".join(
    f"md5(array_to_string(list_transform("
    f"sig[{b * ROWS_PER_BAND + 1}:{(b + 1) * ROWS_PER_BAND}], "
    f"v -> CAST(v AS VARCHAR)), '|')) AS bk{b}"
    for b in range(BANDS)
)
_BAND_UNION = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band_idx, bk{b} AS band_key FROM keyed" for b in range(BANDS)
)

@query(
    "minhash_near_dup",
    "WITH "
    + _SHINGLES_CTE.format(table="documents")
    + ", "
    + _SIG_CTE
    + f"""
    , keyed AS (SELECT doc_id, {_BAND_KEYS} FROM sig),
    banded AS ({_BAND_UNION}),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM banded a JOIN banded b
          ON a.band_idx = b.band_idx AND a.band_key = b.band_key
        WHERE a.doc_id < b.doc_id
    )
    SELECT id_a, id_b,
           ROUND(len(list_intersect(sa.s, sb.s))
                 / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))), 5) AS jaccard
    FROM cand
    JOIN sh sa ON sa.doc_id = id_a
    JOIN sh sb ON sb.doc_id = id_b
    WHERE len(list_intersect(sa.s, sb.s))
          / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))) >= {JACCARD_T}
    """,
)
def minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", threshold=JACCARD_T,
        num_perm=NUM_PERM, bands=BANDS, shingle_k=3,
    )
    return pairs.select("id_a", "id_b", F.round("jaccard", 5).alias("jaccard"))


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard pairs (no LSH) — the recall baseline the LSH
# variant is measured against (tests assert LSH ⊆ exact and recall).
# ---------------------------------------------------------------------------
@query(
    "ngram_jaccard_pairs",
    # Mirrors jaccard_pairs' DEFAULT (finite) stop-shingle cap: shingles
    # with doc-frequency above the cap are dropped on both engines before
    # sizes/intersections, so the twin stays exact at ANY scale factor
    # (at test scale no shingle reaches the cap and the filter is a
    # no-op, preserving prior driver evidence).
    "WITH "
    + _SHINGLES_CTE.format(table="documents")
    + f""",
    ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
    dfq AS (SELECT shingle, COUNT(*) AS dfreq FROM ex GROUP BY shingle),
    kept AS (
        SELECT e.doc_id, list(e.shingle) AS s
        FROM ex e JOIN dfq USING (shingle)
        WHERE dfq.dfreq <= {DEFAULT_MAX_DOC_FREQ}
        GROUP BY e.doc_id
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(len(list_intersect(a.s, b.s))
                 / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 5) AS jaccard
    FROM kept a JOIN kept b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.s, b.s))
          / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= {JACCARD_T}
    """,
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _jaccard_pairs_08(spark, sf_dir)
    return pairs.select("id_a", "id_b", F.round("jaccard", 5).alias("jaccard"))


def _jaccard_pairs_08(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard >= 0.8 pairs (default cap) — the ground-truth set
    shared by ngram_jaccard_pairs and dedup_recall_eval; one shingle
    self-join per (session, sf) via the swap_cache warm boundary."""
    from .registry import swap_cache

    docs = t(spark, sf_dir, "documents")
    # Default (finite) max_doc_freq — the oracles mirror the cap.
    return swap_cache(
        "dedup.jaccard_pairs_08",
        sf_dir,
        jaccard_pairs(docs, "doc_id", "text", threshold=JACCARD_T, shingle_k=3),
    )


# ---------------------------------------------------------------------------
# SimHash (32-bit portable variant — md5-hex arithmetic stays exact in
# both engines up to 32 bits). Bit construction from md5 hex digits is
# replicated digit-for-digit in the oracle. Round 10 widened the
# signature from 16 to 32 bits: candidate volume under banding is
# n^2 / 2^band_bits, and 8-bit bands (256 buckets) measured QUADRATIC at
# the 10x tier (46 s for 50k docs); 16-bit bands (65536 buckets) hold
# the same 2-band pigeonhole recall class (hamming < 2 guaranteed,
# hamming = 2 found with the same ~47% band-clean probability) while
# deferring the quadratic term to multi-million-doc corpora — at which
# point widen again or add bands, the standard SimHash scale knob
# (Manku et al., WWW'07, use 64-bit signatures).
# ---------------------------------------------------------------------------
_BITS = 32

def _sql_digit(j: int) -> str:
    p = j // 4 + 1
    return f"(strpos('0123456789abcdef', h[{p}:{p}]) - 1)"

_SUMS = ", ".join(
    f"SUM(2 * (({_sql_digit(j)} // {2 ** (3 - j % 4)}) % 2) - 1) AS s{j}"
    for j in range(_BITS)
)
_VALUE = " + ".join(f"CASE WHEN s{j} > 0 THEN {2**j} ELSE 0 END" for j in range(_BITS))

@query(
    "simhash_docs",
    f"""
    WITH toks AS (
        SELECT doc_id, unnest(list_distinct(string_split_regex(trim(lower(text)), '\\s+'))) AS tok
        FROM documents
    ),
    h AS (SELECT doc_id, md5(tok) AS h FROM toks),
    sums AS (SELECT doc_id, {_SUMS} FROM h GROUP BY doc_id)
    SELECT doc_id, CAST({_VALUE} AS BIGINT) AS simhash FROM sums
    """,
)
def simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return simhash_expr_bits(docs, "doc_id", "text", bits=_BITS).select(
        F.col("id").alias("doc_id"), "simhash"
    )


# ---------------------------------------------------------------------------
# SimHash near-dup pairs: banded collision on the 32-bit signature (two
# 16-bit bands — total recall for hamming < 2 by pigeonhole, probabilistic
# above, the same knob as MinHash banding), exact Hamming verify via
# xor bit-count. Verification is two longs per pair — no shingle
# intersection — making this the cheap first-pass near-dup filter.
# ---------------------------------------------------------------------------
@query(
    "simhash_near_dup",
    f"""
    WITH toks AS (
        SELECT doc_id, unnest(list_distinct(string_split_regex(trim(lower(text)), '\\s+'))) AS tok
        FROM documents
    ),
    h AS (SELECT doc_id, md5(tok) AS h FROM toks),
    sums AS (SELECT doc_id, {_SUMS} FROM h GROUP BY doc_id),
    sig AS (SELECT doc_id, CAST({_VALUE} AS BIGINT) AS simhash FROM sums),
    banded AS (
        SELECT doc_id, simhash, 0 AS band_idx, simhash % 65536 AS band_val FROM sig
        UNION ALL
        SELECT doc_id, simhash, 1 AS band_idx, simhash // 65536 % 65536 AS band_val FROM sig
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM banded a JOIN banded b
      ON a.band_idx = b.band_idx AND a.band_val = b.band_val
    WHERE a.doc_id < b.doc_id
      AND bit_count(xor(a.simhash, b.simhash)) <= 2
    """,
)
def simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return simhash_near_dup_pairs(
        docs, "doc_id", "text", bits=_BITS, bands=2, max_hamming=2
    ).select(
        F.col("id_a").cast("long"),
        F.col("id_b").cast("long"),
        F.col("hamming").cast("long"),
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination: documents split 6:1 into train/eval by
# doc_id % 7; train docs are flagged when they share a normalized
# fingerprint or any k-word shingle with the eval side (the GPT-3/PaLM
# n-gram collision rule). Both probe sets broadcast — the train side
# never shuffles its own rows.
# ---------------------------------------------------------------------------
DECON_K = 5
_DECON_SHINGLE = " || ' ' || ".join(["w[i]"] + [f"w[i+{j}]" for j in range(1, DECON_K)])
_DECON_SH_LIST = (
    "list_distinct(list_transform(generate_series(1, greatest(len(w) - "
    f"{DECON_K - 1}, 0)), i -> {_DECON_SHINGLE}))"
)
_NORM_FP = "md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))"


@query(
    "decontaminate_train",
    f"""
    WITH train AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 0),
    ev AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 = 0),
    efp AS (SELECT DISTINCT {_NORM_FP} AS fp FROM ev),
    ew AS (SELECT string_split_regex(trim(lower(text)), '\\s+') AS w FROM ev),
    esh AS (SELECT DISTINCT unnest({_DECON_SH_LIST}) AS shingle FROM ew),
    tw AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w FROM train),
    tsh AS (SELECT doc_id, unnest({_DECON_SH_LIST}) AS shingle FROM tw),
    ex AS (SELECT DISTINCT doc_id FROM train WHERE {_NORM_FP} IN (SELECT fp FROM efp)),
    ng AS (SELECT DISTINCT t.doc_id FROM tsh t JOIN esh e USING (shingle))
    SELECT tr.doc_id,
           tr.doc_id IN (SELECT doc_id FROM ex) AS contaminated_exact,
           tr.doc_id IN (SELECT doc_id FROM ng) AS contaminated_ngram
    FROM train tr
    """,
)
def decontaminate_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    train = docs.filter(F.col("doc_id") % 7 != 0)
    ev = docs.filter(F.col("doc_id") % 7 == 0)
    return contamination_flags(train, ev, "doc_id", "text", shingle_k=DECON_K).select(
        "doc_id", "contaminated_exact", "contaminated_ngram"
    )


# ---------------------------------------------------------------------------
# Near-dup clusters: connected components over the Jaccard pair graph
# (operators.components, iterative min-label propagation). The oracle
# computes the same closure by a completely different construction — a
# recursive-CTE transitive closure — so the component assignment itself
# is value-checked, not just row counts.
# ---------------------------------------------------------------------------
COMPONENTS_T = 0.5

# Shared pair CTE for the graph queries (components / keep-docs /
# pagerank). Mirrors jaccard_pairs' DEFAULT_MAX_DOC_FREQ stop-shingle
# cap (same construction as the ngram_jaccard_pairs oracle) so the twin
# stays exact at ANY scale factor — without the cap in the oracle,
# parity held only while no shingle exceeded the cap at the test SF
# (ADVICE r5). At the gate's sf0.01 the filter is a no-op, preserving
# prior driver evidence.
_CAPPED_PAIRS = f"""
    ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
    dfq AS (SELECT shingle, COUNT(*) AS dfreq FROM ex GROUP BY shingle),
    kept AS (
        SELECT e.doc_id, list(e.shingle) AS s
        FROM ex e JOIN dfq USING (shingle)
        WHERE dfq.dfreq <= {{cap}}
        GROUP BY e.doc_id
    ),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM kept a JOIN kept b ON a.doc_id < b.doc_id
        WHERE len(list_intersect(a.s, b.s))
              / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
              >= {COMPONENTS_T}
    )"""


def _near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared near-dup edge list for the four Jaccard-graph queries
    (components / keep-docs / pagerank / triangle census).

    All four consume the IDENTICAL pair join (same threshold, shingle
    size, and stop-shingle cap), so the shingle self-join — the
    expensive subtree — materializes once per (session, sf_dir) via the
    same swap_cache warm-boundary the classifier family uses for its
    feature frame: repeated invocations in a suite run reuse the cached
    edges; a new sf_dir releases the old entry. At 100 TB this boundary
    is a written edge table that every downstream graph job reads —
    exactly this shape, with parquet in place of the cache.
    """
    from .registry import swap_cache

    docs = t(spark, sf_dir, "documents")
    return swap_cache(
        "dedup.near_dup_pairs",
        sf_dir,
        jaccard_pairs(
            docs, "doc_id", "text", threshold=COMPONENTS_T, shingle_k=3
        ),
    )


@query(
    "near_dup_components",
    "WITH RECURSIVE "
    + _SHINGLES_CTE.format(table="documents")
    + ", "
    + _CAPPED_PAIRS.format(cap=DEFAULT_MAX_DOC_FREQ)
    + """,
    edges AS (
        SELECT id_a AS s, id_b AS d FROM pairs
        UNION
        SELECT id_b AS s, id_a AS d FROM pairs
    ),
    nodes AS (SELECT DISTINCT s AS n FROM edges),
    reach(n, r) AS (
        SELECT n, n FROM nodes
        UNION
        SELECT reach.n, e.d FROM reach JOIN edges e ON reach.r = e.s
    )
    SELECT n AS doc_id, MIN(r) AS component FROM reach GROUP BY n
    """,
)
def near_dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.components import connected_components

    pairs = _near_dup_pairs(spark, sf_dir)
    comp = connected_components(pairs, "id_a", "id_b")
    return comp.select(F.col("node").alias("doc_id"), "component")


# ---------------------------------------------------------------------------
# Incremental dedup vs a STORED fingerprint index — the end-to-end
# maintenance path (init → admit batch 1 → admit batch 2 against the
# index batch 1 wrote), value-checked cross-engine: the oracle replays
# both batches declaratively (keep-first within batch 2, anti-join on
# batch 1's fingerprint set). Batch 2 deliberately re-submits every
# doc_id % 10 == 0 text under a new id, so cross-batch rejection is
# exercised, not vacuous. Writes go to a fresh temp dir per invocation,
# keeping the query deterministic and the driver's sf_dir untouched.
# ---------------------------------------------------------------------------
@query(
    "incremental_dedup_batches",
    """
    WITH b1 AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0
    ),
    b2 AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
        UNION ALL
        SELECT doc_id + 2000000 AS doc_id, text
        FROM documents WHERE doc_id % 10 = 0
    ),
    fp1 AS (
        SELECT DISTINCT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
        FROM b1
    ),
    b2fp AS (
        SELECT doc_id,
               md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
        FROM b2
    ),
    first2 AS (
        SELECT doc_id, fp,
               ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM b2fp
    )
    SELECT doc_id, fp FROM first2
    WHERE rn = 1 AND fp NOT IN (SELECT fp FROM fp1)
    """,
)
def incremental_dedup_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..operators.incremental import (
        dedup_against_index,
        init_fingerprint_index,
    )
    from ..functions.text import fingerprint as fp_expr

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    b1 = docs.filter(F.col("doc_id") % 3 != 0)
    b2 = docs.filter(F.col("doc_id") % 3 == 0).unionByName(
        docs.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 2000000).alias("doc_id"), "text"
        )
    )
    index_path = tempfile.mkdtemp(prefix="fp_index_")
    try:
        init_fingerprint_index(spark, index_path)
        dedup_against_index(spark, index_path, b1)
        admitted = dedup_against_index(spark, index_path, b2)
        # admitted is eagerly checkpointed inside dedup_against_index, so
        # the index files are no longer referenced by the returned plan.
        return admitted.select("doc_id", fp_expr(F.col("text")).alias("fp"))
    finally:
        import shutil

        shutil.rmtree(index_path, ignore_errors=True)


# ---------------------------------------------------------------------------
# Near-dup RESOLUTION — the materialization users actually run: keep the
# smallest doc_id of every near-dup component (deterministic keep-min
# policy), pass through every document that collided with nothing. One
# anti-join against the non-representative component members; at scale
# the survivors write is the dedup job's output.
# ---------------------------------------------------------------------------
@query(
    "near_dup_keep_docs",
    "WITH RECURSIVE "
    + _SHINGLES_CTE.format(table="documents")
    + ", "
    + _CAPPED_PAIRS.format(cap=DEFAULT_MAX_DOC_FREQ)
    + """,
    edges AS (
        SELECT id_a AS s, id_b AS d FROM pairs
        UNION
        SELECT id_b AS s, id_a AS d FROM pairs
    ),
    nodes AS (SELECT DISTINCT s AS n FROM edges),
    reach(n, r) AS (
        SELECT n, n FROM nodes
        UNION
        SELECT reach.n, e.d FROM reach JOIN edges e ON reach.r = e.s
    ),
    comp AS (SELECT n AS doc_id, MIN(r) AS component FROM reach GROUP BY n)
    SELECT d.doc_id
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
    WHERE c.doc_id IS NULL OR c.component = d.doc_id
    """,
)
def near_dup_keep_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.components import connected_components

    docs = t(spark, sf_dir, "documents")
    pairs = _near_dup_pairs(spark, sf_dir)
    comp = connected_components(pairs, "id_a", "id_b")
    losers = comp.filter(F.col("component") != F.col("node")).select(
        F.col("node").alias("doc_id")
    )
    return docs.join(losers, "doc_id", "left_anti").select("doc_id")


# ---------------------------------------------------------------------------
# Canonical-document selection — keep the BEST doc per near-dup
# component, not the smallest id: real curation keeps the longest /
# highest-quality copy of a near-duplicate cluster (the short copy is
# usually the truncated scrape). Quality key = (n_chars DESC, doc_id)
# — an exact integer order, so the winner can never flip cross-engine.
# Shares the cached near-dup edge list; singletons (docs in no pair)
# are their own component and keep themselves. One per-component
# window over ≤|docs| rows partitioned by component — never global.
# ---------------------------------------------------------------------------
@query(
    "near_dup_keep_best",
    "WITH RECURSIVE "
    + _SHINGLES_CTE.format(table="documents")
    + ", "
    + _CAPPED_PAIRS.format(cap=DEFAULT_MAX_DOC_FREQ)
    + """,
    edges AS (
        SELECT id_a AS s, id_b AS d FROM pairs
        UNION
        SELECT id_b AS s, id_a AS d FROM pairs
    ),
    nodes AS (SELECT DISTINCT s AS n FROM edges),
    reach(n, r) AS (
        SELECT n, n FROM nodes
        UNION
        SELECT reach.n, e.d FROM reach JOIN edges e ON reach.r = e.s
    ),
    comp AS (SELECT n AS node, MIN(r) AS component FROM reach GROUP BY n),
    lab AS (
        SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component,
               d.n_chars
        FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
    )
    SELECT doc_id, component, n_chars
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY component
                                     ORDER BY n_chars DESC, doc_id) AS rn
        FROM lab
    )
    WHERE rn = 1
    """,
)
def near_dup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ..operators.components import connected_components

    docs = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    pairs = _near_dup_pairs(spark, sf_dir)
    comp = connected_components(pairs, "id_a", "id_b")
    lab = docs.join(
        comp, docs.doc_id == comp.node, "left"
    ).select(
        "doc_id",
        F.coalesce(F.col("component"), F.col("doc_id")).alias("component"),
        "n_chars",
    )
    w = Window.partitionBy("component").orderBy(
        F.col("n_chars").desc(), "doc_id"
    )
    return (
        lab.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "component", "n_chars")
    )


# ---------------------------------------------------------------------------
# Per-source duplication report — the curation dashboard number that
# decides which sources get dedup attention: exact-fingerprint distinct
# counts per source plus the share of docs whose fingerprint also
# appears in ANOTHER source (cross-source contamination). Two aggregate
# passes, no pair joins.
# ---------------------------------------------------------------------------
@query(
    "dup_rate_by_source",
    """
    WITH fp AS (
        SELECT source, doc_id,
               md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
                   AS fp
        FROM documents
    ),
    spread AS (
        SELECT fp, COUNT(DISTINCT source) AS n_sources FROM fp GROUP BY fp
    )
    SELECT fp.source,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT fp.fp) AS n_distinct,
           ROUND(1.0 - COUNT(DISTINCT fp.fp) / COUNT(*), 6) AS dup_rate,
           COUNT(CASE WHEN spread.n_sources > 1 THEN 1 END) AS n_cross_source
    FROM fp JOIN spread ON fp.fp = spread.fp
    GROUP BY fp.source
    """,
)
def dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import text as T

    docs = t(spark, sf_dir, "documents").select(
        "source", "doc_id", T.fingerprint(F.col("text")).alias("fp")
    )
    spread = docs.groupBy("fp").agg(
        F.countDistinct("source").alias("n_sources")
    )
    joined = docs.join(spread, "fp")
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("fp").alias("n_distinct"),
        F.round(
            1.0 - F.countDistinct("fp") / F.count(F.lit(1)), 6
        ).alias("dup_rate"),
        F.count(F.when(F.col("n_sources") > 1, 1)).alias("n_cross_source"),
    )


# ---------------------------------------------------------------------------
# Fuzzy entity matching (operators.dedup.fuzzy_pairs): edit-distance-1
# customer-name pairs via FastSS deletion-neighborhood blocking — the
# entity-resolution member of the dedup family. Candidates come from an
# equi-join on 0/1-deletion variants (O(rows × name-length) blocking
# rows, never an all-pairs product; the construction GUARANTEES every
# distance<=1 pair shares a variant), verified with the exact built-in
# levenshtein on both engines.
# ---------------------------------------------------------------------------
# Corpus note: supplier, not customer — zero-padded id-style names make
# the TRUE distance-1 pair set quadratically dense (each "Name#0001234"
# has ~35 one-digit neighbors; customer at sf0.1 yields 262k pairs, and
# no algorithm beats its own output size). Supplier has the same name
# shape at a tenth of the rows, which keeps the demo's pair volume
# proportionate; the blocking itself is linear either way.
@query(
    "fuzzy_name_pairs",
    """
    WITH v AS (
        SELECT s_suppkey AS id, s_name AS nm,
               CASE WHEN d.i = 0 THEN s_name
                    ELSE substr(s_name, 1, d.i - 1) || substr(s_name, d.i + 1)
               END AS variant
        FROM supplier
        CROSS JOIN (SELECT unnest(generate_series(0, 40)) AS i) d
        WHERE d.i <= len(s_name)
    )
    SELECT DISTINCT a.id AS id_a, b.id AS id_b,
           CAST(levenshtein(a.nm, b.nm) AS INT) AS dist
    FROM v a JOIN v b ON a.variant = b.variant AND a.id < b.id
    WHERE levenshtein(a.nm, b.nm) <= 1
    """,
)
def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import fuzzy_pairs

    supp = t(spark, sf_dir, "supplier")
    return fuzzy_pairs(supp, "s_suppkey", "s_name").select(
        "id_a", "id_b", F.col("dist").cast("int").alias("dist")
    )


# ---------------------------------------------------------------------------
# Duplicated-span REMOVAL (rewrite, not just measurement) — word-level
# Lee et al. 2022 exact substring dedup. k=6 sits on the corpus's
# coverage plateau (k=6 and k=8 cut the same ~10% of words at sf0.001,
# so the cuts are genuine planted boilerplate, not k-gram noise). The
# oracle re-derives positional shingles, doc frequencies, covered
# positions, and the stitched text — every output value cross-engine.
# ---------------------------------------------------------------------------
_RDS_K = 6
_RDS_SH = " || ' ' || ".join(
    (f"lw[s+{j}]" if j else "lw[s]") for j in range(_RDS_K)
)

# Shared CTE block ending in cleaned(doc_id, n_words, n_removed,
# cleaned_text) — used by remove_dup_passages and curate_corpus_v2.
_RDS_CTES = f"""w AS (
        SELECT doc_id,
               list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                           x -> x <> '') AS lw,
               list_filter(string_split_regex(trim(text), '\\s+'),
                           x -> x <> '') AS ow
        FROM documents
    ),
    shu AS (
        SELECT doc_id,
               unnest(list_transform(
                   generate_series(1, greatest(len(lw) - {_RDS_K - 1}, 0)),
                   s -> struct_pack(start := s, shingle := {_RDS_SH}))) AS ps
        FROM w
    ),
    sh2 AS (SELECT doc_id, ps.start AS start, ps.shingle AS shingle FROM shu),
    freq AS (
        SELECT shingle FROM sh2 GROUP BY shingle
        HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    cov AS (
        SELECT sh2.doc_id,
               unnest(generate_series(start, start + {_RDS_K - 1})) AS pos
        FROM sh2 JOIN freq USING (shingle)
    ),
    covd AS (SELECT DISTINCT doc_id, pos FROM cov),
    wpu AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(ow)),
                   j -> struct_pack(p := j, wd := ow[j]))) AS pw
        FROM w
    ),
    wp AS (SELECT doc_id, pw.p AS p, pw.wd AS wd FROM wpu),
    kept AS (
        SELECT wp.doc_id, wp.p, wp.wd
        FROM wp LEFT JOIN covd ON wp.doc_id = covd.doc_id AND wp.p = covd.pos
        WHERE covd.pos IS NULL
    ),
    ka AS (
        SELECT doc_id, COUNT(*) AS n_kept,
               string_agg(wd, ' ' ORDER BY p) AS cleaned
        FROM kept GROUP BY doc_id
    ),
    cleaned AS (
        SELECT w.doc_id, CAST(len(ow) AS BIGINT) AS n_words,
               CAST(len(ow) - COALESCE(n_kept, 0) AS BIGINT) AS n_removed,
               COALESCE(ka.cleaned, '') AS cleaned_text
        FROM w LEFT JOIN ka USING (doc_id)
    )"""


@query(
    "remove_dup_passages",
    f"""
    WITH {_RDS_CTES}
    SELECT doc_id, n_words, n_removed, cleaned_text FROM cleaned
    """,
)
def remove_dup_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import remove_dup_spans

    docs = t(spark, sf_dir, "documents")
    return remove_dup_spans(docs, "doc_id", "text", k=_RDS_K, min_df=2)


# ---------------------------------------------------------------------------
# PageRank centrality over the near-dup similarity graph — which
# documents sit at the CENTER of boilerplate clusters (the natural
# "canonical representative" signal for keep-one dedup, complementing
# near_dup_keep_docs' min-id rule). Same edge set as
# near_dup_components; 5 damped iterations; per-edge contributions
# quantized to int64 so the SQL twin (which re-runs all 5 iterations in
# chained MATERIALIZED CTEs) must reproduce every rank bit-for-bit.
# The double literals are subtracted/multiplied as DOUBLEs in SQL —
# DuckDB would otherwise fold (1.0 - 0.85) in exact DECIMAL and land
# one ulp away from Python's 1.0 - 0.85.
# ---------------------------------------------------------------------------
_PR_ITERS = 5
_PR_PAIRS = (
    _SHINGLES_CTE.format(table="documents")
    + ", "
    + _CAPPED_PAIRS.format(cap=DEFAULT_MAX_DOC_FREQ)
    + """,
    edges AS MATERIALIZED (
        SELECT id_a AS s, id_b AS d FROM pairs
        UNION
        SELECT id_b AS s, id_a AS d FROM pairs
    ),
    deg AS MATERIALIZED (SELECT s, COUNT(*) AS deg FROM edges GROUP BY s),
    ed AS MATERIALIZED (SELECT e.s, e.d, deg.deg FROM edges e JOIN deg USING (s)),
    nn AS MATERIALIZED (SELECT COUNT(DISTINCT s) AS n FROM edges),
    r0 AS MATERIALIZED (SELECT DISTINCT s AS node, 1.0 / (SELECT n FROM nn) AS r FROM edges)
"""
)


def _pr_iter_ctes() -> str:
    out = []
    for it in range(_PR_ITERS):
        out.append(
            f"""c{it} AS MATERIALIZED (
        SELECT ed.d AS node,
               SUM(CAST(floor(r.r / ed.deg * 1000000000000.0 + 0.5)
                        AS BIGINT)) AS sq
        FROM ed JOIN r{it} r ON ed.s = r.node GROUP BY ed.d
    )"""
        )
        out.append(
            f"""r{it + 1} AS MATERIALIZED (
        SELECT node,
               (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
               + CAST(0.85 AS DOUBLE) * (sq / 1000000000000.0) AS r
        FROM c{it}, nn
    )"""
        )
    return ",\n    ".join(out)


@query(
    "pagerank_near_dup",
    "WITH "
    + _PR_PAIRS
    + ",\n    "
    + _pr_iter_ctes()
    + f"""
    SELECT node AS doc_id, round(r, 9) AS rank FROM r{_PR_ITERS}
    """,
)
def pagerank_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.components import pagerank

    pairs = _near_dup_pairs(spark, sf_dir)
    pr = pagerank(pairs, "id_a", "id_b", iters=_PR_ITERS, damping=0.85)
    return pr.select(
        F.col("node").alias("doc_id"), F.round(F.col("rank"), 9).alias("rank")
    )


# ---------------------------------------------------------------------------
# curate_corpus_v2 — the MODERN LLM-data pipeline end-to-end, composing
# this round's operators in one plan: (1) span-level boilerplate
# REWRITE (remove_dup_spans), (2) viability gate on the cleaned length,
# (3) DSIR target-domain selection with models built on the viable
# cleaned corpus, (4) exact fingerprint dedup of the cleaned text,
# (5) deterministic 90/5/5 split. Where curate_corpus (v1) gates and
# drops whole documents, v2 first REPAIRS documents by cutting
# duplicated passages, then selects by distributional match instead of
# a hard rule. Every stage shuffles on a key (shingle, bucket, id, fp)
# — no pair joins anywhere. The oracle replays the full five-stage
# pipeline from scratch.
# ---------------------------------------------------------------------------
_V2_MIN_TOKENS = 10
_V2_B = 64


@query(
    "curate_corpus_v2",
    f"""
    WITH {_RDS_CTES},
    lbl AS (
        SELECT c.doc_id, c.n_removed, c.n_words, c.cleaned_text,
               d.lang = 'en' AS is_en
        FROM cleaned c JOIN documents d USING (doc_id)
        WHERE c.n_words - c.n_removed >= {_V2_MIN_TOKENS}
    ),
    tok AS (
        SELECT doc_id, is_en,
               unnest(list_filter(
                   string_split_regex(trim(lower(cleaned_text)), '\\s+'),
                   x -> x <> '')) AS wd
        FROM lbl
    ),
    b AS (
        SELECT doc_id, is_en,
               CAST(('0x' || substr(md5(wd), 1, 4)) AS INTEGER) % {_V2_B}
                   AS bucket
        FROM tok
    ),
    dim AS (
        SELECT bucket, COUNT(*) AS raw_c,
               COUNT(CASE WHEN is_en THEN 1 END) AS tgt_c
        FROM b GROUP BY bucket
    ),
    tot AS (SELECT SUM(raw_c) AS r, SUM(tgt_c) AS tt FROM dim),
    lr AS (
        SELECT bucket,
               ln((tgt_c + 1.0) / (tt + {_V2_B}.0))
             - ln((raw_c + 1.0) / (r + {_V2_B}.0)) AS lr
        FROM dim, tot
    ),
    per AS (
        SELECT doc_id, COUNT(*) AS n_tokens_clean, SUM(lr) AS s
        FROM b JOIN lr USING (bucket) GROUP BY doc_id
    ),
    sel AS (
        SELECT l.doc_id, l.n_removed,
               COALESCE(p.n_tokens_clean, 0) AS n_tokens_clean,
               COALESCE(p.s, 0.0) AS s, l.cleaned_text
        FROM lbl l LEFT JOIN per p USING (doc_id)
        WHERE COALESCE(p.s, 0.0) >= 0
    ),
    dd AS (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY md5(trim(regexp_replace(
                       lower(cleaned_text), '[^a-z0-9]+', ' ', 'g')))
                   ORDER BY doc_id) AS rn
        FROM sel
    )
    SELECT doc_id, n_removed,
           CAST(n_tokens_clean AS BIGINT) AS n_tokens_clean,
           ROUND(s, 5) AS log_w,
           CASE WHEN substr(md5('cur2' || CAST(doc_id AS VARCHAR)), 1, 4) < 'e666' THEN 'train'
                WHEN substr(md5('cur2' || CAST(doc_id AS VARCHAR)), 1, 4) < 'f333' THEN 'val'
                ELSE 'test' END AS split
    FROM dd WHERE rn = 1
    """,
)
def curate_corpus_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import fingerprint
    from ..operators.dedup import exact_dedup, remove_dup_spans
    from ..operators.mixture import dsir_log_weights
    from ..operators.splits import hash_split_expr

    docs = t(spark, sf_dir, "documents")
    cleaned = remove_dup_spans(docs, "doc_id", "text", k=_RDS_K, min_df=2)
    # Materialize stage 1 ONCE: lbl is referenced by the DSIR token
    # stream, the DSIR join-back base, and the selection join — without
    # this, each reference replays the whole span-removal subtree (the
    # un-persisted plan scanned the text column 20x). The returned plan
    # still reads the cache, so an in-function unpersist is impossible;
    # swap_cache releases the PREVIOUS invocation's entry instead,
    # bounding the session to one live copy (ADVICE r5 leak fix — an
    # eager localCheckpoint was tried and doubled the query's wall time
    # from the synchronous serialize). At 100 TB the same boundary is a
    # real checkpoint: write the cleaned corpus to parquet between
    # stages.
    from .registry import swap_cache

    lbl = swap_cache(
        "curate_corpus_v2.lbl",
        sf_dir,
        cleaned.join(
            docs.select("doc_id", (F.col("lang") == "en").alias("is_en")),
            "doc_id",
        ).filter((F.col("n_words") - F.col("n_removed")) >= _V2_MIN_TOKENS),
    )
    w = dsir_log_weights(lbl, "doc_id", "cleaned_text", "is_en", buckets=_V2_B)
    sel = (
        lbl.join(
            w.select(
                "doc_id",
                F.col("n_tokens").alias("n_tokens_clean"),
                "log_w",
            ),
            "doc_id",
        )
        .filter(F.col("log_w") >= 0)
        .withColumn("fp", fingerprint(F.col("cleaned_text")))
    )
    dd = exact_dedup(sel, ["fp"], order_col="doc_id")
    return dd.select(
        "doc_id",
        "n_removed",
        "n_tokens_clean",
        F.round("log_w", 5).alias("log_w"),
        hash_split_expr(
            F.col("doc_id"),
            {"train": 0.9, "val": 0.05, "test": 0.05},
            salt="cur2",
        ),
    )


# ---------------------------------------------------------------------------
# Entity resolution end-to-end: FastSS deletion-neighborhood blocking
# (fuzzy_pairs) -> connected components over the distance<=1 match graph
# -> canonical id per cluster (min member id). Every supplier appears in
# the output: matched rows map to their cluster's canonical id,
# singletons to themselves. The oracle rebuilds the variant blocking,
# the exact levenshtein verify, and the transitive closure (recursive
# CTE) from scratch — the same construction near_dup_components proved
# out for jaccard edges, here over the edit-distance graph.
# ---------------------------------------------------------------------------
@query(
    "entity_resolution_suppliers",
    """
    WITH RECURSIVE v AS (
        SELECT s_suppkey AS id, s_name AS nm,
               CASE WHEN d.i = 0 THEN s_name
                    ELSE substr(s_name, 1, d.i - 1) || substr(s_name, d.i + 1)
               END AS variant
        FROM supplier
        CROSS JOIN (SELECT unnest(generate_series(0, 40)) AS i) d
        WHERE d.i <= len(s_name)
    ),
    pairs AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM v a JOIN v b ON a.variant = b.variant AND a.id < b.id
        WHERE levenshtein(a.nm, b.nm) <= 1
    ),
    edges AS (
        SELECT id_a AS s, id_b AS d FROM pairs
        UNION
        SELECT id_b AS s, id_a AS d FROM pairs
    ),
    nodes AS (SELECT DISTINCT s AS n FROM edges),
    reach(n, r) AS (
        SELECT n, n FROM nodes
        UNION
        SELECT reach.n, e.d FROM reach JOIN edges e ON reach.r = e.s
    ),
    comp AS (SELECT n AS id, MIN(r) AS canonical FROM reach GROUP BY n),
    sized AS (
        SELECT canonical, COUNT(*) AS cluster_size FROM comp GROUP BY canonical
    )
    SELECT sup.s_suppkey,
           COALESCE(comp.canonical, sup.s_suppkey) AS canonical_id,
           CAST(COALESCE(sized.cluster_size, 1) AS BIGINT) AS cluster_size
    FROM supplier sup
    LEFT JOIN comp ON sup.s_suppkey = comp.id
    LEFT JOIN sized ON comp.canonical = sized.canonical
    """,
)
def entity_resolution_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.components import connected_components
    from ..operators.dedup import fuzzy_pairs

    supp = t(spark, sf_dir, "supplier")
    pairs = fuzzy_pairs(supp, "s_suppkey", "s_name")
    comp = connected_components(pairs, "id_a", "id_b")
    sized = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    mapping = comp.join(sized, "component")
    return (
        supp.select("s_suppkey")
        .join(mapping, supp["s_suppkey"] == mapping["node"], "left")
        .select(
            "s_suppkey",
            F.coalesce(F.col("component"), F.col("s_suppkey")).alias(
                "canonical_id"
            ),
            F.coalesce(F.col("cluster_size"), F.lit(1))
            .cast("long")
            .alias("cluster_size"),
        )
    )


# ---------------------------------------------------------------------------
# Graph cohesion of the near-dup graph — triangle / wedge census and the
# global clustering coefficient. High clustering says collisions are
# genuine dup CLUSTERS (boilerplate families); low clustering with many
# edges says the threshold is admitting chains of weak pairwise matches
# — the metric that tells you whether transitive-closure dedup
# (near_dup_components) is safe or will over-merge. The Spark side
# counts triangles with degree-ordered orientation (out-degree bounded
# by O(sqrt m), hub-safe — operators.components.triangle_stats); the
# oracle counts them by the direct a<b<c three-way join. Both see the
# same capped pair set.
# ---------------------------------------------------------------------------
@query(
    "triangle_count_near_dup",
    "WITH "
    + _SHINGLES_CTE.format(table="documents")
    + ", "
    + _CAPPED_PAIRS.format(cap=DEFAULT_MAX_DOC_FREQ)
    + """,
    tri AS (
        SELECT COUNT(*) AS c
        FROM pairs e1
        JOIN pairs e2 ON e2.id_a = e1.id_b
        JOIN pairs e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b
    ),
    sym AS (
        SELECT id_a AS n FROM pairs UNION ALL SELECT id_b FROM pairs
    ),
    deg AS (SELECT n, COUNT(*) AS deg FROM sym GROUP BY n),
    ns AS (
        SELECT COUNT(*) AS n_nodes,
               CAST(SUM(deg * (deg - 1) / 2) AS BIGINT) AS n_wedges
        FROM deg
    ),
    es AS (SELECT COUNT(*) AS n_edges FROM pairs)
    SELECT ns.n_nodes, es.n_edges, tri.c AS n_triangles, ns.n_wedges,
           CASE WHEN ns.n_wedges = 0 THEN 0.0
                ELSE floor(3.0 * tri.c / ns.n_wedges * 1000000.0 + 0.5)
                     / 1000000.0 END AS clustering_coeff
    FROM tri, ns, es
    """,
)
def triangle_count_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.components import triangle_stats

    pairs = _near_dup_pairs(spark, sf_dir)
    return triangle_stats(pairs, "id_a", "id_b")


# ---------------------------------------------------------------------------
# Shingle CONTAINMENT pairs — the excerpt/quote detector Jaccard
# structurally misses (a perfect 40-word excerpt of a 400-word page has
# Jaccard ~0.1 but containment 1.0). Deterministic excerpts are
# injected (docs with doc_id % 7 == 0 re-appear under id+2e6 truncated
# to their first max(5, 2n/5) words) so the directed small→big pair
# path is demonstrably exercised. Same single-shuffle shingle self-join
# + stop-shingle cap as jaccard_pairs (operators.dedup.containment_
# pairs); the oracle rebuilds the excerpt corpus and scores every kept
# pair by list intersection.
# ---------------------------------------------------------------------------
_CONTAIN_T = 0.9
_EXC_WORDS = (
    "list_slice(string_split_regex(trim(text), '\\s+'), 1, "
    "greatest(5, CAST(floor(len(string_split_regex(trim(text), '\\s+'))"
    " * 2.0 / 5.0) AS BIGINT)))"
)


@query(
    "containment_pairs_docs",
    f"""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 2000000 AS doc_id,
               array_to_string({_EXC_WORDS}, ' ') AS text
        FROM documents WHERE doc_id % 7 = 0
    ),
    """
    + _SHINGLES_CTE.format(table="corpus")
    + f""",
    ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
    dfq AS (SELECT shingle, COUNT(*) AS dfreq FROM ex GROUP BY shingle),
    kept AS (
        SELECT e.doc_id, list(e.shingle) AS s
        FROM ex e JOIN dfq USING (shingle)
        WHERE dfq.dfreq <= {DEFAULT_MAX_DOC_FREQ}
        GROUP BY e.doc_id
    ),
    scored AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               len(a.s) AS sa, len(b.s) AS sb,
               len(list_intersect(a.s, b.s))
                   / CAST(least(len(a.s), len(b.s)) AS DOUBLE) AS c
        FROM kept a JOIN kept b ON a.doc_id < b.doc_id
    )
    SELECT CASE WHEN sa < sb OR (sa = sb AND id_a < id_b)
                THEN id_a ELSE id_b END AS id_small,
           CASE WHEN sa < sb OR (sa = sb AND id_a < id_b)
                THEN id_b ELSE id_a END AS id_big,
           floor(c * 100000.0 + 0.5) / 100000.0 AS containment
    FROM scored WHERE c >= {_CONTAIN_T}
    """,
)
def containment_pairs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import containment_pairs

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    w = F.split(F.trim(F.col("text")), r"\s+")
    k = F.greatest(
        F.lit(5), F.floor(F.size(w) * 2.0 / 5.0).cast("int")
    )
    excerpts = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.array_join(F.slice(w, F.lit(1), k), " ").alias("text"),
    )
    corpus = docs.unionByName(excerpts)
    pairs = containment_pairs(
        corpus, "doc_id", "text", threshold=_CONTAIN_T, shingle_k=3
    )
    return pairs.select(
        "id_small",
        "id_big",
        (F.floor(F.col("containment") * 100000.0 + 0.5) / 100000.0).alias(
            "containment"
        ),
    )


# ---------------------------------------------------------------------------
# k-core decomposition of the near-dup graph — the "dense boilerplate
# cluster" detector: a 2-core keeps only documents that sit in cycles/
# cliques of near-duplication (chains and isolated pairs peel away).
# Shares the cached near-dup edge list with the other graph queries.
# The oracle replays every peel round in MATERIALIZED CTEs — a
# structurally different formulation that must land on the same
# surviving subgraph and degrees.
# ---------------------------------------------------------------------------
_KCORE_K = 2
_KCORE_ROUNDS = 6


def _kcore_rounds_sql(rounds: int, k: int) -> str:
    parts = [
        """
    edges0 AS MATERIALIZED (
        SELECT id_a AS s, id_b AS d FROM pairs
        UNION
        SELECT id_b AS s, id_a AS d FROM pairs
    )"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""
    keep{r} AS MATERIALIZED (
        SELECT s FROM (
            SELECT s, COUNT(*) AS deg FROM edges{r - 1} GROUP BY s
        ) WHERE deg >= {k}
    ),
    edges{r} AS MATERIALIZED (
        SELECT e.s, e.d FROM edges{r - 1} e
        JOIN keep{r} a ON e.s = a.s
        JOIN keep{r} b ON e.d = b.s
    )"""
        )
    return ",".join(parts)


@query(
    "kcore_near_dup",
    "WITH "
    + _SHINGLES_CTE.format(table="documents")
    + ", "
    + _CAPPED_PAIRS.format(cap=DEFAULT_MAX_DOC_FREQ)
    + ","
    + _kcore_rounds_sql(_KCORE_ROUNDS, _KCORE_K)
    + f"""
    SELECT s AS doc_id, CAST(COUNT(*) AS BIGINT) AS degree
    FROM edges{_KCORE_ROUNDS} GROUP BY s
    """,
)
def kcore_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.components import kcore

    pairs = _near_dup_pairs(spark, sf_dir)
    return kcore(
        pairs, "id_a", "id_b", k=_KCORE_K, rounds=_KCORE_ROUNDS
    ).select(F.col("node").alias("doc_id"), "degree")


# ---------------------------------------------------------------------------
# Multi-source BFS distances over the near-dup graph — "how many hops
# of near-duplication separate a document from a known-bad seed set"
# (the contamination-radius question). Seeds are the graph vertices
# with doc_id % 10 == 0; exploration is a fixed 6 hops so the oracle's
# recursive walk replays the same bounded radius. Shares the cached
# edge list with the other five graph queries.
# ---------------------------------------------------------------------------
_BFS_ROUNDS = 6


@query(
    "bfs_hops_near_dup",
    "WITH RECURSIVE "
    + _SHINGLES_CTE.format(table="documents")
    + ", "
    + _CAPPED_PAIRS.format(cap=DEFAULT_MAX_DOC_FREQ)
    + f""",
    edges AS (
        SELECT id_a AS s, id_b AS d FROM pairs
        UNION
        SELECT id_b AS s, id_a AS d FROM pairs
    ),
    nodes AS (SELECT DISTINCT s AS n FROM edges),
    seeds AS (SELECT n FROM nodes WHERE n % 10 = 0),
    walk(n, dist) AS (
        SELECT n, 0 FROM seeds
        UNION
        SELECT e.d, walk.dist + 1
        FROM walk JOIN edges e ON e.s = walk.n
        WHERE walk.dist < {_BFS_ROUNDS}
    )
    SELECT n AS doc_id, CAST(MIN(dist) AS BIGINT) AS hops
    FROM walk GROUP BY n
    """,
)
def bfs_hops_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.components import bfs_distances

    pairs = _near_dup_pairs(spark, sf_dir)
    nodes = (
        pairs.select(F.col("id_a").alias("n"))
        .unionAll(pairs.select(F.col("id_b").alias("n")))
        .distinct()
    )
    seeds = nodes.filter(F.col("n") % 10 == 0)
    return bfs_distances(
        pairs, seeds, "id_a", "id_b", rounds=_BFS_ROUNDS
    ).select(
        F.col("node").alias("doc_id"),
        F.col("dist").cast("long").alias("hops"),
    )


# ---------------------------------------------------------------------------
# Dedup-quality evaluation — recall and precision of the banded-LSH
# CANDIDATE stage against exact ground truth, as a query: n_true (exact
# Jaccard >= T pairs, capped construction), n_cand (raw band
# collisions, before verification), n_hit (their intersection), and
# the derived recall/precision. This is the QA report every LSH
# deployment owes its users: verification makes final precision 1.0 by
# construction, so the numbers that matter are candidate recall (what
# the banding can ever find) and candidate precision (how much exact
# verification work the collisions buy). All ratios of exact BIGINTs.
# ---------------------------------------------------------------------------
@query(
    "dedup_recall_eval",
    "WITH "
    + _SHINGLES_CTE.format(table="documents")
    + ", "
    + _SIG_CTE
    + f"""
    , keyed AS (SELECT doc_id, {_BAND_KEYS} FROM sig),
    banded AS ({_BAND_UNION}),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM banded a JOIN banded b
          ON a.band_idx = b.band_idx AND a.band_key = b.band_key
        WHERE a.doc_id < b.doc_id
    ),
    ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
    dfq AS (SELECT shingle, COUNT(*) AS dfreq FROM ex GROUP BY shingle),
    kept AS (
        SELECT e.doc_id, list(e.shingle) AS s
        FROM ex e JOIN dfq USING (shingle)
        WHERE dfq.dfreq <= {DEFAULT_MAX_DOC_FREQ}
        GROUP BY e.doc_id
    ),
    truth AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM kept a JOIN kept b ON a.doc_id < b.doc_id
        WHERE len(list_intersect(a.s, b.s))
              / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
              >= {JACCARD_T}
    ),
    hit AS (
        SELECT COUNT(*) AS n FROM cand
        WHERE EXISTS (SELECT 1 FROM truth t
                      WHERE t.id_a = cand.id_a AND t.id_b = cand.id_b)
    )
    SELECT (SELECT COUNT(*) FROM truth) AS n_true,
           (SELECT COUNT(*) FROM cand) AS n_cand,
           hit.n AS n_hit,
           ROUND(CASE WHEN (SELECT COUNT(*) FROM truth) = 0 THEN 0.0
                 ELSE hit.n * 1.0 / (SELECT COUNT(*) FROM truth) END, 6)
               AS cand_recall,
           ROUND(CASE WHEN (SELECT COUNT(*) FROM cand) = 0 THEN 0.0
                 ELSE hit.n * 1.0 / (SELECT COUNT(*) FROM cand) END, 6)
               AS cand_precision
    FROM hit
    """,
)
def dedup_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import minhash_lsh_candidates

    docs = t(spark, sf_dir, "documents")
    truth = _jaccard_pairs_08(spark, sf_dir).select("id_a", "id_b")
    cand = minhash_lsh_candidates(
        docs, "doc_id", "text", num_perm=NUM_PERM, bands=BANDS, shingle_k=3
    ).select("id_a", "id_b")
    # ONE pass over the candidates computes n_cand AND n_hit: a left join
    # against the (unique-by-construction, swap_cached) truth pairs with
    # a presence flag replaces the old n_cand aggregate + hit semi-join
    # pair, each of which re-ran the full MinHash LSH candidate
    # generation (shingle + signature + band join).
    flagged = cand.join(
        truth.withColumn("__t", F.lit(1)), ["id_a", "id_b"], "left"
    )
    counts = flagged.agg(
        F.count(F.lit(1)).alias("n_cand"),
        F.count(F.col("__t")).alias("n_hit"),
    )
    n_true = truth.agg(F.count(F.lit(1)).alias("n_true"))
    return (
        n_true.join(counts)
        .select(
            "n_true",
            "n_cand",
            "n_hit",
            F.round(
                F.when(F.col("n_true") == 0, 0.0).otherwise(
                    F.col("n_hit") * 1.0 / F.col("n_true")
                ),
                6,
            ).alias("cand_recall"),
            F.round(
                F.when(F.col("n_cand") == 0, 0.0).otherwise(
                    F.col("n_hit") * 1.0 / F.col("n_cand")
                ),
                6,
            ).alias("cand_precision"),
        )
    )


# ---------------------------------------------------------------------------
# PPJoin-style prefix-filter exact Jaccard (3-word shingles, tau = 3/5;
# a LOWER bar than jaccard_pairs' 0.8, so this surfaces pairs the
# stop-shingle-capped self-join family is blind to). The
# oracle is deliberately NOT a mirror of the prefix logic — it is the
# brute-force all-pairs DEFINITION (list_intersect over the full word
# sets), so the driver check proves the prefix filter's completeness
# claim cross-engine instead of replicating a shared bug (the ADVICE-r6
# lesson from geo_nearest_city's mirrored cell join). Spark runs the
# scale path: global rarity order, prefix-prefix candidate join,
# verify-on-candidates; DuckDB runs the quadratic definition, feasible
# only at oracle scale.
# ---------------------------------------------------------------------------
@query(
    "prefix_jaccard_pairs",
    "WITH "
    + _SHINGLES_CTE.format(table="documents")
    + """,
    tok AS (
        SELECT doc_id, s, len(s) AS sz FROM sh
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS inter,
           CAST(a.sz + b.sz - len(list_intersect(a.s, b.s)) AS BIGINT)
               AS union_size,
           ROUND(len(list_intersect(a.s, b.s)) * 1.0
                 / (a.sz + b.sz - len(list_intersect(a.s, b.s))), 5)
               AS jaccard
    FROM tok a JOIN tok b ON a.doc_id < b.doc_id
    WHERE 5 * len(list_intersect(a.s, b.s))
          >= 3 * (a.sz + b.sz - len(list_intersect(a.s, b.s)))
    """,
)
def prefix_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import shingle_sets
    from .registry import swap_cache

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    # one explode for the four token-relation consumers
    toks = swap_cache(
        "dedup.word3_shingle_sets",
        sf_dir,
        shingle_sets(docs, "doc_id", "text", 3),
    )
    return prefix_filter_jaccard(
        docs,
        "doc_id",
        "text",
        t_num=3,
        t_den=5,
        shingle_k=3,
        tokens=toks,
        materialize=lambda name, frame: swap_cache(
            f"dedup.prefix_jaccard.{name}", sf_dir, frame
        ),
    ).select(
        "id_a",
        "id_b",
        F.col("inter").cast("long").alias("inter"),
        "union_size",
        "jaccard",
    )
