"""Decontamination operator semantics on a hand-built micro-corpus."""

from __future__ import annotations

from ml_pipelines_spark.operators.dedup import (
    contamination_flags,
    decontaminate,
)


def _corpus(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "The Quick, Brown Fox jumps over the lazy dog tonight!"),  # fp-dup of eval 100
            (3, "completely unrelated text about spark shuffles and joins"),
            (4, "alpha beta gamma delta epsilon zeta eta theta"),  # shares 5-gram with eval 101
        ],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog tonight"),
            (101, "prefix words alpha beta gamma delta epsilon trailing"),
        ],
        ["doc_id", "text"],
    )
    return train, ev


def test_contamination_flags(spark):
    train, ev = _corpus(spark)
    flags = {
        r["doc_id"]: (r["contaminated_exact"], r["contaminated_ngram"])
        for r in contamination_flags(train, ev, "doc_id", "text", shingle_k=5).collect()
    }
    # doc 1 is verbatim eval text: both rules fire.
    assert flags[1] == (True, True)
    # doc 2 differs in case/punctuation only: fingerprint fires; its
    # whitespace shingles differ ("Quick," != "quick"), so ngram may not.
    assert flags[2][0] is True
    assert flags[3] == (False, False)
    # doc 4 shares the 5-gram "alpha beta gamma delta epsilon".
    assert flags[4][1] is True


def test_decontaminate_drops_flagged(spark):
    train, ev = _corpus(spark)
    kept = decontaminate(train, ev, "doc_id", "text", shingle_k=5)
    assert sorted(r["doc_id"] for r in kept.collect()) == [3]
    assert set(kept.columns) == {"doc_id", "text"}


# ---------------------------------------------------------------------------
# Skew robustness: the max_doc_freq stop-shingle guard under a
# pathological corpus where one phrase appears in EVERY document.
# ---------------------------------------------------------------------------
def _skewed_corpus(spark, n_docs=200):
    # Every doc shares the same boilerplate (its shingles hit all 200
    # docs — the classic web-corpus footer); each doc also has unique
    # content, except 190/191 which are genuine near-duplicates.
    boiler = "all rights reserved contact us terms of service apply here"
    rows = []
    for i in range(n_docs):
        if i == 191:
            body = f"unique payload {190} alpha beta gamma delta epsilon zeta eta theta"
        else:
            body = f"unique payload {i} alpha beta gamma delta epsilon zeta eta theta"
        rows.append((i, boiler + " " + body))
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_max_doc_freq_bounds_shingle_fanout(spark):
    from pyspark.sql import functions as F

    from ml_pipelines_spark.operators.dedup import shingle_sets

    docs = _skewed_corpus(spark)
    sh = shingle_sets(docs, "doc_id", "text", 3)
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    # the boilerplate shingles really are pathological: present in all docs
    assert freq.agg(F.max("df")).collect()[0][0] == 200
    hot = freq.filter(F.col("df") > 20).select("shingle")
    kept = sh.join(hot, "shingle", "left_anti")
    kept_freq = kept.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    # post-guard, no shingle joins more than max_doc_freq docs, so the
    # worst self-join key fans out <= max_doc_freq^2 pairs, not n_docs^2
    assert kept_freq.agg(F.max("df")).collect()[0][0] <= 20


def test_jaccard_pairs_guard_join_volume_and_recall(spark):
    from pyspark.sql import functions as F

    from ml_pipelines_spark.operators.dedup import jaccard_pairs, shingle_sets

    docs = _skewed_corpus(spark)
    # Unguarded: the all-docs boilerplate makes every doc pair a
    # candidate — O(n^2) intersection rows. Guarded: only genuinely
    # overlapping uniques meet.
    guarded = jaccard_pairs(
        docs, "doc_id", "text", threshold=0.5, shingle_k=3, max_doc_freq=20
    )
    pairs = {(r["id_a"], r["id_b"]) for r in guarded.collect()}
    # the planted near-dup pair survives the guard (their shared
    # payload shingles are rare, so they still intersect)
    assert (190, 191) in pairs
    # and the boilerplate-only pairs are gone
    assert len(pairs) == 1

    # join-volume bound, measured not asserted-by-faith: the intersect
    # join's left input (post-guard shingles) carries no shingle with
    # fanout > max_doc_freq, so the worst key produces <= 20*20 rows.
    sh = shingle_sets(docs, "doc_id", "text", 3)
    hot = (
        sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > 20).select("shingle")
    )
    kept = sh.join(hot, "shingle", "left_anti")
    joined = (
        kept.alias("a").join(kept.alias("b"), "shingle")
        .filter(F.col("a.id") < F.col("b.id"))
    )
    # total pair-rows produced by the guarded join stays linear-ish:
    # for this corpus every unique shingle appears in <= 2 docs
    assert joined.count() <= 2000


def test_jaccard_default_guard_is_finite_and_in_plan(spark):
    # VERDICT r4: the safe default at 100 TB is a FINITE cap. Assert the
    # default itself, that the default call path plants the stop-shingle
    # anti-join in the plan, and that opting out removes it.
    from ml_pipelines_spark.operators.dedup import (
        DEFAULT_MAX_DOC_FREQ,
        jaccard_pairs,
    )

    assert DEFAULT_MAX_DOC_FREQ is not None and DEFAULT_MAX_DOC_FREQ > 0

    docs = _skewed_corpus(spark, n_docs=20)
    default_plan = jaccard_pairs(
        docs, "doc_id", "text", threshold=0.5
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "LeftAnti" in default_plan

    unguarded_plan = jaccard_pairs(
        docs, "doc_id", "text", threshold=0.5, max_doc_freq=None
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "LeftAnti" not in unguarded_plan

    # below the cap the guard is a semantic no-op: results identical
    got = {
        (r["id_a"], r["id_b"])
        for r in jaccard_pairs(docs, "doc_id", "text", threshold=0.5,
                               max_doc_freq=None).collect()
    }
    got_default = {
        (r["id_a"], r["id_b"])
        for r in jaccard_pairs(docs, "doc_id", "text",
                               threshold=0.5).collect()
    }
    assert got == got_default


def test_fuzzy_pairs_recall_and_precision(spark):
    # FastSS guarantee: EVERY pair within levenshtein distance 1 shares
    # a 0/1-deletion variant, so recall is structural, not probabilistic.
    from ml_pipelines_spark.operators.dedup import fuzzy_pairs

    rows = [
        (1, "acme corp"),
        (2, "acme corp"),    # identical        -> dist 0
        (3, "acme  corp"),   # one insertion    -> dist 1 of 1
        (4, "acme cort"),    # one substitution -> dist 1 of 1
        (5, "acme cor"),     # one deletion     -> dist 1 of 1
        (6, "acne cort"),    # dist 2 of 1      -> excluded
        (7, "zzz unrelated"),
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in fuzzy_pairs(df, "id", "name").collect()
    }
    assert got[(1, 2)] == 0
    for b in (3, 4, 5):
        assert got[(1, b)] == 1
        assert got[(2, b)] == 1
    assert (1, 6) not in got
    assert all(7 not in p for p in got)
    # blocking is an equi-join, never a cross product
    plan = fuzzy_pairs(df, "id", "name")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_remove_dup_spans_cuts_shared_passage_only(spark):
    boiler = "subscribe to our newsletter for daily updates and offers"
    docs = spark.createDataFrame(
        [
            (1, f"unique opening words here {boiler} and a unique tail one"),
            (2, f"other document starts differently {boiler} closing words two"),
            (3, "totally original content with no duplicated span at all ok"),
            (4, "short doc"),  # fewer than k words: untouched
            (5, "   "),  # blank: n_words 0, cleaned ''
        ],
        ["doc_id", "text"],
    )
    from ml_pipelines_spark.operators.dedup import remove_dup_spans

    out = {
        r["doc_id"]: r
        for r in remove_dup_spans(docs, "doc_id", "text", k=6, min_df=2).collect()
    }
    # The shared 9-word passage is cut from BOTH docs; unique words survive.
    assert out[1]["cleaned_text"] == "unique opening words here and a unique tail one"
    assert out[2]["cleaned_text"] == "other document starts differently closing words two"
    assert out[1]["n_removed"] == 9 and out[2]["n_removed"] == 9
    # Untouched docs come back verbatim (modulo whitespace collapse).
    assert out[3]["n_removed"] == 0
    assert out[3]["cleaned_text"].startswith("totally original")
    assert out[4] ["n_removed"] == 0 and out[4]["cleaned_text"] == "short doc"
    assert out[5]["n_words"] == 0 and out[5]["cleaned_text"] == ""


def test_remove_dup_spans_case_insensitive_match_keeps_original_case(spark):
    docs = spark.createDataFrame(
        [
            (1, "Alpha Beta Gamma Delta Epsilon Zeta kept words after that"),
            (2, "alpha beta gamma delta epsilon zeta other unique trailing text"),
        ],
        ["doc_id", "text"],
    )
    from ml_pipelines_spark.operators.dedup import remove_dup_spans

    out = {
        r["doc_id"]: r
        for r in remove_dup_spans(docs, "doc_id", "text", k=6, min_df=2).collect()
    }
    # Match is on lowercased shingles; surviving words keep original case.
    assert out[1]["n_removed"] == 6
    assert out[1]["cleaned_text"] == "kept words after that"
    assert out[2]["cleaned_text"] == "other unique trailing text"


def test_repair_then_dedup_collapses_boilerplate_variants(spark):
    """curate_corpus_v2's core property: documents that differ ONLY in
    which boilerplate passage was stamped on them become identical
    after span removal, so fingerprint dedup collapses them — v1-style
    whole-document dedup would have kept both copies."""
    from ml_pipelines_spark.functions.text import fingerprint
    from ml_pipelines_spark.operators.dedup import exact_dedup, remove_dup_spans

    # Cores are SHORTER than k=6 words: a shared core of >= k words
    # would itself be a duplicated span and (correctly) get cut too.
    core = "genuinely unique article body here"
    other = "different piece of content text"
    b1 = "subscribe to our newsletter for daily updates and offers now"
    b2 = "all rights reserved terms of service apply contact us today"
    docs = spark.createDataFrame(
        [
            (1, f"{b1} {core}"),
            (2, f"{b2} {core}"),   # same core, different boilerplate
            (3, f"{b1} {other}"),
            (4, f"{b2} {other}"),
        ],
        ["doc_id", "text"],
    )
    cleaned = remove_dup_spans(docs, "doc_id", "text", k=6, min_df=2)
    out = {r["doc_id"]: r["cleaned_text"] for r in cleaned.collect()}
    assert out[1] == out[2] == core  # both boilerplates cut
    dd = exact_dedup(
        cleaned.withColumn("fp", fingerprint(cleaned["cleaned_text"])),
        ["fp"],
        order_col="doc_id",
    )
    kept = sorted(r["doc_id"] for r in dd.collect())
    assert kept == [1, 3]  # one survivor per repaired-identical pair


# ---------------------------------------------------------------------------
# Prefix-filter exact Jaccard (PPJoin) — completeness vs brute force.
# ---------------------------------------------------------------------------


def _brute_jaccard_pairs(rows, k, t_num, t_den):
    def shingles(text):
        w = text.strip().lower().split()
        return {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}
    sets = {i: shingles(txt) for i, txt in rows}
    out = set()
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            i = len(sets[a] & sets[b])
            u = len(sets[a] | sets[b])
            if u and t_den * i >= t_num * u:
                out.add((a, b))
    return out


import pytest as _pytest


@_pytest.mark.parametrize("seed", [1, 2, 3, 7])
@_pytest.mark.slow  # O(n^2) bruteforce cross-check, 4 seeds (~24s)
def test_prefix_filter_matches_bruteforce(spark, seed):
    # Random docs over a SMALL vocab so pair similarities land on both
    # sides of the threshold; several seeds so no single lucky draw can
    # hide a pruning bug (the ADVICE-r6 grid_nearest lesson).
    import random

    from ml_pipelines_spark.operators.dedup import prefix_filter_jaccard

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    base = [rng.choice(vocab) for _ in range(40)]
    for i in range(60):
        words = list(base)
        # mutate a seed-dependent number of positions — a spectrum of
        # similarities from near-identical to unrelated
        for _ in range(rng.randrange(0, 60)):
            words[rng.randrange(len(words))] = rng.choice(vocab)
        rows.append((i, " ".join(words)))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.id_a, r.id_b)
        for r in prefix_filter_jaccard(
            df, "doc_id", "text", t_num=3, t_den=5, shingle_k=2
        ).collect()
    }
    want = _brute_jaccard_pairs(rows, k=2, t_num=3, t_den=5)
    assert got == want


def test_prefix_filter_exact_boundary_pair_admitted(spark):
    # J exactly 3/5: |A|=|B|=4 two-word shingles, 3 shared, union 5.
    # The integer test 5*3 >= 3*5 must ADMIT it on both the candidate
    # and verify stages (a float tau*s prefix length could round it out).
    from ml_pipelines_spark.operators.dedup import prefix_filter_jaccard

    # Explicit 5-token docs sharing exactly 3 of 4 bigram shingles each:
    # A: a b c d e -> {ab, bc, cd, de}; B: a b c d f -> {ab, bc, cd, df}
    # inter=3, union=5, J=0.6 exactly.
    rows = [(1, "a b c d e"), (2, "a b c d f")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = prefix_filter_jaccard(
        df, "doc_id", "text", t_num=3, t_den=5, shingle_k=2
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.id_a, r.id_b, r.inter, r.union_size) == (1, 2, 3, 5)


def test_prefix_filter_candidate_join_is_prefix_only(spark):
    # The self-join must consume the rank-filtered prefix relation, not
    # the full token table: hot tokens (present in EVERY doc) sort to
    # the rank tail and must not explode the candidate join. Guard: a
    # corpus where all docs share one boilerplate token but are
    # otherwise disjoint yields ZERO candidate pairs surviving to
    # verification (no output), yet the naive all-token join would emit
    # n^2/2 candidates.
    from ml_pipelines_spark.operators.dedup import prefix_filter_jaccard

    rows = [(i, f"boiler u{i}a u{i}b u{i}c u{i}d u{i}e") for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = prefix_filter_jaccard(
        df, "doc_id", "text", t_num=3, t_den=5, shingle_k=1
    )
    assert out.count() == 0
    # and the physical plan carries the row_number prefix gate
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "row_number" in plan


def test_lsh_plan_matches_known_optima():
    from ml_pipelines_spark.operators.dedup import lsh_plan

    # equal weights at tau=0.8 favor precision: (2 bands x 8 rows),
    # midpoint 0.917 (collisions mostly ABOVE the threshold)
    plan = lsh_plan(0.8, 16)
    assert (plan["bands"], plan["rows_per_band"]) == (2, 8)
    assert abs(plan["s_curve_midpoint"] - 0.917) < 0.01
    # a recall-weighted objective (missed near-dups cost more than
    # false candidates, the dedup norm) recovers the (4 x 4) setting
    # minhash_near_dup actually ships with — midpoint 0.707 < tau
    recall_plan = lsh_plan(0.8, 16, fn_weight=5.0)
    assert (recall_plan["bands"], recall_plan["rows_per_band"]) == (4, 4)
    assert abs(recall_plan["s_curve_midpoint"] - 0.7071) < 0.01
    # a LOW threshold prefers many bands of few rows (recall-heavy)...
    low = lsh_plan(0.2, 16)
    assert low["bands"] > low["rows_per_band"]
    # ...and a HIGH threshold the reverse
    high = lsh_plan(0.95, 16)
    assert high["rows_per_band"] >= high["bands"]
    # fp/fn weighting shifts the factorization toward precision
    precise = lsh_plan(0.5, 16, fp_weight=10.0)
    recall = lsh_plan(0.5, 16, fn_weight=10.0)
    assert precise["rows_per_band"] >= recall["rows_per_band"]


def test_jaccard_truth_pairs_unique_per_pair(spark, sf_dir):
    # ADVICE r12: dedup_recall_eval's flagged LEFT join counts n_cand
    # and n_hit in one pass, which is only correct while the truth set
    # stays unique per (id_a, id_b) — jaccard_pairs aggregates by pair
    # today, but a future change to it (or the swap_cache layer)
    # emitting duplicate or mirrored pairs would silently inflate both
    # counts. Pin the invariant where the join relies on it.
    import pyspark.sql.functions as F

    from ml_pipelines_spark.queries.dedup import _jaccard_pairs_08

    truth = _jaccard_pairs_08(spark, sf_dir)
    dup = (
        truth.groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert dup == 0
    # no mirrored duplicates either: pairs are stored canonically a < b
    mirrored = truth.filter(F.col("id_a") >= F.col("id_b")).count()
    assert mirrored == 0
