"""Text analysis for training-data pipelines — tokenization, quality
scoring, language ID, fingerprinting.

These are first-class components of the 100 TB engine (BASELINE.json
north star): everything here is built-in `pyspark.sql.functions`
expressions — JVM-side, whole-stage-codegen, no Python in the hot path.
The reference's precedent for token columns is the `bow` OCR
bag-of-words column (TrainDatasets.py:465,478).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Whitespace tokenizer — the canonical split for token counting.
TOKEN_SPLIT_RE = r"\s+"

# BPE-ish word/piece tokenizer: runs of letters, runs of digits, or a
# single non-space symbol — approximates subword pre-tokenization (the
# GPT-2 pre-tokenizer's word/number/symbol classes) without a vocab.
BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Small multilingual stopword marker sets for the language-ID heuristic.
# Public knowledge (most-frequent function words per language).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "fr": ("le", "la", "les", "de", "des", "et", "un", "une", "est", "que"),
    "es": ("el", "la", "los", "las", "de", "y", "un", "una", "es", "que"),
    "de": ("der", "die", "das", "und", "ein", "eine", "ist", "zu", "den", "von"),
    "zh": ("的", "了", "是", "在", "我", "有", "和", "就", "不", "人"),
}

ENGLISH_STOPWORDS = LANG_MARKERS["en"] + (
    "on", "with", "as", "was", "at", "by", "an", "be", "this", "are",
)


def let(value: Column, body) -> Column:
    """Bind ``value`` once as a lambda variable and evaluate ``body`` on it.

    Higher-order-function lambdas re-evaluate every *unbound* subexpression
    they reference on each invocation (Catalyst inlines the subtree; HOFs
    run interpreted, outside codegen CSE). Wrapping the value in a
    single-element array and ``transform``-ing over it makes it a bound
    lambda variable — computed exactly once per row. Turns
    O(perms x shingles) re-evaluation of ``split`` into O(1).
    """
    return F.element_at(F.transform(F.array(value), body), 1)


def tokens(text: Column) -> Column:
    """Whitespace tokens."""
    return F.split(text, TOKEN_SPLIT_RE)


def token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank strings)."""
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(text), TOKEN_SPLIT_RE))
    )


def bpe_ish_token_count(text: Column) -> Column:
    """Count of BPE-ish pre-tokens (letters runs / digit runs / symbols)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_RE), 0))


def stopword_ratio(text: Column, stopwords: tuple[str, ...] = ENGLISH_STOPWORDS) -> Column:
    """Fraction of whitespace tokens that are stopwords."""
    toks = tokens(F.lower(text))
    sw = F.array(*[F.lit(s) for s in stopwords])
    hits = F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are ASCII punctuation."""
    stripped = F.regexp_replace(text, r"[!-/:-@\[-`{-~]", "")
    return (F.length(text) - F.length(stripped)) / F.greatest(
        F.length(text), F.lit(1)
    )


def mean_token_length(text: Column) -> Column:
    """Average whitespace-token length in characters."""
    toks = tokens(F.trim(text))
    total = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    return total / F.greatest(F.size(toks), F.lit(1))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: favors texts that are neither
    tiny nor enormous, mostly non-punctuation, with a sane mean word
    length. Deterministic and SQL-portable (see queries.text oracle)."""
    n = token_count(text)
    len_score = F.least(n / F.lit(64.0), F.lit(1.0))
    punct_score = 1.0 - F.least(punct_ratio(text) * 4.0, F.lit(1.0))
    mwl = mean_token_length(text)
    mwl_score = F.when((mwl >= 2.0) & (mwl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.3))
    return (len_score * 0.4 + punct_score * 0.3 + mwl_score * 0.3).alias(
        "quality_score"
    )


def lang_marker_hits(text: Column, lang: str) -> Column:
    """Count of tokens that are marker stopwords for ``lang``."""
    toks = tokens(F.lower(text))
    markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
    return F.size(F.filter(toks, lambda x: F.array_contains(markers, x)))


def lang_id(text: Column) -> Column:
    """Heuristic language ID: argmax of marker-stopword hit counts, 'und'
    when nothing matches. Ties break by fixed language order (en first),
    matching the SQL oracle's CASE evaluation order."""
    langs = list(LANG_MARKERS)
    hit_cols = {lang: lang_marker_hits(text, lang) for lang in langs}
    best = F.greatest(*hit_cols.values())
    expr = F.when(best == 0, F.lit("und"))
    for lang in langs:
        expr = expr.when(hit_cols[lang] == best, F.lit(lang))
    return expr


def normalize_for_fingerprint(text: Column) -> Column:
    """Canonical form for content fingerprinting: lowercase, strip
    non-alphanumerics to spaces, collapse whitespace."""
    lowered = F.lower(text)
    alnum = F.regexp_replace(lowered, r"[^a-z0-9]+", " ")
    return F.trim(alnum)


def fingerprint(text: Column) -> Column:
    """Content fingerprint: md5 of the normalized text. Portable to any
    engine with md5 — used for exact near-normalized dedup."""
    return F.md5(normalize_for_fingerprint(text))


def word_shingles(text: Column, k: int = 3) -> Column:
    """Array of k-word shingles (space-joined) from whitespace tokens.
    Empty array when the text has fewer than k tokens."""

    def shingle(toks: Column) -> Column:
        n = F.size(toks)
        idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(0)))
        return F.when(n < k, F.array().cast("array<string>")).otherwise(
            F.transform(
                idx,
                lambda i: F.concat_ws(
                    " ", *[F.element_at(toks, i + j) for j in range(k)]
                ),
            )
        )

    return let(tokens(F.trim(F.lower(text))), shingle)


def distinct_word_ratio(text: Column) -> Column:
    """Distinct whitespace tokens / total tokens — the inverse repetition
    signal (Gopher-style repetition filters; low ratio = boilerplate or
    keyword-stuffed text)."""
    toks = tokens(F.trim(F.lower(text)))
    return F.size(F.array_distinct(toks)) / F.greatest(F.size(toks), F.lit(1))


def word_bigrams(text: Column) -> Column:
    """Adjacent whitespace-token pairs as 'a b' strings (order
    preserved); empty array below 2 tokens."""
    toks = tokens(F.trim(F.lower(text)))
    return F.when(F.size(toks) < 2, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
        )
    )


# PII scrub patterns — RE2-compatible (no lookaround), so the SAME
# pattern strings run in Spark (Java regex) and any RE2-based oracle.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b"
PII_PHONE_RE = r"\+?[0-9]{1,3}[- ][0-9]{3,4}[- ][0-9]{3,4}\b"


def pii_redact(text: Column) -> Column:
    """Replace emails, IPv4 addresses, then phone-shaped numbers with
    typed placeholders. Order matters: IPs are redacted before the
    phone pass so dotted quads can't half-match the phone pattern."""
    out = F.regexp_replace(text, PII_EMAIL_RE, "[EMAIL]")
    out = F.regexp_replace(out, PII_IPV4_RE, "[IP]")
    return F.regexp_replace(out, PII_PHONE_RE, "[PHONE]")


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-category match counts on the ORIGINAL text (audit trail for
    the scrub — what a privacy review samples against)."""
    return {
        "n_emails": F.size(F.regexp_extract_all(text, F.lit(PII_EMAIL_RE), 0)),
        "n_ips": F.size(F.regexp_extract_all(text, F.lit(PII_IPV4_RE), 0)),
        "n_phones": F.size(
            F.regexp_extract_all(
                F.regexp_replace(text, PII_IPV4_RE, "[IP]"), F.lit(PII_PHONE_RE), 0
            )
        ),
    }
