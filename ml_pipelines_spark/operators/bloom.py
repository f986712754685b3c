"""Bloom-filter semi-join pruning — drop big-side rows before the shuffle.

A semi-join (``TrainDatasets.py:289-294`` restricts annotations to the
image names of selected projects — SURVEY.md §2.3 J2) shuffles the ENTIRE
big side even when only a sliver of it matches: the join can't discard a
row until both sides meet post-exchange. At 100 TB the shuffle of
never-to-match rows dominates the job.

A Bloom filter of the key side fixes the order of operations: build a
bit array from the (small) key side, ship it to the scan of the big side,
and filter rows BEFORE the exchange. No false negatives, so

    bloom_prune(big, keys) ⋉ keys  ==  big ⋉ keys

row-for-row; the bloom stage only shrinks the shuffle (by 1 - fpp of the
non-matching fraction). Spark's own runtime bloom filter
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) does this
opportunistically inside one query; this operator makes it an explicit,
reusable artifact — the same filter words can prune many queries against
the same key set (the 100 TB pattern: build once per dimension snapshot,
prune every fact scan of the day).

Everything is built-in expressions — ``xxhash64`` double hashing on the
build AND probe side, ``bit_or`` aggregation into 64-bit words, a single
array<long> literal probed with ``element_at`` — JVM-side, codegen'd,
no Python in either path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ~10 bits/key with 7 hashes gives fpp ≈ 0.8%; callers size via
# bits_per_key, auto-rounded to a power of two so pmod is cheap.
_BITS_PER_KEY = 10
_MIN_BITS = 1 << 10
_MAX_BITS = 1 << 24  # 2 MiB of words — still a trivial task broadcast


def _positions(cols: list[Column], i: Column, num_bits: int) -> Column:
    """Bit position i for a key tuple: double hashing (Kirsch-
    Mitzenmacher, position_i = h1 + i*h2 mod m — as good as i true
    hashes for Bloom filters). Each hash is reduced mod m BEFORE the
    combine so the arithmetic stays far from int64 overflow (Spark 4
    runs ANSI mode; wrap-around would throw)."""
    m = F.lit(num_bits)
    h1 = F.pmod(F.xxhash64(*cols), m)
    h2 = F.pmod(F.xxhash64(F.lit(0x9E3779B9), *cols), m)
    return F.pmod(h1 + i * h2, m)


def build_bloom(
    keys: DataFrame,
    on: list[str],
    num_bits: int | None = None,
    num_hashes: int = 7,
    expected_keys: int | None = None,
) -> list[int]:
    """Build the filter: a dense ``list[int64]`` of ``num_bits/64`` words.

    One distributed aggregation over the key side (explode k positions →
    ``bit_or`` per word), one driver collect of at most ``num_bits/64``
    rows (bytes, not data). The returned words are engine-portable state:
    embed them in any number of subsequent ``bloom_prune`` calls, or
    persist them next to a dimension snapshot.
    """
    cols = [F.col(c) for c in on]
    if num_bits is None:
        n = expected_keys if expected_keys is not None else keys.count()
        bits = _MIN_BITS
        while bits < n * _BITS_PER_KEY and bits < _MAX_BITS:
            bits <<= 1
        num_bits = bits
    if num_bits & (num_bits - 1):
        raise ValueError("num_bits must be a power of two")

    pos = _positions(cols, F.col("__i"), num_bits)
    rows = (
        keys.select(
            *cols,
            F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("__i"),
        )
        .select(
            (pos / 64).cast("int").alias("__w"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), F.pmod(pos, F.lit(64)).cast("int")
            ).alias("__m"),
        )
        .groupBy("__w")
        .agg(F.bit_or("__m").alias("__bits"))
        .collect()
    )
    words = [0] * (num_bits // 64)
    for r in rows:
        words[r["__w"]] = r["__bits"]
    return words


def bloom_might_contain(
    words: list[int], on: list[str], num_hashes: int = 7
) -> Column:
    """Membership-test predicate over the key columns — pure expression,
    pushable anywhere (including before a shuffle or into a scan filter
    stage)."""
    num_bits = len(words) * 64
    lit_words = F.lit(words)
    cols = [F.col(c) for c in on]
    cond = F.lit(True)
    for i in range(num_hashes):
        pos = _positions(cols, F.lit(i), num_bits)
        word = F.element_at(lit_words, (pos / 64).cast("int") + 1)
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), F.pmod(pos, F.lit(64)).cast("int")
        )
        cond = cond & (word.bitwiseAND(mask) != 0)
    return cond


def bloom_prune(
    big: DataFrame,
    keys: DataFrame,
    on: list[str],
    num_bits: int | None = None,
    num_hashes: int = 7,
) -> DataFrame:
    """Filter ``big`` down to rows that MIGHT match ``keys`` on the
    ``on`` columns (superset of the true matches; fpp-bounded extras)."""
    words = build_bloom(keys, on, num_bits, num_hashes)
    return big.filter(bloom_might_contain(words, on, num_hashes))


def bloom_semi_join(
    big: DataFrame,
    keys: DataFrame,
    on: list[str],
    num_bits: int | None = None,
    num_hashes: int = 7,
) -> DataFrame:
    """``big ⋉ keys`` with the shuffle fed only by bloom survivors.

    The trailing left-semi join removes the false positives, so the
    result is exactly the plain semi-join; the exchange upstream of it
    carries ~match-fraction + fpp of the big side instead of all of it.
    """
    pruned = bloom_prune(big, keys, on, num_bits, num_hashes)
    return pruned.join(keys.select(on).dropDuplicates(on), on, "left_semi")
