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
reusable artifact — the same filter can prune many queries against the
same key set (the 100 TB pattern: build once per dimension snapshot,
prune every fact scan of the day).

WHEN IT PAYS — the crossover, measured. The build costs one aggregation
over the key side plus a fixed-size bitset collect; that overhead is paid
whether or not it saves anything. At sf0.1 on local[32] the bloom variant
of the revenue semi-join runs ~9× the plain semi-join (2.4 s vs 0.27 s):
the big side's shuffle is far too small for the build to amortize. The
filter wins when (a) the big side's shuffled bytes dominate the job —
rule of thumb: big-side shuffle ≥ 50-100× the key-side aggregation cost,
i.e. fact/dim row ratio in the thousands with a small match fraction —
or (b) the bitset is built ONCE and reused across many probe queries
(then the build amortizes to ~zero and any nonzero pruning is free win).
Do not reach for this at dimension-join scale; Spark's broadcast
semi-join is already optimal there.

Everything is built-in expressions — ``xxhash64`` double hashing on the
build AND probe side, ``bit_or`` aggregation into 64-bit words, and a
probe against a single BINARY literal — JVM-side, no Python in either
path. The bitset is BinaryType on purpose: an array<long> literal of W
words costs W py4j round-trips to construct and W-node expression
subtrees per probe reference (measured: ~4 s of pure client/driver
overhead at 4096 words), while one ``bytes`` literal is a single object
end-to-end; the probe extracts its byte with
``conv(hex(substring(bin, idx, 1)), 16, 10)`` — three cheap builtins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ~10 bits/key with 7 hashes gives fpp ≈ 0.8%.
_BITS_PER_KEY = 10
_MIN_BITS = 1 << 10
_MAX_BITS = 1 << 27  # 16 MiB bitset — still a trivial task broadcast
# With no size hint the filter defaults to 2^20 bits (128 KiB): fpp <1%
# up to ~100k keys with NO extra count job over the key side. Callers
# with bigger key sets pass expected_keys (or num_bits) explicitly.
_DEFAULT_BITS = 1 << 20


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


def _resolve_bits(num_bits: int | None, expected_keys: int | None) -> int:
    if num_bits is None:
        if expected_keys is None:
            return _DEFAULT_BITS
        bits = _MIN_BITS
        while bits < expected_keys * _BITS_PER_KEY and bits < _MAX_BITS:
            bits <<= 1
        return bits
    if num_bits & (num_bits - 1):
        raise ValueError("num_bits must be a power of two")
    return num_bits


def build_bloom(
    keys: DataFrame,
    on: list[str],
    num_bits: int | None = None,
    num_hashes: int = 7,
    expected_keys: int | None = None,
) -> bytes:
    """Build the filter: a ``num_bits/8``-byte bitset.

    One distributed aggregation over the key side (explode k positions →
    ``bit_or`` per 64-bit word), one driver collect of at most
    ``num_bits/64`` rows (bytes, not data). The returned bitset is
    engine-portable state: embed it in any number of subsequent
    ``bloom_prune`` calls, or persist it next to a dimension snapshot.
    """
    cols = [F.col(c) for c in on]
    num_bits = _resolve_bits(num_bits, expected_keys)

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
        words[r["__w"]] = r["__bits"] & 0xFFFFFFFFFFFFFFFF
    # little-endian within each word: bit p lives in byte p//8 at p%8
    out = bytearray(num_bits // 8)
    for w, v in enumerate(words):
        out[w * 8 : w * 8 + 8] = v.to_bytes(8, "little")
    return bytes(out)


def bloom_might_contain(
    filter_bits: bytes, on: list[str], num_hashes: int = 7
) -> Column:
    """Membership-test predicate over the key columns — pure expression,
    pushable anywhere (including before a shuffle or into a scan filter
    stage). ``filter_bits`` rides along as ONE binary literal."""
    num_bits = len(filter_bits) * 8
    lit_bin = F.lit(bytearray(filter_bits))
    cols = [F.col(c) for c in on]
    cond = F.lit(True)
    for i in range(num_hashes):
        pos = _positions(cols, F.lit(i), num_bits)
        byte = F.conv(
            F.hex(F.call_function("substring", lit_bin, (pos / 8).cast("int") + 1, F.lit(1))),
            16,
            10,
        ).cast("int")
        mask = F.call_function(
            "shiftleft", F.lit(1), F.pmod(pos, F.lit(8)).cast("int")
        )
        cond = cond & (byte.bitwiseAND(mask) != 0)
    return cond


def bloom_prune(
    big: DataFrame,
    keys: DataFrame,
    on: list[str],
    num_bits: int | None = None,
    num_hashes: int = 7,
    expected_keys: int | None = None,
) -> DataFrame:
    """Filter ``big`` down to rows that MIGHT match ``keys`` on the
    ``on`` columns (superset of the true matches; fpp-bounded extras)."""
    bits = build_bloom(keys, on, num_bits, num_hashes, expected_keys)
    return big.filter(bloom_might_contain(bits, on, num_hashes))


def bloom_semi_join(
    big: DataFrame,
    keys: DataFrame,
    on: list[str],
    num_bits: int | None = None,
    num_hashes: int = 7,
    expected_keys: int | None = None,
) -> DataFrame:
    """``big ⋉ keys`` with the shuffle fed only by bloom survivors.

    The trailing left-semi join removes the false positives, so the
    result is exactly the plain semi-join; the exchange upstream of it
    carries ~match-fraction + fpp of the big side instead of all of it.
    """
    pruned = bloom_prune(big, keys, on, num_bits, num_hashes, expected_keys)
    return pruned.join(keys.select(on).dropDuplicates(on), on, "left_semi")
