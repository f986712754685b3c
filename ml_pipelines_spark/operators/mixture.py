"""Data-mixture operators: domain weighting, epoch repeats, token
budgets, and deterministic training order.

The last mile of a training-data pipeline: after cleaning and dedup, the
corpus is re-weighted across domains (sources) and serialized in a
reproducible order. None of this exists in the reference (its only
sampling surface is the entity split, TrainDatasets.py:235-287); these
are north-star LLM-pipeline components built Spark-first.

Determinism contract: every sampling decision is a pure function of
(salt, entity key) via the md5 hex-bucket idiom shared with
operators.splits — reproducible across engines, runs, cluster sizes,
and data layout, and expressible in plain SQL for oracle checking.
Growing the corpus never flips the decision for an existing row.

Scale notes:
- Per-domain rates/epochs ride in a ``map`` literal (domains are a
  dimension, thousands at most) — no join, the filter is a row-local
  expression evaluated inside the scan.
- ``token_budget_select`` shuffles once on the domain key; the
  cumulative window is per-domain, so parallelism = number of domains.
  For a corpus with few giant domains, pre-aggregate per (domain,
  bucket) if the window partition outgrows an executor.
- ``training_order`` delegates to operators.ids.dense_ids — no
  single-task global window.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .ids import dense_ids
from .splits import _BUCKETS, _HEX_DIGITS, hash_bucket_expr

# Sentinel above every hex digit: bucket < ALWAYS is true for all rows.
_ALWAYS = "z" * _HEX_DIGITS


def _rate_threshold(rate: float) -> str:
    """Sampling rate → hex boundary; rates >= 1 keep everything."""
    if rate >= 1.0:
        return _ALWAYS
    return format(max(0, round(rate * _BUCKETS)), f"0{_HEX_DIGITS}x")


def temperature_weights(counts: dict[str, int], tau: float) -> dict[str, float]:
    """Per-domain sampling rates for temperature-``tau`` mixture
    rebalancing (the multilingual-pretraining scheme: sample domain d
    with probability ∝ share_d^(1/tau)).

    Returns keep-rates normalized so the most-upweighted domain keeps
    100% of its rows: rate_d ∝ share_d^(1/tau) / share_d, scaled to
    max 1. tau=1 is proportional (all rates 1, no-op); tau→∞ approaches
    uniform over domains (small domains keep all, large domains heavily
    downsampled). Driver-side helper over a domain-count dict (a tiny
    metadata aggregate even at 100 TB).
    """
    if tau <= 0:
        raise ValueError("tau must be > 0")
    total = sum(counts.values())
    if total == 0:
        return {d: 1.0 for d in counts}
    raw = {
        d: (n / total) ** (1.0 / tau) / (n / total) if n else 1.0
        for d, n in counts.items()
    }
    m = max(raw.values())
    return {d: r / m for d, r in raw.items()}


def _domain_map(mapping: dict[str, str]) -> Column:
    pairs: list[Column] = []
    for k, v in mapping.items():
        pairs.append(F.lit(k))
        pairs.append(F.lit(v))
    return F.create_map(*pairs)


def domain_mixture_sample(
    df: DataFrame,
    domain_col: str,
    rates: dict[str, float],
    key_col: str,
    salt: str = "mix",
) -> DataFrame:
    """Keep each row iff its hashed key falls under its domain's rate.

    Domains absent from ``rates`` are dropped (rate 0). The decision is
    a map-lookup + string compare per row — no shuffle, no join; the
    filter sits directly on the scan.
    """
    thresholds = _domain_map({d: _rate_threshold(r) for d, r in rates.items()})
    bucket = hash_bucket_expr(F.col(key_col), salt=f"{salt}:")
    return df.filter(bucket < thresholds[F.col(domain_col)])


def epoch_repeat(
    df: DataFrame,
    domain_col: str,
    epochs: dict[str, float],
    key_col: str,
    salt: str = "epoch",
    epoch_col: str = "epoch",
) -> DataFrame:
    """Replicate rows by fractional per-domain epoch counts.

    A domain with epochs=2.5 emits every row twice and a deterministic
    half of its rows a third time (hash-selected, so the same half every
    run). Output gains ``epoch_col`` (1-based copy index). Domains not
    in ``epochs`` default to 1. The fan-out is a row-local
    explode — no shuffle; downstream writers see epochs as ordinary
    rows.
    """
    full = _domain_map(
        {d: str(int(math.floor(e))) for d, e in epochs.items()}
    )
    frac_thr = _domain_map(
        {d: _rate_threshold(e - math.floor(e)) for d, e in epochs.items()}
    )
    bucket = hash_bucket_expr(F.col(key_col), salt=f"{salt}:")
    dom = F.col(domain_col)
    n_full = F.coalesce(full[dom].cast("int"), F.lit(1))
    extra = F.when(
        bucket < F.coalesce(frac_thr[dom], F.lit("0000")), F.lit(1)
    ).otherwise(F.lit(0))
    copies = n_full + extra
    seq = F.when(copies >= 1, F.sequence(F.lit(1), copies)).otherwise(
        F.array().cast("array<int>")
    )
    return df.withColumn(epoch_col, F.explode(seq))


def token_budget_select(
    df: DataFrame,
    domain_col: str,
    cost_col: str,
    budget: int,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Best-first fill of a per-domain budget: order each domain by
    ``order_cols`` (default: cheapest first, then deterministic), keep
    rows while the running ``cost_col`` total stays within ``budget``.

    The running sum rides edf.grouped_ordered_cumsum — per-(domain,
    range-bucket) window partitions plus driver-cumulated bucket
    offsets — NOT a per-domain window: a domain is a dictionary-class
    skewed key, and one domain holding most of the corpus would funnel
    through ONE task at 100 TB (the r11 skew-partition-window lint
    class). The greedy prefix rule (cumulative sum INCLUDING the
    current row must fit) is the same rule the SQL twin states, so
    selection is oracle-checkable row for row. ``cost_col`` must be an
    integer column; ``order_cols`` a within-domain total order.
    """
    from .edf import grouped_ordered_cumsum

    order = order_cols or [cost_col, domain_col]
    cums = grouped_ordered_cumsum(df, [domain_col], order, [cost_col])
    return cums.filter(F.col(f"cum_{cost_col}") <= budget).drop(
        f"cum_{cost_col}"
    )


def training_order(
    df: DataFrame,
    key_col: str,
    salt: str = "order",
    pos_col: str = "pos",
) -> DataFrame:
    """Deterministic global shuffle for training-example serialization:
    dense position 0..N-1 in md5(salt:key) order.

    The order is a pure function of (salt, key) — re-running on any
    cluster reproduces the exact curriculum. Positions come from
    operators.ids.dense_ids (sampled cut points + per-bucket windows),
    so there is no single-task global sort.
    """
    keyed = df.withColumn(
        "__ord", F.md5(F.concat(F.lit(f"{salt}:"), F.col(key_col).cast("string")))
    )
    return dense_ids(keyed, ["__ord"], id_col=pos_col).drop("__ord")


def dsir_log_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_col: str,
    buckets: int = 64,
) -> DataFrame:
    """DSIR importance weights (Xie et al., 2023): per-row
    log p_target - log p_raw under bag-of-hashed-unigram multinomials
    with add-one smoothing; ``target_col`` is a boolean column marking
    target-domain rows.

    Shape at 100 TB: one token explode, ONE groupBy(bucket) building
    both models in the same pass (conditional count), a ``buckets``-row
    broadcast of the log-ratio dictionary back onto the token stream,
    and a per-row sum — no pair joins, no driver-side model. Returns
    (id_col, n_tokens, log_w) with log_w unrounded; rows whose text has
    no tokens keep n_tokens=0, log_w=0.
    """
    toks = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"), lambda x: x != ""
    )
    tok = df.select(
        F.col(id_col).alias("__id"),
        F.col(target_col).alias("__tgt"),
        F.explode(toks).alias("w"),
    )
    bkt = tok.select(
        "__id",
        "__tgt",
        F.pmod(
            F.conv(F.substring(F.md5(F.col("w")), 1, 4), 16, 10).cast("long"),
            F.lit(buckets),
        ).alias("bucket"),
    )
    # ONE tokenize pass: the exploded token stream previously fed BOTH
    # the model build and the score join, re-executing the
    # tokenize+md5 lineage twice per invocation. Fold it to per-(doc,
    # bucket) counts first — ≤ |docs|·buckets rows, the frame both
    # consumers need — and checkpoint THAT (never the token stream; at
    # 100 TB the count table is the materializable artifact). The
    # per-doc score becomes Σ_buckets c·lr, algebraically equal to the
    # old per-token Σ lr and inside the ROUND(5dp) tolerance the query
    # contract already grants float summation.
    db = bkt.groupBy("__id", "__tgt", "bucket").agg(
        F.count(F.lit(1)).alias("__c")
    )
    db = db.localCheckpoint(eager=True)
    dim = db.groupBy("bucket").agg(
        F.sum("__c").alias("raw_c"),
        F.sum(F.when(F.col("__tgt"), F.col("__c")).otherwise(0)).alias(
            "tgt_c"
        ),
    )
    tot = dim.agg(F.sum("raw_c").alias("r"), F.sum("tgt_c").alias("tt"))
    lr = dim.crossJoin(F.broadcast(tot)).select(
        "bucket",
        (
            F.log((F.col("tgt_c") + 1.0) / (F.col("tt") + float(buckets)))
            - F.log((F.col("raw_c") + 1.0) / (F.col("r") + float(buckets)))
        ).alias("lr"),
    )
    per = (
        db.join(F.broadcast(lr), "bucket")
        .groupBy("__id")
        .agg(
            F.sum("__c").cast("long").alias("n_tokens"),
            F.sum(F.col("__c") * F.col("lr")).alias("s"),
        )
    )
    return df.select(F.col(id_col).alias("__id")).join(per, "__id", "left").select(
        F.col("__id").alias(id_col),
        F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce(F.col("s"), F.lit(0.0)).alias("log_w"),
    )
