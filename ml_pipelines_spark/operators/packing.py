"""Sequence packing — group documents into fixed token-budget bins for
LLM training batches.

Training pipelines concatenate documents into fixed-length sequences
(e.g. 8192 tokens); the packing assignment decides which documents share
a sequence. A global optimal packing is NP-hard and inherently serial —
useless at 100 TB. Both operators here instead parallelize by HASH
GROUP: documents are sprayed into ``num_groups`` independent groups by
``xxhash64(id) % G``, and packing runs per group. Each group is one
window partition / one ``applyInPandas`` batch, so the whole job is a
single hash shuffle on the group key, G-way parallel, no driver state.
At 100 TB, pick G ≈ a few × total cores; group size stays
|docs|/G regardless of corpus size.

Two variants with different guarantees:

- ``segment_pack`` — bin = floor(exclusive-cumulative-tokens / budget)
  within the group's deterministic order. Pure window expressions
  (JVM-side, oracle-checkable in any SQL engine). Bins are contiguous
  runs; a document may straddle a boundary (overflow by at most one
  document — the standard "pack then truncate/split at the reader"
  contract).
- ``pack_first_fit`` — exact first-fit-decreasing inside each group via
  ``applyInPandas``: no bin ever exceeds the budget (oversized documents
  get singleton bins). Tighter bins, Python in the loop — use when bin
  capacity is a hard constraint rather than a target.

Bin ids are globally unique as (group, bin) pairs, encoded as
``group * 2^40 + bin`` — deterministic across runs and retries.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_GROUP_SHIFT = 1 << 40


def segment_pack(
    df: DataFrame,
    token_col: str,
    order_cols: list[str],
    budget: int,
    num_groups: int = 64,
    bin_col: str = "bin_id",
    group_expr: Column | None = None,
) -> DataFrame:
    """Assign each row a ``bin_col`` such that consecutive rows (in
    ``order_cols`` order, within a hash group) share a bin until the
    group's running token total crosses a multiple of ``budget``.

    Expression-only: one shuffle (the window partition), map-side
    nothing else. The exclusive cumulative sum means the FIRST document
    of a bin always starts below the boundary; long documents overflow
    their bin rather than being skipped, so every document is packed
    exactly once.

    ``group_expr`` overrides the group hash (default ``xxhash64`` of the
    order columns) — e.g. an md5-based bucket when the assignment must
    be reproducible in another engine. It must be an integer expression
    in ``[0, num_groups)``.
    """
    grp = (
        group_expr
        if group_expr is not None
        else F.pmod(F.xxhash64(*[F.col(c) for c in order_cols]), F.lit(num_groups))
    )
    w = (
        Window.partitionBy("__grp")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return (
        df.withColumn("__grp", grp.cast("int"))
        .withColumn(
            bin_col,
            (
                F.col("__grp").cast("long") * F.lit(_GROUP_SHIFT)
                + F.floor(cum / budget)
            ),
        )
        .drop("__grp")
    )


def pack_first_fit(
    df: DataFrame,
    token_col: str,
    id_col: str,
    budget: int,
    num_groups: int = 64,
    bin_col: str = "bin_id",
) -> DataFrame:
    """Exact first-fit-decreasing packing within each hash group.

    Guarantee: no bin's token total exceeds ``budget`` unless a single
    document alone does (it then sits in a singleton bin). Deterministic:
    group membership and in-group order depend only on ``id_col``.
    Python touches only (id, tokens) pairs — the payload columns never
    cross into the UDF; the assignment joins back on ``id_col``.
    """
    spark = df.sparkSession
    slim = df.select(
        F.col(id_col),
        F.col(token_col).cast("long").alias("__tok"),
        F.pmod(F.xxhash64(id_col), F.lit(num_groups)).cast("int").alias("__grp"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["__tok", id_col], ascending=[False, True])
        grp = int(pdf["__grp"].iloc[0])
        base = grp * _GROUP_SHIFT
        # (remaining_capacity kept in a list; first-fit scan. Group
        # sizes are |docs|/G — bounded by construction, not by data.)
        remaining: list[int] = []
        bins = []
        for tok in pdf["__tok"]:
            for i, cap in enumerate(remaining):
                if tok <= cap:
                    remaining[i] = cap - tok
                    bins.append(base + i)
                    break
            else:
                bins.append(base + len(remaining))
                remaining.append(max(0, budget - tok))
        out = pdf[[id_col]].copy()
        out[bin_col] = pd.Series(bins, index=out.index, dtype="int64")
        return out

    schema = f"{id_col} {dict(slim.dtypes)[id_col]}, {bin_col} long"
    assignment = slim.groupBy("__grp").applyInPandas(pack, schema=schema)
    return df.join(assignment, id_col)


def length_bucket_batches(
    df: DataFrame,
    len_col: str,
    id_col: str,
    batch_size: int,
    num_groups: int = 8,
    group_expr: Column | None = None,
) -> DataFrame:
    """Length-bucketed batch assignment — the padded-batch efficiency
    trick: sort by length so each batch of ``batch_size`` rows holds
    near-equal lengths, making per-batch padding waste
    (batch_max_len - len) near zero instead of corpus_max - len.

    Scale shape mirrors segment_pack: rows hash into ``num_groups``
    independent scheduling groups (one shuffle), lengths sort WITHIN a
    group's window — no global sort, no single-task window — and the
    batch id is (group << 40) + row_rank // batch_size. Padding quality
    degrades only by the group count (each group spans the same length
    distribution), which is the standard distributed reading of
    length-grouped batching.
    """
    grp = group_expr if group_expr is not None else (F.crc32(F.col(id_col).cast("string")) % num_groups)
    w = Window.partitionBy("__grp").orderBy(F.col(len_col), F.col(id_col))
    ranked = df.withColumn("__grp", grp.cast("long")).withColumn(
        "__rank", F.row_number().over(w) - 1
    )
    return (
        ranked.withColumn(
            "batch_id",
            F.col("__grp") * _GROUP_SHIFT
            + F.floor(F.col("__rank") / batch_size).cast("long"),
        )
        .drop("__rank")
        .drop("__grp")
    )


def write_training_shards(
    df: DataFrame,
    token_col: str,
    order_cols: list[str],
    path: str,
    budget: int,
    num_groups: int = 64,
    group_expr: Column | None = None,
) -> DataFrame:
    """Write ``df`` as token-budgeted training shards and return the
    read-back manifest.

    The shard assignment is ``segment_pack`` (deterministic md5/xxhash
    group + running-token-sum bins); rows land in one parquet directory
    per shard (``partitionBy(shard_id)``), which is exactly the layout a
    training loader wants — a shard is one sequential read, shard order
    is reproducible, and a re-run produces byte-identical partitioning.
    The returned manifest (shard_id, n_docs, shard_tokens, first/last
    order key) is computed from the FILES JUST WRITTEN, not from the
    input plan, so it also round-trip-verifies the sink.

    At 100 TB this is the terminal stage of the curation pipeline: the
    write is one shuffle (the pack window) + one dynamic-partition
    write; the manifest aggregation reads only shard_id + the two
    manifest columns (column pruning leaves the text payload on disk).
    """
    assigned = segment_pack(
        df,
        token_col,
        order_cols,
        budget=budget,
        num_groups=num_groups,
        bin_col="shard_id",
        group_expr=group_expr,
    )
    # One task (and hence one file) per shard: without this, every
    # upstream partition writes a sliver into every shard directory
    # (partitions × shards small files). Shards are token-budgeted by
    # construction, so a shard is always a bounded single file — exactly
    # the sequential-read layout the training loader wants.
    assigned.repartition("shard_id").write.mode("overwrite").partitionBy(
        "shard_id"
    ).parquet(path)
    spark = df.sparkSession
    written = spark.read.parquet(path)
    lead = order_cols[0]
    return written.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_col).cast("long").alias("shard_tokens"),
        F.min(lead).alias("first_doc"),
        F.max(lead).alias("last_doc"),
    )
