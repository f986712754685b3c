"""Incremental pipeline maintenance — process only the new data, keep
stored results equal to a full recompute.

At 100 TB nothing is recomputed from scratch: a day of events lands and
the rollup table must absorb it; a crawl batch lands and only unseen
documents may enter the corpus. Both ops here lean on ``io.merge_upsert``
(touched-partition rewrite) so cost scales with the DELTA, not the
history:

- ``incremental_rollup`` — aggregate the new slice to the rollup grain,
  combine with the stored rows for the affected keys (sum/count
  re-aggregation: the stored table IS a partial aggregate, so merging is
  just another aggregate over old+new — the same algebra as Spark's own
  partial/final aggregation split), and upsert exactly those keys.
- ``dedup_against_index`` — anti-join the new batch's content
  fingerprints against the stored fingerprint index (the index is
  fingerprint-partitioned parquet; the anti-join prunes to the buckets
  the batch actually hashes into), return the accepted rows, and append
  their fingerprints to the index. First-wins across batches, matching
  ``dropDuplicates`` keep-first semantics within a batch.

Both are tested for the defining invariant: stored state after N
incremental steps equals the single-shot computation over all data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import fingerprint
from ..io import merge_upsert, overwrite_partitions, read_table, write_partitioned

# Rollup grain: (event_date, event_type) with additive measures. Additive
# state (sum/count) re-aggregates exactly; avg is derived at read time —
# never stored — so incremental merging stays lossless.
_ROLLUP_KEYS = ["event_date", "event_type"]


def _rollup(events: DataFrame) -> DataFrame:
    return (
        events.withColumn("event_date", F.date_format("ts", "yyyy-MM-dd"))
        .groupBy(*_ROLLUP_KEYS)
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
    )


def init_rollup(events: DataFrame, path: str) -> None:
    """Materialize the rollup table, partitioned by event_date so later
    increments rewrite only the dates they touch."""
    overwrite_partitions(_rollup(events), path, ["event_date"])


def incremental_rollup(
    spark: SparkSession, path: str, new_events: DataFrame
) -> None:
    """Fold a batch of new events into the stored rollup.

    Reads ONLY the stored rows for the dates present in the batch
    (merge_upsert's touched-partition semi-join → partition pruning),
    re-aggregates old+new — exact for additive measures — and rewrites
    those date partitions. History partitions are never read.
    """
    delta = _rollup(new_events)
    touched = delta.select("event_date").distinct()
    stored = _read_stored_rollup(spark, path)
    current = stored.join(F.broadcast(touched), "event_date", "left_semi")
    combined = (
        current.unionByName(delta)
        .groupBy(*_ROLLUP_KEYS)
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
        )
    )
    merge_upsert(
        spark,
        path,
        combined,
        key_cols=_ROLLUP_KEYS,
        partition_cols=["event_date"],
    )


def _read_stored_rollup(spark: SparkSession, path: str) -> DataFrame:
    # Hive partition values are strings on disk but Spark type-infers
    # them (event_date comes back as DATE); cast back so stored and
    # freshly-computed rollups union/compare cleanly.
    return read_table(spark, path).withColumn(
        "event_date", F.col("event_date").cast("string")
    )


def read_rollup(spark: SparkSession, path: str) -> DataFrame:
    """Rollup with derived (never stored) non-additive measures."""
    df = _read_stored_rollup(spark, path)
    return df.withColumn("avg_value", F.col("sum_value") / F.col("n_events"))


# ---------------------------------------------------------------------------
# Incremental corpus dedup against a stored fingerprint index
# ---------------------------------------------------------------------------

_N_FP_BUCKETS = 64


def init_fingerprint_index(spark: SparkSession, path: str) -> None:
    """Create an empty fingerprint index (bucket-partitioned parquet)."""
    empty = spark.createDataFrame([], "fp string, fp_bucket int")
    write_partitioned(empty, path, ["fp_bucket"], mode="overwrite")


def dedup_against_index(
    spark: SparkSession,
    index_path: str,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Admit only batch rows whose content fingerprint is new — new both
    within the batch (keep-first by ``id_col``) and against every prior
    batch (anti-join on the stored index) — then append the admitted
    fingerprints to the index.

    The index scan is pruned to the fp_bucket partitions the batch
    hashes into; with 64 buckets a small batch reads a fraction of the
    index regardless of corpus history size. Append-only index writes
    keep the op retry-safe at the partition level.
    """
    fp = fingerprint(F.col(text_col)).alias("fp")
    stamped = batch.withColumn("fp", fp).withColumn(
        "fp_bucket", F.pmod(F.xxhash64("fp"), F.lit(_N_FP_BUCKETS)).cast("int")
    )
    first_in_batch = stamped.withColumn(
        "__rn",
        F.row_number().over(Window.partitionBy("fp").orderBy(id_col)),
    ).filter(F.col("__rn") == 1).drop("__rn")

    # Explicit schema: a fresh index has zero data files (hive dirs
    # only materialize on write), so inference would fail — and at scale
    # we never want a footer-inference job over the index anyway.
    from pyspark.sql.types import IntegerType, StringType, StructField, StructType

    index = read_table(
        spark,
        index_path,
        StructType(
            [
                StructField("fp", StringType()),
                StructField("fp_bucket", IntegerType()),
            ]
        ),
    )
    touched = first_in_batch.select("fp_bucket").distinct()
    pruned_index = index.join(F.broadcast(touched), "fp_bucket", "left_semi")
    admitted = first_in_batch.join(pruned_index, ["fp", "fp_bucket"], "left_anti")

    # Materialize BEFORE appending to the index: the admitted plan reads
    # the index, so a lazy re-execution after the append would anti-join
    # the batch against its own fingerprints and return nothing. (At
    # full scale the equivalent is writing `admitted` to its destination
    # table and re-reading it; localCheckpoint is the in-session form.)
    admitted = admitted.localCheckpoint(eager=True)
    write_partitioned(
        admitted.select("fp", "fp_bucket"), index_path, ["fp_bucket"], mode="append"
    )
    return admitted.drop("fp", "fp_bucket")


def join_view_delta(
    a_old: DataFrame,
    delta_a: DataFrame,
    b_old: DataFrame,
    delta_b: DataFrame,
    on: list[str] | str,
) -> DataFrame:
    """Delta of the join view V = A ⨝ B under INSERT-only deltas —
    classic incremental view maintenance algebra:

        ΔV = (ΔA ⨝ B_old) ∪ (A_old ⨝ ΔB) ∪ (ΔA ⨝ ΔB)

    The three terms are disjoint by construction (each view row is
    tagged by whether its A-side and/or B-side row is new), so the
    union is exact — no dedup pass. Maintenance cost scales with the
    DELTAS: the two mixed terms each shuffle one delta against one
    stored side (semi-join/bucket pruning applies when the stored side
    is key-partitioned), and the stored view is never rescanned. The
    defining invariant — V_old ∪ ΔV equals the full recompute over
    (A_old∪ΔA) ⨝ (B_old∪ΔB) — is pytest-asserted and value-checked by
    the ``incremental_join_view`` oracle.
    """
    keys = [on] if isinstance(on, str) else list(on)
    d1 = delta_a.join(b_old, keys).withColumn(
        "delta_term", F.lit("a_only")
    )
    d2 = a_old.join(delta_b, keys).withColumn(
        "delta_term", F.lit("b_only")
    )
    d3 = delta_a.join(delta_b, keys).withColumn(
        "delta_term", F.lit("both")
    )
    return d1.unionByName(d2).unionByName(d3)
