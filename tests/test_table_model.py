"""Model-based randomized check of the table layer.

A seeded random sequence of lifecycle operations — append, CoW merge,
MoR merge (deletion vectors), DV predicate delete, key-tombstone
delete, compaction, expire — runs against BOTH the real manifest table
and a trivial in-memory reference model (a dict of key -> value).
After every operation the live snapshot must equal the model exactly,
the count-from-metadata fast path must agree, and a random retained
historical version must still time-travel to its recorded state.

This is the cross-feature interaction net the per-feature tests can't
weave: e.g. a DV recorded on a file that a later CoW merge rewrites,
then compacted, then expired — any origin-arithmetic or visibility bug
in the composition shows up as a model divergence with the op sequence
printed for replay.
"""

from __future__ import annotations

import random
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from ml_pipelines_spark.operators.manifest import (
    compact_small_files,
    compact_snapshot,
    delete_from_snapshot,
    expire_snapshots,
    merge_snapshot,
    read_snapshot,
    snapshot_row_count,
    versions,
    write_manifest_table,
)
from ml_pipelines_spark.operators.posdeletes import (

    delete_where,
    merge_on_read,
)

# slow tier: randomized lifecycle model fuzz (~45s) — excluded from the driver-budget default run
pytestmark = pytest.mark.slow

N_OPS = 12


def _df(spark, rows):
    return spark.createDataFrame(
        [(k, v) for k, v in rows], "k bigint, val bigint"
    )


def _read(spark, path, version=None):
    return {
        (r["k"], r["val"])
        for r in read_snapshot(spark, path, version).collect()
    }


@pytest.mark.parametrize("seed", [7, 23])
def test_random_lifecycle_matches_model(spark, seed):
    rng = random.Random(seed)
    path = tempfile.mkdtemp(prefix=f"tbl_model_{seed}_")
    trace = []
    try:
        model = {k: k * 10 for k in range(0, 200)}
        write_manifest_table(
            _df(spark, model.items()), path, "k", num_files=4
        )
        next_key = 200
        # version -> model state at that version (for time travel)
        history = {1: dict(model)}

        def commit(v):
            history[v] = dict(model)

        for step in range(N_OPS):
            op = rng.choice(
                [
                    "append",
                    "merge_cow",
                    "merge_mor",
                    "dv_delete",
                    "key_delete",
                    "compact",
                    "compact_small",
                    "expire",
                ]
            )
            trace.append(op)
            if op == "append":
                n = rng.randint(5, 40)
                batch = {
                    k: k * 10 for k in range(next_key, next_key + n)
                }
                next_key += n
                from ml_pipelines_spark.operators.manifest import (
                    append_snapshot,
                )

                v = append_snapshot(
                    _df(spark, batch.items()), path, "k"
                )
                model.update(batch)
                commit(v)
            elif op in ("merge_cow", "merge_mor"):
                ks = rng.sample(sorted(model), min(30, len(model)))
                n_new = rng.randint(0, 10)
                batch = {k: k * 10 + step + 1 for k in ks}
                batch.update(
                    {
                        k: k * 10 + step + 1
                        for k in range(next_key, next_key + n_new)
                    }
                )
                next_key += n_new
                if op == "merge_cow":
                    v = merge_snapshot(
                        spark, path, "k", _df(spark, batch.items())
                    )
                else:
                    v = merge_on_read(
                        spark, path, _df(spark, batch.items()), "k"
                    )
                model.update(batch)
                commit(v)
            elif op == "dv_delete":
                lo = rng.randint(0, max(1, next_key - 50))
                hi = lo + rng.randint(10, 60)
                v = delete_where(
                    spark, path, f"k >= {lo} AND k < {hi}"
                )
                for k in [k for k in model if lo <= k < hi]:
                    del model[k]
                commit(v)
            elif op == "key_delete":
                if not model:
                    continue
                ks = rng.sample(sorted(model), min(15, len(model)))
                v = delete_from_snapshot(
                    spark,
                    path,
                    "k",
                    spark.createDataFrame(
                        [(k,) for k in ks], "k bigint"
                    ),
                )
                for k in ks:
                    del model[k]
                commit(v)
            elif op == "compact":
                v = compact_snapshot(
                    spark, path, "k", target_rows=120
                )
                commit(v)
            elif op == "compact_small":
                v = compact_small_files(
                    spark, path, "k", target_rows=120, small_rows=60
                )
                if v in history or v == 1:
                    trace[-1] = "compact_small(noop)"
                else:
                    commit(v)
            elif op == "expire":
                expire_snapshots(spark, path, keep_last=2)
                retained = set(versions(spark, path))
                for v in list(history):
                    if v not in retained:
                        del history[v]
            # live state must equal the model after EVERY op
            got = _read(spark, path)
            want = set(model.items())
            assert got == want, (
                f"seed={seed} step={step} trace={trace}: live snapshot "
                f"diverged (missing={sorted(want - got)[:5]}, "
                f"extra={sorted(got - want)[:5]})"
            )
            assert snapshot_row_count(spark, path) == len(model), (
                f"seed={seed} step={step} trace={trace}: metadata count"
            )
            # a random retained historical version still time-travels
            vs = versions(spark, path)
            probe = rng.choice(vs)
            if probe in history:
                assert _read(spark, path, probe) == set(
                    history[probe].items()
                ), (
                    f"seed={seed} step={step} trace={trace}: time "
                    f"travel to v={probe} diverged"
                )
    finally:
        shutil.rmtree(path, ignore_errors=True)
