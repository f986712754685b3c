"""JDBC catalog claim backend (VERDICT r11 item 6): the same CAS
interface as SqliteClaimBackend, driven through the JVM's java.sql —
here against the EMBEDDED DERBY bundled with Spark (a real
transactional database with real locking, no external service). The
cross-PROCESS race of the sqlite suite does not apply: embedded Derby
is single-JVM by design (documented on the backend); server-mode
Derby/Postgres/MySQL use the identical SQL and backend. What is
covered: the N-thread CAS race through one JVM, the holds/held/release
contract, and a full table-layer commit lifecycle arbitrated by the
database instead of filesystem markers."""

from __future__ import annotations

import pytest

import shutil
import tempfile
import threading

from pyspark.sql import functions as F

from ml_pipelines_spark.operators.claims import (

    JdbcClaimBackend,
    claim_backend,
)

# slow tier: embedded-Derby CAS race re-run (~20s) — excluded from the driver-budget default run
pytestmark = pytest.mark.slow


def _derby_url(tmp_path) -> str:
    return f"jdbc:derby:{tmp_path}/claimsdb;create=true"


def test_jdbc_claim_thread_race(spark, tmp_path):
    b = JdbcClaimBackend(_derby_url(tmp_path))
    wins = []
    lock = threading.Lock()

    def worker():
        if b.claim(spark, "/t", "v=1"):
            with lock:
                wins.append(1)

    threads = [threading.Thread(target=worker) for _ in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(wins) == 1
    assert b.held(spark, "/t") == ["v=1"]
    assert b.holds(spark, "/t", "v=1")
    assert not b.holds(spark, "/t", "v=2")
    b.release(spark, "/t", "v=1")
    assert b.held(spark, "/t") == []
    assert b.claim(spark, "/t", "v=1")  # released key re-claimable


def test_jdbc_lost_claim_is_false_not_raise(spark, tmp_path):
    b = JdbcClaimBackend(_derby_url(tmp_path))
    assert b.claim(spark, "/x", "v=7")
    assert b.claim(spark, "/x", "v=7") is False  # duplicate -> lost race
    # different table, same key: independent namespaces
    assert b.claim(spark, "/y", "v=7")


def test_table_lifecycle_arbitrated_by_jdbc(spark, tmp_path):
    import ml_pipelines_spark.operators.manifest as M
    import ml_pipelines_spark.operators.posdeletes as P

    d = tempfile.mkdtemp(prefix="mlps_jdbc_lifecycle_")
    try:
        with claim_backend(JdbcClaimBackend(_derby_url(tmp_path))):
            base = spark.range(0, 200).select(
                F.col("id").alias("k"), (F.col("id") * 2).alias("val")
            )
            assert M.write_manifest_table(base, d, "k", num_files=2) == 1
            M.append_snapshot(
                spark.range(200, 250).select(
                    F.col("id").alias("k"), (F.col("id") * 2).alias("val")
                ),
                d,
                "k",
                num_files=1,
            )
            M.delete_from_snapshot(
                spark, d, "k",
                spark.range(10, 20).select(F.col("id").alias("k")),
            )
            P.merge_on_read(
                spark,
                d,
                spark.range(30, 35).select(
                    F.col("id").alias("k"), F.lit(-1).alias("val")
                ),
                "k",
            )
            got = {r.k: r.val for r in M.read_snapshot(spark, d).collect()}
            want = {k: k * 2 for k in range(250)}
            for k in range(10, 20):
                del want[k]
            for k in range(30, 35):
                want[k] = -1
            assert got == want
            assert M.versions(spark, d) == [1, 2, 3, 4]
    finally:
        shutil.rmtree(d, ignore_errors=True)
