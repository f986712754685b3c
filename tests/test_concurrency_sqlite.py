"""Cross-process commit races arbitrated by the INSTALLABLE catalog
backend (VERDICT r10 item 5): the same two-process writer race as
test_concurrency_multiprocess, but with every claim going through
SqliteClaimBackend — a real conditional-put database shared by both
drivers — instead of filesystem markers. Plus a direct N-process CAS
race on the primitive itself (no Spark, cheap)."""

from __future__ import annotations

import pytest

import os
import shutil
import subprocess
import sys
import tempfile
import textwrap
import threading
import time

from pyspark.sql import functions as F

from ml_pipelines_spark.operators.claims import (

    SqliteClaimBackend,
    claim_backend,
)

# slow tier: multi-process sqlite-CAS race stress (~55s) — excluded from the driver-budget default run
pytestmark = pytest.mark.slow

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_sqlite_claim_thread_race(tmp_path):
    db = str(tmp_path / "claims.db")
    b = SqliteClaimBackend(db)
    wins = []

    def worker():
        if b.claim(None, "/t", "v=1"):
            wins.append(1)

    threads = [threading.Thread(target=worker) for _ in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(wins) == 1
    assert b.held(None, "/t") == ["v=1"]
    b.release(None, "/t", "v=1")
    assert b.held(None, "/t") == []
    # released key can be re-claimed
    assert b.claim(None, "/t", "v=1")


_CAS_RACER = textwrap.dedent(
    """
    import sys, time, os
    sys.path.insert(0, {repo!r})
    db, go = sys.argv[1], sys.argv[2]
    from ml_pipelines_spark.operators.claims import SqliteClaimBackend
    b = SqliteClaimBackend(db)
    while not os.path.exists(go):
        time.sleep(0.005)
    print("WON" if b.claim(None, "/t", "v=9") else "LOST", flush=True)
    """
).format(repo=_REPO)


def test_sqlite_claim_cross_process_race(tmp_path):
    # 8 separate PROCESSES race one key — the atomicity class a
    # process-local dict can never test; exactly one may win
    db = str(tmp_path / "claims.db")
    SqliteClaimBackend(db)  # create schema before the stampede
    script = tmp_path / "racer.py"
    script.write_text(_CAS_RACER)
    go = str(tmp_path / "go")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), db, go],
            stdout=subprocess.PIPE,
            text=True,
        )
        for _ in range(8)
    ]
    time.sleep(1.0)  # let them all reach the spin barrier
    open(go, "w").close()
    outs = [p.communicate(timeout=60)[0].strip() for p in procs]
    assert all(p.returncode == 0 for p in procs)
    assert sorted(outs).count("WON") == 1, outs
    assert outs.count("LOST") == 7, outs


_WRITER_SQLITE = textwrap.dedent(
    """
    import os, sys, time
    sys.path.insert(0, {repo!r})
    table, lo, hi, ready, go, db = sys.argv[1:7]
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    import ml_pipelines_spark.operators.manifest as M
    from ml_pipelines_spark.operators.claims import (
        SqliteClaimBackend, set_claim_backend,
    )
    set_claim_backend(SqliteClaimBackend(db))
    M._CLAIM_WAIT_S = 120.0
    spark = (
        SparkSession.builder.master("local[2]")
        .appName(f"sqlite-race-writer-{{lo}}")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "1500m")
        .getOrCreate()
    )
    df = spark.range(int(lo), int(hi)).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("val")
    )
    df.count()  # warm the JVM
    open(ready, "w").close()
    while not os.path.exists(go):
        time.sleep(0.02)
    v = M.append_snapshot(df, table, "k", max_retries=5)
    print(f"VERSION {{v}}", flush=True)
    spark.stop()
    """
).format(repo=_REPO)


def test_two_process_writers_both_commit_via_sqlite(spark, tmp_path):
    from ml_pipelines_spark.operators.manifest import (
        read_snapshot,
        sweep_orphan_versions,
        versions,
        write_manifest_table,
    )

    table = tempfile.mkdtemp(prefix="mp_sqlite_race_")
    db = str(tmp_path / "catalog.db")
    try:
        with claim_backend(SqliteClaimBackend(db)):
            base = spark.range(0, 100).select(
                F.col("id").alias("k"), (F.col("id") * 2).alias("val")
            )
            write_manifest_table(base, table, "k", num_files=2)

            script = tmp_path / "writer.py"
            script.write_text(_WRITER_SQLITE)
            go = str(tmp_path / "go")
            procs, readies = [], []
            for lo, hi in ((100, 150), (200, 260)):
                ready = str(tmp_path / f"ready_{lo}")
                readies.append(ready)
                procs.append(
                    subprocess.Popen(
                        [sys.executable, str(script), table,
                         str(lo), str(hi), ready, go, db],
                        stdout=subprocess.PIPE,
                        stderr=subprocess.PIPE,
                        text=True,
                    )
                )
            deadline = time.monotonic() + 240
            while not all(os.path.exists(r) for r in readies):
                if time.monotonic() > deadline:
                    for p in procs:
                        p.kill()
                    raise AssertionError("writers never reached the barrier")
                time.sleep(0.1)
            open(go, "w").close()
            outs = [p.communicate(timeout=300) for p in procs]
            got_versions = []
            for p, (out, err) in zip(procs, outs):
                assert p.returncode == 0, (
                    f"writer failed:\n{out}\n{err[-3000:]}"
                )
                got_versions.extend(
                    int(line.split()[1])
                    for line in out.splitlines()
                    if line.startswith("VERSION ")
                )
            assert sorted(got_versions) == [2, 3]
            assert versions(spark, table) == [1, 2, 3]
            assert read_snapshot(spark, table).count() == 210
            # sweep enumerates through the CATALOG, not marker files
            assert sweep_orphan_versions(spark, table) == []
            # no filesystem markers were ever written
            assert not os.path.exists(f"{table}/_claims")
    finally:
        shutil.rmtree(table, ignore_errors=True)


def test_holds_point_lookup_all_backends(spark, tmp_path):
    # ADVICE r11: the commit-path check is a POINT lookup (one
    # exists/SELECT), never `key in held()` (O(versions) enumeration).
    # Contract: holds() agrees with held() membership on every backend.
    from ml_pipelines_spark.operators.claims import (
        CatalogClaimBackend,
        FileSystemClaimBackend,
        JdbcClaimBackend,
        SqliteClaimBackend,
    )

    t = str(tmp_path / "tbl")
    backends = [
        FileSystemClaimBackend(),
        CatalogClaimBackend(),
        SqliteClaimBackend(str(tmp_path / "claims.db")),
        JdbcClaimBackend(f"jdbc:derby:{tmp_path}/holdsdb;create=true"),
    ]
    for b in backends:
        name = type(b).__name__
        assert not b.holds(spark, t, "v=1"), name
        assert b.claim(spark, t, "v=1"), name
        assert b.holds(spark, t, "v=1"), name
        assert not b.holds(spark, t, "v=2"), name
        assert "v=1" in b.held(spark, t), name
        b.release(spark, t, "v=1")
        assert not b.holds(spark, t, "v=1"), name
