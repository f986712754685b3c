"""drift_psi_events epsilon smoothing (ADVICE r10): a category present
in only one half must contribute a LARGE FINITE term, not a silently
NULL-dropped one — and Spark must still hash-match the DuckDB oracle on
that degenerate input."""

from __future__ import annotations

import datetime

import duckdb
import pytest

from ml_pipelines_spark.queries.registry import ORACLES
from ml_pipelines_spark.queries.stats import drift_psi_events
from ml_pipelines_spark.schemas import TESTDATA_SCHEMAS
from ml_pipelines_spark.testing import compare


@pytest.fixture()
def lopsided_sf_dir(spark, tmp_path):
    # epoch day of ts decides the half: day%2==0 -> p, ==1 -> q.
    d0 = datetime.datetime(2024, 1, 1, 12)   # epoch day 19723 (odd)
    d1 = datetime.datetime(2024, 1, 2, 12)
    half0, half1 = (d1, d0) if 19723 % 2 else (d0, d1)
    rows = []
    eid = 0
    for et, n0, n1 in [("click", 40, 38), ("view", 25, 30),
                       ("ghost", 7, 0),   # disappears in half 1
                       ("nova", 0, 5)]:   # appears only in half 1
        for _ in range(n0):
            rows.append((eid, half0, eid % 11, et, 1.0, "{}")); eid += 1
        for _ in range(n1):
            rows.append((eid, half1, eid % 11, et, 1.0, "{}")); eid += 1
    df = spark.createDataFrame(rows, TESTDATA_SCHEMAS["events"])
    # micros, not the legacy INT96 default — the unit-probing reader
    # (io.read_timestamp_table) treats INT96 as pyarrow ns and would
    # take the nanosAsLong path against a non-ns physical column
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try:
        df.coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    finally:
        spark.conf.unset("spark.sql.parquet.outputTimestampType")
    return str(tmp_path)


def test_psi_smoothing_degenerate_categories(spark, lopsided_sf_dir):
    out = drift_psi_events(spark, lopsided_sf_dir).toPandas()
    by_type = out.set_index("event_type")
    # the one-sided categories produce finite, large, non-null terms
    assert by_type.loc["ghost", "psi_term"] > 0.5
    assert by_type.loc["nova", "psi_term"] > 0.01
    assert out["psi_term"].notna().all()
    # total includes them (no silent exclusion)
    assert abs(
        out["total_psi"].iloc[0] - round(out["psi_term"].sum(), 6)
    ) <= 5e-6

    # and the oracle agrees on the exact values (DuckDB used to error)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{lopsided_sf_dir}/events.parquet/*.parquet')"
    )
    assert compare(out, con.execute(ORACLES["drift_psi_events"]).df()) == []
