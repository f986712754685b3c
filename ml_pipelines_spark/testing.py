"""Local replica of the driver's DuckDB-oracle comparison.

The driver runs each ``queries()[name]`` and its ``oracle_sql()[name]``
side-by-side at sf=0.01 and compares row-count + schema + order-insensitive
value hash. This module reproduces that check locally so every query is
validated before the driver sees it.
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb
import pandas as pd

from .schemas import TESTDATA_TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Connection with the testdata tables registered as views (the driver
    pre-registers the same set)."""
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _norm_cell(v) -> str:
    """Normalize a cell to a hashable string, order-insensitively stable."""
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "∅"
    if isinstance(v, float):
        # Queries round on both sides; repr() catches residual mismatches.
        if v == int(v) and abs(v) < 1e15:
            return f"{v:.6f}"
        return f"{v:.6f}"
    if isinstance(v, (_dt.datetime, pd.Timestamp)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def normalize_frame(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    rows = [
        tuple(_norm_cell(row[c]) for c in cols)
        for _, row in df[cols].iterrows()
    ]
    return sorted(rows)


def compare(spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        problems.append(
            f"schema mismatch: spark={sorted(spark_df.columns)} "
            f"oracle={sorted(oracle_df.columns)}"
        )
        return problems
    if len(spark_df) != len(oracle_df):
        problems.append(f"row count: spark={len(spark_df)} oracle={len(oracle_df)}")
    a, b = normalize_frame(spark_df), normalize_frame(oracle_df)
    if a != b:
        set_a, set_b = set(a), set(b)
        only_spark = [r for r in a if r not in set_b][:5]
        only_oracle = [r for r in b if r not in set_a][:5]
        problems.append(
            f"value mismatch; sample spark-only={only_spark} oracle-only={only_oracle}"
        )
    return problems


def check_query(spark, sf_dir: str, name: str) -> list[str]:
    """Run one registered query against its oracle; [] means match."""
    from .queries import ORACLES, QUERIES

    spark_pdf = QUERIES[name](spark, sf_dir).toPandas()
    if name not in ORACLES:
        return [] if len(spark_pdf) >= 0 else ["query produced no frame"]
    con = duckdb_connection(sf_dir)
    oracle_pdf = con.execute(ORACLES[name]).df()
    return compare(spark_pdf, oracle_pdf)
