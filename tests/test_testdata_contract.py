"""Testdata contract guard.

Round 2 broke because the driver regenerated events.parquet with a
different timestamp unit than the reader assumed. The reader is now
footer-driven (io.read_timestamp_table), and this test makes any OTHER
contract drift — added/removed/renamed columns, changed physical types —
fail loudly at pytest time with a message naming the drifted table,
instead of surfacing as silent nulls and oracle hash mismatches.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from ml_pipelines_spark.schemas import TESTDATA_SCHEMAS

SF_DIRS = [
    d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    if os.path.isdir(d)
]

# Declared Spark type -> acceptable parquet/arrow physical families.
# Timestamps accept any unit (the reader detects it from the footer).
_COMPAT = {
    "long": {"int64", "int32"},
    "integer": {"int32", "int64"},
    "double": {"double", "float"},
    "float": {"float", "double"},
    "string": {"string", "large_string"},
    "binary": {"binary", "large_binary"},
    "date": {"date32[day]", "date64[ms]"},
    "boolean": {"bool"},
}


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("table", sorted(TESTDATA_SCHEMAS))
def test_footer_matches_declared_schema(sf_dir, table):
    path = f"{sf_dir}/{table}.parquet"
    if not os.path.exists(path):
        pytest.skip(f"{path} absent")
    arrow = pq.ParquetFile(path).schema_arrow
    declared = TESTDATA_SCHEMAS[table]

    footer_cols = set(arrow.names)
    declared_cols = {f.name for f in declared.fields}
    missing = declared_cols - footer_cols
    assert not missing, (
        f"{table}: declared columns missing from the files {sorted(missing)} — "
        "driver regenerated testdata with a different schema; update "
        "ml_pipelines_spark/schemas.py"
    )

    for f in declared.fields:
        atype = arrow.field(f.name).type
        spark_t = f.dataType.typeName()
        if spark_t == "timestamp":
            assert str(atype).startswith("timestamp"), (
                f"{table}.{f.name}: declared timestamp, files have {atype}"
            )
        elif spark_t == "array":
            assert str(atype).startswith(("list", "large_list")), (
                f"{table}.{f.name}: declared array, files have {atype}"
            )
        elif spark_t in _COMPAT:
            assert str(atype) in _COMPAT[spark_t], (
                f"{table}.{f.name}: declared {spark_t}, files have {atype}"
            )
