"""CSV ingestion with corrupt-record quarantine — the delimited-text
twin of sources/jsonl.py.

Operational exports (labeling vendors, warehouse dumps, spreadsheet
handoffs) arrive as CSV, and at scale some rows are always mangled —
wrong arity, unquoted delimiters, type garbage. Same contract as
``read_jsonl``: one text scan split into (valid, quarantine) through a
``from_csv`` EXPRESSION, not the native CSV source, for the same two
reasons — the native source cannot project only its corrupt column
without caching the whole parse, and an expression keeps both branches
lazy single-pass scans that share the text read.

A declared schema is required; inference is a full extra pass at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

_CORRUPT = "_corrupt_record"


def read_csv_audited(
    spark: SparkSession,
    path: str,
    schema: StructType,
    sep: str = ",",
    header: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Read CSV at ``path`` against a declared schema.

    Returns ``(valid, quarantine)``: valid rows with exactly the schema
    columns; quarantine rows as (raw_line,) for every line that failed
    to parse or type-check. With ``header=True`` the header line is
    recognized BY CONTENT (a line equal to the declared column list),
    so recognition works on every partition without a driver-side
    first-line read — but exactly ONE such line is dropped PER FILE:
    a legitimate data row that happens to equal the header (possible
    with all-string schemas) parses as data instead of vanishing.
    Header-matching lines are byte-identical, so which physical line
    is treated as "the" header cannot change the surviving multiset.
    """
    if any(f.name == _CORRUPT for f in schema.fields):
        raise ValueError(f"schema must not declare {_CORRUPT}")
    full = StructType(
        list(schema.fields) + [StructField(_CORRUPT, StringType(), True)]
    )
    lines = spark.read.text(path)
    if header:
        from pyspark.sql import Window

        header_line = sep.join(f.name for f in schema.fields)
        is_header = F.col("value") == F.lit(header_line)
        # rank only the (few-per-file) header-matching lines and keep
        # all but one per file; the non-matching branch passes through
        # without a shuffle. Two narrow text scans beat shuffling the
        # whole read on (file, match) at scale.
        w = Window.partitionBy(F.input_file_name()).orderBy(F.lit(1))
        extra = (
            lines.filter(is_header)
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") > 1)
            .drop("__rn")
        )
        lines = lines.filter(~is_header).unionByName(extra)
    # from_csv takes a DDL string, not a StructType
    ddl = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in full.fields
    )
    parsed = lines.select(
        F.col("value"),
        F.from_csv(
            "value",
            ddl,
            {
                "mode": "PERMISSIVE",
                "columnNameOfCorruptRecord": _CORRUPT,
                "sep": sep,
            },
        ).alias("__c"),
    )
    bad = F.col("__c").isNull() | F.col(f"__c.{_CORRUPT}").isNotNull()
    valid = parsed.filter(~bad).select(
        *[F.col(f"__c.{f.name}").alias(f.name) for f in schema.fields]
    )
    quarantine = parsed.filter(bad).select(F.col("value").alias("raw_line"))
    return valid, quarantine
