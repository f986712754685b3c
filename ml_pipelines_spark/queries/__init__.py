"""Query registry — one entry per operator from SURVEY.md §2.

Each query is a named pair:
  - a PySpark implementation ``(spark, sf_dir) -> DataFrame``
  - (when SQL-expressible) a DuckDB-ANSI oracle SQL string over the same
    parquet tables, producing identical column names and values.

The driver compares the two at sf=0.01 (row count + schema + order-
insensitive value hash). Column names are aliased identically on both
sides; floating aggregates are rounded on both sides so the comparison is
robust to summation order (Spark sums per-partition, DuckDB serially).
"""

from __future__ import annotations

from .registry import ORACLES, QUERIES, query  # noqa: F401

# Import for registration side effects — each module registers its queries.
from . import relational  # noqa: E402,F401
from . import windows  # noqa: E402,F401
from . import splits  # noqa: E402,F401
from . import text  # noqa: E402,F401
from . import dedup  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import geometry  # noqa: E402,F401
from . import export  # noqa: E402,F401
from . import tracks  # noqa: E402,F401
from . import udaf  # noqa: E402,F401
from . import asof  # noqa: E402,F401
from . import streaming  # noqa: E402,F401
from . import multimodal  # noqa: E402,F401
from . import audio  # noqa: E402,F401
from . import packing  # noqa: E402,F401
from . import mixture  # noqa: E402,F401
from . import validation  # noqa: E402,F401
from . import profiling  # noqa: E402,F401
from . import lm  # noqa: E402,F401
