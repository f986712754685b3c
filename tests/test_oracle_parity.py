"""Local replica of the driver's t2 gate: every registered query with an
oracle must hash-match DuckDB on the smoke dataset (sf0.001 for speed; the
driver runs sf0.01)."""

from __future__ import annotations

import pytest

from ml_pipelines_spark.queries import ORACLES, QUERIES
from ml_pipelines_spark.testing import check_query


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    problems = check_query(spark, sf_dir, name)
    assert not problems, f"{name}: {problems}"


def test_all_queries_have_callable_entries():
    assert QUERIES, "no queries registered"
    for name, fn in QUERIES.items():
        assert callable(fn), name
    # Every oracle belongs to a registered query.
    assert set(ORACLES) <= set(QUERIES)
