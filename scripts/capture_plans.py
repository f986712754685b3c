"""Capture ``explain("formatted")`` for named queries.

Usage: python scripts/capture_plans.py <suffix> <query> [<query> ...]

Writes ``plans/r12/<query>_<suffix>.txt`` relative to the repo root the
script lives in (so running it from a worktree captures that tree's
plans). Reads ``$SPARK_GRAFT_SF_DIR`` like bench.py.
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from ml_pipelines_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.environ.get(
        "SPARK_GRAFT_PLANS_DIR", os.path.join(ROOT, "plans", "r12")
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="ml_pipelines_spark-plans")
    spark.sparkContext.setLogLevel("ERROR")
    from ml_pipelines_spark.queries import QUERIES
    from ml_pipelines_spark.queries.registry import BENCH_ONLY

    qs = {**QUERIES, **BENCH_ONLY}
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
