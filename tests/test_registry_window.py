"""Registration-order guard + evidence-age SLAs.

The driver's correctness harness hashes the FIRST 50 registered queries,
so ordering is part of the product contract (queries/__init__.py:
_CHECK_FIRST). Round 9 replaced the impossible "everything every 3
rounds" promise (285 queries / 50 slots) with tiered SLAs, enforced
here MECHANICALLY against the CORRECTNESS_r*.json history in the repo
root:

- rule 1: queries with no driver evidence at all must be in the window;
- FAMILY SLA (3): every operator family keeps >=1 member with evidence
  at most 3 rounds old (the current window counts as this round's);
- QUERY SLA (7): no individual query's evidence ages past 7 rounds.

A future round that builds a window violating any of these fails CI,
which is the point: the schedule enforces itself.

Boundary semantics (decided round 10): when CORRECTNESS_rN.json lands,
the "current round" becomes N+1 and _CHECK_FIRST still holds round N's
already-consumed window — so a family whose newest evidence ages past
the SLA exactly at the boundary turns this suite red until the round-
(N+1) window is pinned. That is deliberate: rotating the window is
ALWAYS round N+1's first commit, and the red test is the forcing
function. We do NOT count the just-landed round's window as implicit
evidence (a window slot is a promise, not a result — the driver can
error on a slot, and counting promises would let a family coast a full
extra round on a row that never went green).
"""

from __future__ import annotations

import json
import re
from pathlib import Path

from ml_pipelines_spark.queries import ORACLES, QUERIES
from ml_pipelines_spark.queries.__init__ import _CHECK_FIRST
from ml_pipelines_spark.queries.registry import FAMILIES

REPO = Path(__file__).resolve().parent.parent

FAMILY_SLA = 3
QUERY_SLA = 7


def _evidence() -> tuple[dict[str, int], int]:
    """{query -> newest green driver round}, and the CURRENT round
    (newest recorded round + 1 — the round whose window _CHECK_FIRST
    is). A row is green when it has no error, or when its only "error"
    is the rows-only marker the driver writes for oracle-less queries
    (err == 'no_oracle' with a row count)."""
    last: dict[str, int] = {}
    newest = 0
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", f.name)
        rnd = int(m.group(1))
        newest = max(newest, rnd)
        for name, row in json.loads(f.read_text()).items():
            err = row.get("err")
            green = err is None or (
                err == "no_oracle" and row.get("spark_rows") is not None
            )
            if green:
                last[name] = max(last.get(name, 0), rnd)
    return last, newest + 1


def test_check_first_is_the_window():
    assert list(QUERIES)[: len(_CHECK_FIRST)] == _CHECK_FIRST
    assert len(_CHECK_FIRST) == 50


def test_flagship_rides_every_round():
    assert _CHECK_FIRST[0] == "q1_pricing_summary"


def test_rule1_never_checked_in_window():
    last, _ = _evidence()
    never = [q for q in QUERIES if q not in last]
    window = set(_CHECK_FIRST)
    missing = [q for q in never if q not in window]
    assert not missing, (
        f"queries with NO driver evidence left out of the window: {missing}"
    )


def test_query_sla_no_evidence_older_than_7_rounds():
    last, current = _evidence()
    window = set(_CHECK_FIRST)
    # age AFTER this round lands: window members refresh to age 0
    stale = sorted(
        (current - last[q], q)
        for q in QUERIES
        if q in last and q not in window and current - last[q] > QUERY_SLA
    )
    assert not stale, (
        f"queries whose driver evidence exceeds the {QUERY_SLA}-round "
        f"SLA and are not in this round's window: {stale}"
    )


def test_family_sla_every_family_fresh_within_3_rounds():
    last, current = _evidence()
    window = set(_CHECK_FIRST)
    worst: dict[str, int] = {}
    for q in QUERIES:
        fam = FAMILIES[q]
        age = 0 if q in window else current - last.get(q, -(10**6))
        worst[fam] = min(worst.get(fam, 10**6), age)
    violations = {
        fam: age for fam, age in worst.items() if age > FAMILY_SLA
    }
    assert not violations, (
        f"families with no member fresher than {FAMILY_SLA} rounds: "
        f"{violations}"
    )


def test_every_query_registered_and_oracle_subset():
    assert set(ORACLES) <= set(QUERIES)
    assert set(_CHECK_FIRST) <= set(QUERIES)


def test_coverage_doc_census_matches_registry():
    # VERDICT r11 item 5: the COVERAGE.md header count drifted from the
    # runtime registry once; keep it mechanical. The doc must state the
    # exact registered-query total and the bench-only count.
    import os
    import re

    from ml_pipelines_spark.queries import QUERIES
    from ml_pipelines_spark.queries.registry import BENCH_ONLY

    doc = open(
        os.path.join(os.path.dirname(__file__), "..", "COVERAGE.md")
    ).read()
    m = re.search(r"(\d+) registered queries", doc)
    assert m, "COVERAGE.md lost its census line"
    assert int(m.group(1)) == len(QUERIES), (
        f"COVERAGE.md says {m.group(1)} registered queries; the runtime "
        f"registry has {len(QUERIES)} — update the doc header"
    )
    assert f"{len(BENCH_ONLY)} bench-only" in doc
