"""Plan linter — catch 100 TB scale-killers before they ship.

The difference between a plan that works at test scale and one that
works at 100 TB is usually visible in the PHYSICAL PLAN long before it
is visible in a timing: a CartesianProduct, a window with no partition
keys funnelling the fact table through one task, a row-at-a-time Python
UDF in the hot path, a scan whose filters never reached the reader.
This module makes those checks programmatic — the same assertions the
repo's plan-shape tests hand-roll, packaged for pipelines to run
against their own DataFrames pre-submit.

All checks read the EXECUTED plan string (post-AQE where applicable):
text-level inspection is deliberately version-tolerant — node names are
stable across Spark minors while internal tree APIs are not.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


def plan_text(df: DataFrame) -> str:
    """Executed-plan tree as text (pre-execution: the initial plan)."""
    return df._jdf.queryExecution().executedPlan().toString()


def plan_formatted(df: DataFrame) -> str:
    """`EXPLAIN FORMATTED` text — full attribute lists (PushedFilters,
    ReadSchema) without the toString truncation."""
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def count_scans(df: DataFrame, table: str) -> int:
    """Number of parquet scans of ``table`` in the plan."""
    return len(re.findall(rf"Scan parquet .*{re.escape(table)}", plan_text(df)))


def count_exchanges(df: DataFrame) -> int:
    """Number of hash-partitioning shuffles in the plan."""
    return len(re.findall(r"Exchange hashpartitioning", plan_text(df)))


def pushed_filters(df: DataFrame, table: str | None = None) -> list[str]:
    """Non-empty PushedFilters entries, per scan node (optionally only
    for scans whose node block mentions ``table``)."""
    full = plan_formatted(df)
    out = []
    # formatted explain prints one attribute block per node, separated
    # by blank lines; keep PushedFilters matched to their own scan
    for block in full.split("\n\n"):
        m = re.search(r"PushedFilters: \[([^\]]*)\]", block)
        if not m or not m.group(1).strip():
            continue
        if table is not None and table not in block:
            continue
        out.append(m.group(1).strip())
    return out


@dataclass
class Finding:
    rule: str
    detail: str

    def __repr__(self) -> str:  # readable in assertion messages
        return f"{self.rule}: {self.detail}"


_EXPR_ID_RE = re.compile(r"#\d+L?")
_PLAN_ID_RE = re.compile(r"\[plan_id=\d+\]")


def duplicate_scan_fingerprints(df: DataFrame) -> dict[str, int]:
    """Parquet-scan fingerprints appearing MORE THAN ONCE in one plan —
    the shared-lineage re-execution smell (round 12's dominant fixable
    defect class, VERDICT r12 item 6: a frame consumed by N sinks
    re-executes its whole lineage N times; exchange reuse never covers
    post-exchange joins or Python evals).

    A fingerprint is the scan node line with expression/plan ids
    stripped: same file, same pushed filters, same read schema. Two
    IDENTICAL scans almost always mean one logical pass executed twice
    (each of the 15 round-12 before-plans shows the pattern; the fixed
    after-plans show one scan or a ``Scan ExistingRDD`` checkpoint).
    Two scans of the same table with DIFFERENT column sets or filters
    do not fire — two column-pruned scans are often cheaper than one
    fused scan plus an exploded shuffle, and are a deliberate shape in
    this repo. Scans printed INSIDE an ``InMemoryRelation`` body do not
    count either: a persisted frame (the registry's swap_cache warm
    boundary) prints its build lineage once per consuming
    ``InMemoryTableScan`` but executes it once. Legitimate duplicates
    exist (true self-joins over a frame too large to be worth a
    checkpoint); like the other lint rules this is a review tool —
    every firing needs a written waiver, enforced by the registry
    sweep test."""
    counts: dict[str, int] = {}
    cached_indent: int | None = None
    for line in plan_text(df).splitlines():
        body = line.lstrip(" :+-*(0123456789)")
        indent = len(line) - len(body)
        if cached_indent is not None:
            if indent > cached_indent:
                continue  # inside a persisted build lineage
            cached_indent = None
        if body.startswith("InMemoryRelation"):
            cached_indent = indent
            continue
        if "Scan parquet" not in line and "FileScan parquet" not in line:
            continue
        fp = _PLAN_ID_RE.sub("", _EXPR_ID_RE.sub("", body.strip()))
        counts[fp] = counts.get(fp, 0) + 1
    return {fp: n for fp, n in counts.items() if n > 1}


# Window node text: `Window [exprs], [partitionExprs], [orderExprs]` —
# an unpartitioned window prints only TWO bracket groups.
_WINDOW_RE = re.compile(r"\bWindow (\[.*)$")


def _bracket_groups(s: str) -> int:
    depth = 0
    groups = 0
    for ch in s:
        if ch == "[":
            if depth == 0:
                groups += 1
            depth += 1
        elif ch == "]":
            depth = max(0, depth - 1)
    return groups


def _bracket_group_texts(s: str) -> list[str]:
    """Contents of each TOP-LEVEL ``[...]`` group in a plan line."""
    depth = 0
    groups: list[str] = []
    buf: list[str] = []
    for ch in s:
        if ch == "[":
            if depth == 0:
                buf = []
            else:
                buf.append(ch)
            depth += 1
        elif ch == "]":
            depth = max(0, depth - 1)
            if depth == 0:
                groups.append("".join(buf))
            else:
                buf.append(ch)
        elif depth > 0:
            buf.append(ch)
    return groups


# Dictionary-class columns of the fixture schema: a handful of distinct
# values, typically Zipf-skewed. A window partitioned ONLY by these is
# not parallelism — at 100 TB the dominant value (the top language, the
# 'view' event type, returnflag 'N') is most of the fact table funneled
# through ONE task (VERDICT r11: the doc_length_quartiles shape, which
# the global-window rule cannot see because the window IS partitioned).
# Route such windows through operators/edf.grouped_ordered_ntiles-style
# (group, range-bucket) composite keys instead.
DICTIONARY_CLASS_COLUMNS = frozenset(
    {
        # documents / events
        "lang", "source", "event_type",
        # tpch dictionary & nation/region keys (25/5 values)
        "l_returnflag", "l_linestatus", "o_orderstatus",
        "o_orderpriority", "c_mktsegment", "p_brand", "p_type",
        "n_nationkey", "n_name", "n_regionkey",
        "r_regionkey", "r_name", "c_nationkey", "s_nationkey",
        # embeddings class label
        "label",
    }
)

_ATTR_RE = re.compile(r"([A-Za-z_][A-Za-z0-9_]*)#\d+")


def lint(
    df: DataFrame,
    max_unpartitioned_window_inputs: int = 0,
    max_skew_partition_windows: int = 0,
) -> list[Finding]:
    """Scan the physical plan for scale-killers. Returns findings —
    empty means clean.

    The linter is a REVIEW tool, not a hard gate: two of its rules
    fire on patterns that are correct when one side is known small —
    a 1-row scalar-aggregate broadcast joins as
    BroadcastNestedLoopJoin (the standard way to attach a global
    statistic; plan text carries no cardinality to tell it apart from
    a real cross join), and dimension-sized global windows are the
    two-phase top-k pattern's second phase. Running it over this
    repo's 250-query registry flags ~65 such audited sites and zero
    unaudited ones — the right reading is "every finding needs a
    written justification", which is exactly how the plan-shape test
    suite uses the underlying helpers.

    Rules:
    - ``cartesian``: CartesianProduct or BroadcastNestedLoopJoin
      (quadratic row fan-out — or a deliberate 1-row scalar
      broadcast; see above).
    - ``global-window``: a Window node with no partition keys — every
      row through ONE task. Dimension-sized inputs are legitimate;
      callers who audited theirs pass
      ``max_unpartitioned_window_inputs`` to allow that many.
    - ``python-row-udf``: BatchEvalPython = row-at-a-time Python
      (pickled rows, 10-100x slower than Arrow); ArrowEvalPython /
      mapInPandas nodes are fine and not flagged.
    - ``single-partition-exchange``: Exchange SinglePartition feeding a
      non-aggregate (global sorts/limits funnel data; partial/final
      aggregates legitimately produce 1-row exchanges and are not
      flagged).
    - ``skew-partition-window``: a Window node whose partition key
      consists ONLY of ``DICTIONARY_CLASS_COLUMNS`` — the window IS
      partitioned, but a dictionary key is not parallelism: the
      dominant value is one task (VERDICT r11). Legitimate when the
      window INPUT is itself dictionary-sized (a per-group aggregate);
      callers who audited theirs pass ``max_skew_partition_windows``.
    """
    text = plan_text(df)
    findings: list[Finding] = []
    for node in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        if node in text:
            findings.append(Finding("cartesian", node))
    unpart = 0
    skewed: list[str] = []
    for line in text.splitlines():
        m = _WINDOW_RE.search(line)
        if not m:
            continue
        groups = _bracket_group_texts(m.group(1))
        if len(groups) == 2:
            unpart += 1
        elif len(groups) >= 3:
            part_cols = set(_ATTR_RE.findall(groups[1]))
            if part_cols and part_cols <= DICTIONARY_CLASS_COLUMNS:
                skewed.append(",".join(sorted(part_cols)))
    if len(skewed) > max_skew_partition_windows:
        findings.append(
            Finding(
                "skew-partition-window",
                f"{len(skewed)} window(s) partitioned only by "
                f"dictionary-class key(s) [{'; '.join(skewed)}], "
                f"{max_skew_partition_windows} allowed",
            )
        )
    if unpart > max_unpartitioned_window_inputs:
        findings.append(
            Finding(
                "global-window",
                f"{unpart} unpartitioned Window node(s), "
                f"{max_unpartitioned_window_inputs} allowed",
            )
        )
    if "BatchEvalPython" in text:
        findings.append(
            Finding("python-row-udf", "BatchEvalPython (row-at-a-time)")
        )
    # SinglePartition exchanges: flag only when the plan has no
    # aggregate at all above them (a global sort/limit funnel).
    if "Exchange SinglePartition" in text and "HashAggregate" not in text \
            and "SortAggregate" not in text and "ObjectHashAggregate" not in text:
        findings.append(
            Finding(
                "single-partition-exchange",
                "SinglePartition exchange with no aggregate in plan",
            )
        )
    return findings
