"""Shared physical-plan invariant primitives.

Used by ``tools/planaudit.py`` (batch surface: every declared query's
executed plan) and by ``streaming.progress`` (streaming surface: the
last micro-batch's ``lastExecution`` captured at drain time, while the
JVM plan objects are still reachable). Keeping the walkers here means
the two audits cannot drift apart on what counts as a violation.
"""

from __future__ import annotations

import re


def real_leaves(plan_node) -> list:
    """Collect the TRUE leaf SparkPlans of an executed plan.

    With AQE on (the engine's batch default), any plan containing a
    shuffle or subquery is wrapped in ``AdaptiveSparkPlanExec`` —
    itself a ``LeafExecNode``, so a bare ``collectLeaves()`` returns
    only the wrapper and never reaches an ``RDDScanExec`` underneath
    (r9 advice: this made the Python-RDD-leaf invariant a silent no-op
    on exactly the shuffled plans it targets). Descend through every
    adaptive wrapper's ``inputPlan()`` until only real leaves remain.
    Streaming micro-batch plans are never AQE-wrapped (adaptive is
    unsupported there), so the walk degrades to plain collectLeaves.
    """
    out: list = []
    stack = [plan_node]
    while stack:
        it = stack.pop().collectLeaves().iterator()
        while it.hasNext():
            leaf = it.next()
            if leaf.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
                stack.append(leaf.inputPlan())
            else:
                out.append(leaf)
    return out


def has_python_rdd_leaf(plan_node) -> bool:
    """True when the plan scans an RDD whose lineage crosses the Python
    worker — the ``createDataFrame(<driver list>)`` anti-pattern
    (re-serialized per action, opaque to AQE stats). ``localCheckpoint``
    leaves print identically (``Scan ExistingRDD``) but their RDD is a
    pure-JVM LocalCheckpointRDD, so the check inspects lineage, not
    plan text."""
    for node in real_leaves(plan_node):
        if node.getClass().getSimpleName() != "RDDScanExec":
            continue
        dbg = node.rdd().toDebugString()
        if (
            "PythonRDD" in dbg
            or "applySchemaToPythonRDD" in dbg
            or "ParallelCollectionRDD" in dbg
        ):
            return True
    return False


def partitionless_windows(plan: str) -> int:
    """Count Window nodes whose spec has an empty partition list.

    Spark prints ``Window [ ... ], [part keys], [order]`` — a global
    window shows an empty partition bracket or goes straight from the
    function list to the ordering spec. Parsed from the stable
    ``windowspecdefinition(...)`` argument shape: partitionless specs
    start directly with an ordering expression ("col ASC NULLS FIRST"
    / "... DESC") or with the frame itself; partitioned specs start
    with a bare expression (no ASC/DESC before the first TOP-LEVEL
    comma). The first argument is extracted with a paren-aware scan —
    a naive ``[^)]*`` capture stops at the first ')' inside an
    expression like ``cast(ts AS bigint) ASC``, silently missing
    exactly the global windows over computed order keys (r10 review
    finding).
    """
    n = 0
    for m in re.finditer(r"windowspecdefinition\(", plan):
        head = _first_top_level_arg(plan, m.end())
        if " ASC" in head or " DESC" in head or head.startswith(
            "specifiedwindowframe"
        ):
            n += 1
    return n


def _first_top_level_arg(s: str, start: int) -> str:
    """The first comma-separated argument of a call whose open paren
    was just consumed at ``start`` — scanned with paren depth, so
    nested calls inside the argument do not truncate it."""
    depth = 0
    for i in range(start, len(s)):
        ch = s[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            if depth == 0:
                return s[start:i].strip()  # single-argument call
            depth -= 1
        elif ch == "," and depth == 0:
            return s[start:i].strip()
    return s[start:].strip()
