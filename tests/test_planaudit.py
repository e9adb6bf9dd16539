"""Self-test for the planaudit invariants (tools/planaudit.py).

r9 advice (medium): with AQE on — the engine default — any plan with a
shuffle is wrapped in ``AdaptiveSparkPlanExec``, which is itself a
``LeafExecNode``; a bare ``collectLeaves()`` therefore returned only
the wrapper and the Python-RDD-leaf invariant silently passed exactly
the shuffled ``createDataFrame(<driver list>)`` plans it targets.
These cases pin the fixed lineage walk on both sides:

- a shuffled (groupBy) query over ``createDataFrame`` MUST be flagged,
  even though its executed plan is AQE-wrapped;
- the same shape through ``tables.jvm_local_df`` (VALUES-based JVM
  relation) must pass clean;
- an unshuffled ``createDataFrame`` scan (no AQE wrapper) still flags,
  proving the walk didn't regress the pre-AQE path.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_time_big_data_architect_spark import tables

from tools.planaudit import _real_leaves, audit


@pytest.fixture(scope="module")
def driver_df(spark):
    return spark.createDataFrame(
        [(i % 3, float(i)) for i in range(20)], "k int, v double"
    )


def test_aqe_wrapped_python_rdd_leaf_is_flagged(spark, driver_df):
    shuffled = driver_df.groupBy("k").sum("v")
    plan = shuffled._jdf.queryExecution().executedPlan()
    # Precondition for the regression: the shuffle really is AQE-wrapped,
    # i.e. the naive collectLeaves() sees only the adaptive wrapper.
    naive = plan.collectLeaves()
    assert naive.size() == 1
    assert (
        naive.head().getClass().getSimpleName() == "AdaptiveSparkPlanExec"
    ), "AQE off in session — regression precondition not met"
    problems = audit("selftest_aqe_shuffle", shuffled)
    assert any("Python-RDD leaf" in p for p in problems), problems


def test_unshuffled_python_rdd_leaf_still_flagged(spark, driver_df):
    projected = driver_df.select("k")
    problems = audit("selftest_plain_scan", projected)
    assert any("Python-RDD leaf" in p for p in problems), problems


def test_jvm_local_df_shuffle_passes(spark):
    df = tables.jvm_local_df(
        spark,
        [(i % 3, float(i)) for i in range(20)],
        "k int, v double",
    )
    problems = audit("selftest_jvm_values", df.groupBy("k").sum("v"))
    assert problems == []


def test_partitionless_window_parse_is_paren_aware():
    """r10 review finding: the old [^)]* capture stopped at the first
    ')' inside the order expression, silently passing global windows
    over computed keys like cast(ts as bigint)."""
    from real_time_big_data_architect_spark.planchecks import (
        partitionless_windows,
    )

    frame = "specifiedwindowframe(RowFrame, a$(), b$())"
    cases = [
        # partitioned, plain order key
        (f"windowspecdefinition(event_type#12, ts#5 ASC NULLS FIRST, {frame})", 0),
        # partitioned on a cast key
        (f"windowspecdefinition(cast(k#1 as bigint), ts#5 ASC NULLS FIRST, {frame})", 0),
        # partitionless ordered, plain column
        (f"windowspecdefinition(ts#5 ASC NULLS FIRST, {frame})", 1),
        # partitionless ordered, parenthesized cast (the regression)
        (f"windowspecdefinition(cast(ts#5L as bigint) ASC NULLS FIRST, {frame})", 1),
        # partitionless unordered: frame is the first argument
        (f"windowspecdefinition({frame})", 1),
    ]
    for plan, want in cases:
        assert partitionless_windows(plan) == want, plan


def test_real_leaves_descends_into_adaptive_wrapper(spark, driver_df):
    shuffled = driver_df.groupBy("k").count()
    leaves = _real_leaves(shuffled._jdf.queryExecution().executedPlan())
    names = {leaf.getClass().getSimpleName() for leaf in leaves}
    assert "AdaptiveSparkPlanExec" not in names
    assert "RDDScanExec" in names
